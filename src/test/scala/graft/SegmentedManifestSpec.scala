package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.catalog.Snapshots

/** Segmented manifest storage (r15, [[graft.catalog.Snapshots.SegForm]]):
  * once the entry map outgrows 2× the segment size, commits write only
  * their DELTA (inline entries + drops + a reused segment list), so the
  * per-commit manifest bytes stay O(changes) regardless of how many live
  * files the table holds — the structural fix for unpartitioned tables
  * whose inline manifests cost O(live files) of JSON per commit.
  */
class SegmentedManifestSpec extends SparkSpec {

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def withSegSize[T](n: Int)(f: => T): T = {
    val prev = spark.conf.getOption(Snapshots.SegmentSizeKey)
    spark.conf.set(Snapshots.SegmentSizeKey, n.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(Snapshots.SegmentSizeKey, v)
      case None => spark.conf.unset(Snapshots.SegmentSizeKey)
    }
  }

  test("e2e: appends over the threshold segment the manifest; reads, DML, time travel, change feed all serve the materialized state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seg-e2e")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_sg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_sg.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_sg.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "3")
    withSegSize(4) {
      try {
        spark.sql("CREATE TABLE graft_sg.main.t " +
          "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
          "SELECT /*+ REPARTITION_BY_RANGE(6, id) */ id, id * 2 AS v " +
          "FROM range(600)")
        // 6 files < 2*4=8: still inline
        val fs = fsOf(dir)
        val root = new Path(s"$dir/t")
        assert(Snapshots.current(fs, root).get.seg.isEmpty)

        // push past the threshold with single-file appends
        for (i <- 0 until 6)
          spark.sql("INSERT INTO graft_sg.main.t " +
            s"SELECT /*+ REPARTITION(1) */ id + ${1000 * (i + 1)}, 0 FROM range(10)")
        val segged = Snapshots.current(fs, root).get
        assert(segged.seg.isDefined, "entry map must have segmented")
        assert(segged.entries.size == 12)
        assert(fs.exists(new Path(root, Snapshots.SegDir)))

        // per-commit manifest bytes now O(changes): the next single-file
        // append's manifest must be far smaller than the full listing form
        spark.sql("INSERT INTO graft_sg.main.t " +
          "SELECT /*+ REPARTITION(1) */ id + 50000, 0 FROM range(10)")
        val cur = Snapshots.current(fs, root).get
        val manifestRaw = {
          val in = fs.open(Snapshots.manifestPath(root, cur.version))
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            new String(out.toByteArray, "UTF-8")
          } finally in.close()
        }
        // the bulk of the listing lives in segments, NOT the manifest: a
        // folded key (live, but not inline) must not appear in its text
        val folded = cur.entries.keySet -- cur.seg.get.inlineEntries.keySet
        assert(folded.nonEmpty)
        assert(!folded.exists(manifestRaw.contains),
          "folded entries must not ride the manifest")
        // the inline block carries only the keys not yet folded into a
        // segment (bounded by segment_size), never the whole listing
        assert(cur.seg.get.inlineEntries.size <= 4,
          s"inline must stay bounded by segment_size, got ${cur.seg.get.inlineEntries}")
        assert(cur.seg.get.inlineEntries.keysIterator
          .exists(!segged.entries.contains(_)),
          "the fresh append's file must ride the inline block")

        // the materialized state serves every surface
        assert(spark.table("graft_sg.main.t").count() == 600 + 70)
        // dv DELETE on a segmented table: rows override rides the inline
        spark.sql("DELETE FROM graft_sg.main.t WHERE id = 300")
        val afterDv = Snapshots.current(fs, root).get
        assert(afterDv.seg.isDefined && afterDv.dvs.nonEmpty)
        assert(spark.table("graft_sg.main.t").count() == 669)
        assert(afterDv.totalRows.contains(669L))
        // time travel to a pre-segmentation version still reads
        assert(spark.sql(
          s"SELECT count(*) FROM graft_sg.main.t VERSION AS OF '${afterDv.version - 2}'")
          .collect().head.getLong(0) == 600 + 60)
        // change feed across the dv commit synthesizes the D row
        val feed = Snapshots.changesBetween(spark, root,
          afterDv.version - 1, afterDv.version)
          .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_op"))))
        assert(feed.toSet == Set((300L, "D")))

        // removals land in `drops`, and enough of them trigger a FOLD
        spark.sql("TRUNCATE TABLE graft_sg.main.t")
        val truncated = Snapshots.current(fs, root).get
        assert(truncated.entries.isEmpty)
        assert(spark.table("graft_sg.main.t").count() == 0)
      } finally {
        prevH match {
          case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
          case None => spark.conf.unset(graft.catalog.History.Key)
        }
        spark.sql("DROP TABLE IF EXISTS graft_sg.main.t")
      }
    }
  }

  test("storage algebra: override order, drops, fold, and round-trip equal the in-memory model") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seg-alg")
      .toFile.getAbsolutePath
    val fs = fsOf(dir)
    val root = new Path(dir, "t")
    fs.mkdirs(root)
    withSegSize(3) {
      // drive raw commits with synthetic single-file entries and mirror
      // them in a plain map — after every commit the parsed manifest must
      // equal the model exactly
      var model = Map.empty[String, Seq[String]]
      var base: Option[Snapshots.Snapshot] = None
      def commit(add: Seq[String], remove: Seq[String]): Unit = {
        model = (model -- remove) ++ add.map(_ -> Seq.empty[String])
        base = Some(Snapshots.commit(fs, root, base, model))
        val readBack = Snapshots.read(fs, root, base.get.version).get
        assert(readBack.entries == model,
          s"v${base.get.version}: ${readBack.entries} != $model")
        // and the CURRENT resolution agrees
        assert(Snapshots.current(fs, root).get.entries == model)
      }
      // grow to 12 entries (4 segments of 3 at fold)
      commit((1 to 4).map(i => s"gen-a/f$i"), Nil)
      commit((5 to 8).map(i => s"gen-b/f$i"), Nil)     // crosses 2*3=6: folds
      assert(base.get.seg.isDefined)
      val segsAfterFold = base.get.seg.get.segs
      assert(segsAfterFold.nonEmpty)
      commit(Seq("gen-c/f9"), Nil)                     // delta commit
      assert(base.get.seg.get.segs == segsAfterFold, "segments must be reused")
      assert(base.get.seg.get.inlineEntries.keySet == Set("gen-c/f9"))
      commit(Nil, Seq("gen-a/f1", "gen-a/f2"))         // drops
      assert(base.get.seg.get.drops == Set("gen-a/f1", "gen-a/f2"))
      // many removals cross the 2×segsize drop bound and fold afresh
      commit(Nil, (3 to 8).map(i => if (i <= 4) s"gen-a/f$i" else s"gen-b/f$i"))
      assert(base.get.entries.keySet == Set("gen-c/f9"))
      assert(base.get.seg.forall(_.drops.isEmpty),
        s"fold must clear drops: ${base.get.seg}")
      // inline growth past segsize demotes to a fresh segment
      commit((10 to 14).map(i => s"gen-d/f$i"), Nil)
      val afterDemote = base.get.seg
      assert(afterDemote.isEmpty || afterDemote.get.inlineEntries.size <= 3)
    }
  }

  test("retention sweeps segments no retained manifest references") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seg-gc")
      .toFile.getAbsolutePath
    val fs = fsOf(dir)
    val root = new Path(dir, "t")
    fs.mkdirs(root)
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    val prevG = spark.conf.getOption(Snapshots.OrphanGraceKey)
    spark.conf.set(graft.catalog.History.Key, "0")
    spark.conf.set(Snapshots.OrphanGraceKey, "0")
    withSegSize(2) {
      try {
        var base: Option[Snapshots.Snapshot] = None
        def commit(m: Map[String, Seq[String]]): Unit =
          base = Some(Snapshots.commit(fs, root, base, m))
        commit((1 to 6).map(i => s"gen-x/f$i" -> Seq.empty[String]).toMap) // folds
        val firstSegs = base.get.seg.get.segs.toSet
        assert(firstSegs.nonEmpty)
        // shrink to 1 entry: drops > 2×segsize → fresh fold; zero
        // retention must sweep the first fold's segments
        commit(Map("gen-x/f1" -> Seq.empty[String]))
        val segDir = new Path(root, Snapshots.SegDir)
        val left = fs.listStatus(segDir).map(_.getPath.getName).toSet
        assert(left.intersect(firstSegs).isEmpty,
          s"dropped segments must sweep: $left still holds $firstSegs")
        // the live manifest still reads
        assert(Snapshots.current(fs, root).get.entries.keySet == Set("gen-x/f1"))
      } finally {
        prevH match {
          case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
          case None => spark.conf.unset(graft.catalog.History.Key)
        }
        prevG match {
          case Some(v) => spark.conf.set(Snapshots.OrphanGraceKey, v)
          case None => spark.conf.unset(Snapshots.OrphanGraceKey)
        }
      }
    }
  }

  test("concurrent disjoint commits rebase across segmented manifests") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seg-occ")
      .toFile.getAbsolutePath
    val fs = fsOf(dir)
    val root = new Path(dir, "t")
    fs.mkdirs(root)
    withSegSize(2) {
      var base: Option[Snapshots.Snapshot] = None
      base = Some(Snapshots.commit(fs, root, base,
        (1 to 6).map(i => s"gen-x/f$i" -> Seq.empty[String]).toMap))
      assert(base.get.seg.isDefined)
      val stale = base.get
      // writer B lands first
      Snapshots.commit(fs, root, Some(stale),
        stale.entries + ("gen-y/f7" -> Seq.empty[String]))
      // writer A replays a DISJOINT edit from the stale base and rebases
      val a = Snapshots.commit(fs, root, Some(stale),
        stale.entries + ("gen-z/f8" -> Seq.empty[String]))
      assert(a.entries.keySet.contains("gen-y/f7"), "B's edit must survive")
      assert(a.entries.keySet.contains("gen-z/f8"))
      // overlapping edits still refuse
      val stale2 = a
      Snapshots.commit(fs, root, Some(stale2), stale2.entries - "gen-y/f7")
      intercept[graft.catalog.ConcurrentCommitException] {
        Snapshots.commit(fs, root, Some(stale2),
          stale2.entries.updated("gen-y/f7", Seq("other")))
      }
    }
  }
}

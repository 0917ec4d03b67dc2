package graft

import org.apache.hadoop.fs.Path

import graft.catalog.Snapshots

/** ALTER TABLE SET/UNSET TBLPROPERTIES (r15): the write-behavior
  * properties flip on an EXISTING table — recreating a 100 TB table to
  * enable deletion vectors would defeat their point. `snapshots` itself
  * stays immutable.
  */
class AlterTablePropsSpec extends SparkSpec {

  test("enable deletion_vectors + bloom_cols on an existing snapshot table; later DELETEs ride the dv path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alter-props")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_ap", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ap.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_ap.main.t")
    try {
      spark.sql("CREATE TABLE graft_ap.main.t " +
        "TBLPROPERTIES ('snapshots'='true') AS " +
        "SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 2 AS v " +
        "FROM range(4000)")
      spark.sql("ALTER TABLE graft_ap.main.t SET TBLPROPERTIES " +
        "('deletion_vectors'='true', 'bloom_cols'='id')")
      val props = spark.sql("SHOW TBLPROPERTIES graft_ap.main.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("deletion_vectors").contains("true"))
      assert(props.get("bloom_cols").contains("id"))

      // a DELETE now commits a vector, not a rewrite
      spark.sql("DELETE FROM graft_ap.main.t WHERE id = 777")
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      val snap = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(snap.kind == "dvdelete" && snap.dvs.nonEmpty)
      assert(spark.table("graft_ap.main.t").count() == 3999)

      // new generations get bloom sidecars; pre-ALTER ones stay
      // sidecar-less (conservative candidacy)
      spark.sql("INSERT INTO graft_ap.main.t SELECT id + 10000, 0 FROM range(100)")
      val gens = fs.listStatus(new Path(s"$dir/t")).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith("gen-"))
      assert(gens.exists(g =>
        fs.exists(new Path(g.getPath, graft.catalog.BloomSkip.FileName))))

      // UNSET reverts the DELETE routing (vectors still apply to reads)
      spark.sql("ALTER TABLE graft_ap.main.t UNSET TBLPROPERTIES ('deletion_vectors')")
      assert(spark.table("graft_ap.main.t").count() == 4099)
      assert(spark.sql(
        "SELECT count(*) FROM graft_ap.main.t WHERE id = 777")
        .collect().head.getLong(0) == 0)

      // snapshots flag is immutable
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE graft_ap.main.t SET TBLPROPERTIES ('snapshots'='false')")
      }
      def msgs(t: Throwable): String = {
        var c: Throwable = t; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append('|'); c = c.getCause }
        sb.toString
      }
      assert(msgs(e).contains("immutable"), msgs(e))
      // dv on a PLAIN table refuses (requires snapshots)
      spark.sql("DROP TABLE IF EXISTS graft_ap.main.plain")
      spark.sql("CREATE TABLE graft_ap.main.plain AS SELECT id FROM range(10)")
      intercept[Exception] {
        spark.sql("ALTER TABLE graft_ap.main.plain SET TBLPROPERTIES " +
          "('deletion_vectors'='true')")
      }
      spark.sql("DROP TABLE IF EXISTS graft_ap.main.plain")
    } finally spark.sql("DROP TABLE IF EXISTS graft_ap.main.t")
  }
}

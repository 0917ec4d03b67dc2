package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (SURVEY.md §2.1 S9: the reference's format
  * list includes Avro alongside parquet/ORC/CSV/JSON).
  *
  * This environment bundles the public Avro core + mapred libraries but not
  * the `spark-avro` DataSource module, so the format is wired through Avro's
  * own Hadoop input/output formats: schema-mapped GenericRecords inside each
  * task, standard splittable .avro container files on disk. The per-partition
  * record conversion is a justified kernel (like the ImageIO/javax.sound
  * codecs in [[Multimodal]]): Avro's codec API is object-based, there is no
  * Catalyst expression to compose — rows enter/leave the DataFrame world at
  * the partition boundary and everything downstream is declarative.
  *
  * Supported column types: the flat primitives the fixture tables use
  * (boolean/int/long/float/double/string/binary/date/timestamp), nullable via
  * Avro unions; date/timestamp ride as logical-typed int/long (days / µs).
  */
object AvroIo {

  private def avroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case other => throw new IllegalArgumentException(
      s"AvroIo supports flat primitive columns, got $other")
  }

  /** Spark schema → Avro record schema (nullable fields become unions). */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  /** Write `df` as Avro container files under `path` (one per partition). */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString // Schema is not serializable; ship JSON
    val job = Job.getInstance(df.sparkSession.sessionState.newHadoopConf())
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    df.rdd.mapPartitions { it =>
      val avro = new Schema.Parser().parse(avroJson)
      it.map { row =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case StringType => row.getString(i)
              case BinaryType =>
                java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case DateType =>
                Int.box(row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
              case TimestampType =>
                val ts = row.getAs[java.sql.Timestamp](i)
                Long.box(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000)
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(f.name, v)
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files under `path` back as a DataFrame with
    * `schema` (the write-side schema; Avro files are self-describing but the
    * projection target fixes the Spark types).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val avroJson = avroSchema(schema).toString
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(avroJson))
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration)
      // convert INSIDE the partition: GenericRecord is not serializable
      .mapPartitions(_.map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fields.map { f =>
          val v = rec.get(f.name)
          if (v == null) null
          else f.dataType match {
            case StringType => v.toString
            case BinaryType =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
            case DateType =>
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
                v.asInstanceOf[Int].toLong))
            case TimestampType =>
              val micros = v.asInstanceOf[Long]
              val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
              ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
              ts
            case _ => v
          }
        }.toSeq)
      })
    spark.createDataFrame(rows, schema)
  }
}

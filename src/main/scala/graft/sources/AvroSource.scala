package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source without the external spark-avro connector: this
  * environment ships the Apache Avro library jars (avro, avro-mapred —
  * Spark core dependencies) but not `spark-avro`, so
  * `spark.read.format("avro")` is unavailable. The read path here goes
  * through `newAPIHadoopFile` + `AvroKeyInputFormat` instead — public
  * Apache Avro MapReduce APIs, container-file sync markers make the
  * input SPLITTABLE, so a 100 TB avro directory fans out across
  * executors exactly like any Hadoop input. The RDD hop is the
  * documented exception where the DataFrame API genuinely can't reach
  * (no V2 connector on the classpath); everything downstream of
  * `readAvro` is ordinary Catalyst.
  *
  * Supported schema surface: records of primitives (long/int/double/
  * float/boolean/string/bytes) and `[null, T]` unions — the shape
  * engines write for tabular data.
  */
object AvroSource {

  /** Avro record schema → Spark schema. */
  def sparkSchema(avro: Schema): StructType = StructType(
    avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = sparkType(f.schema())
      StructField(f.name(), t, nullable)
    })

  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions are supported, got ${s.getTypes.asScala.map(_.getType)}")
      (sparkType(nonNull.head)._1, true)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Writer schema of the first `.avro` file under `path` — a
    * driver-side metadata read (one file header), like parquet footer
    * inference. */
  def avroSchemaAt(spark: SparkSession, path: String): Schema = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
          .headOption.getOrElse(
            throw new IllegalArgumentException(s"no .avro files under $path"))
      else p
    val in = new FsInput(file, conf)
    val rdr = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
    try rdr.getSchema finally rdr.close()
  }

  /** Distributed avro read → DataFrame. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = avroSchemaAt(spark, path)
    val st = sparkSchema(avroSchema)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    AvroJob.setInputKeySchema(job, avroSchema)
    val nFields = st.fields.length
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      // the record reader REUSES the datum object between records, so
      // each record must be converted to an immutable Row in the same
      // iterator step — holding GenericRecord references across next()
      // calls would silently yield the last record's values everywhere
      .map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](nFields)
        var i = 0
        while (i < nFields) {
          vals(i) = rec.get(i) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case v => v
          }
          i += 1
        }
        Row.fromSeq(vals.toSeq)
      }
    // the read enters the plan as a LogicalRDD leaf, which has no
    // storage identity of its own — register provenance so lineage
    // reports resolve it back to the avro location
    RddLineage.register(rows.id,
      name = {
        val base = path.stripSuffix("/").split('/').last
        if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
      },
      path = path, format = "avro")
    spark.createDataFrame(rows, st)
  }

  /** Spark schema → avro record schema: every field a `[null, T]` union
    * (what tabular writers emit). */
  def avroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(s"unsupported spark type $other")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Driver-side single-file avro writer for SMALL fixtures (gate and
    * test inputs — the distributed surface under test is the READ path;
    * production-scale writes would pair `AvroKeyOutputFormat` with
    * `saveAsNewAPIHadoopFile` through the same library).
    *
    * Write-then-rename: a failed write must not leave a readable-but-
    * truncated container at `path` — callers cache fixtures behind an
    * existence check, and avro's close() flushes whatever was appended,
    * so a partial file would be silently consumed as the full dataset
    * forever after. The final path only ever holds a COMPLETE file.
    */
  def writeAvroFixture(df: DataFrame, path: String): Unit = {
    val schema = avroSchema(df.schema, "fixture")
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(path + ".tmp")
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, tmp)
    var ok = false
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < row.length) {
          rec.put(i, row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          })
          i += 1
        }
        writer.append(rec)
      }
      ok = true
    } finally {
      writer.close()
      if (ok) java.nio.file.Files.move(tmp.toPath, file.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else tmp.delete()
    }
  }
}

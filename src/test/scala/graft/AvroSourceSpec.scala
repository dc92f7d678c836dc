package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroSource

/** Avro round trip through the connector-free read path
  * (AvroKeyInputFormat): schema mapping, value fidelity including nulls
  * and binary, and the record-reuse hazard (every row must be an
  * independent copy, not a view over the reader's recycled datum).
  */
class AvroSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("schema + values round trip, rows are independent copies") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, "gamma", 0.0, true)
    ).toDF("id", "name", "score", "flag")
    val path = java.nio.file.Files.createTempDirectory("graft_avro_spec")
      .resolve("t.avro").toString
    AvroSource.writeAvroFixture(df, path)

    val back = AvroSource.readAvro(spark, path)
    // [null, T] union fields come back nullable
    assert(back.schema.fields.forall(_.nullable))
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "flag"))
    // distinct values per row proves no record-reuse aliasing: a reused
    // datum would collapse every row onto the last record read
    val rows = back.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.toSeq == Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, "gamma", 0.0, true)))
  }

  test("nulls and binary survive the round trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x"), Some(Array[Byte](1, 2, 3))),
      (2L, None, None)
    ).toDF("id", "s", "b")
    val path = java.nio.file.Files.createTempDirectory("graft_avro_spec2")
      .resolve("t.avro").toString
    AvroSource.writeAvroFixture(df, path)
    val rows = AvroSource.readAvro(spark, path).orderBy($"id").collect()
    assert(rows(0).getString(1) == "x")
    assert(rows(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("aggregate over the avro read equals the same aggregate over the source") {
    import spark.implicits._
    val src = Tables(spark, TestSpark.sf, "region")
    val path = java.nio.file.Files.createTempDirectory("graft_avro_spec3")
      .resolve("region.avro").toString
    AvroSource.writeAvroFixture(src, path)
    val a = AvroSource.readAvro(spark, path)
      .agg(count(lit(1)), sum(length($"r_name"))).collect().head.toSeq
    val b = src.agg(count(lit(1)), sum(length($"r_name"))).collect().head.toSeq
    assert(a == b)
  }
}

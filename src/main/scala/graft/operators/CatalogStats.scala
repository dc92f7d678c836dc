package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feeds [[ColumnStats]]-grade per-column profiles into Catalyst's
  * cost-based optimizer: the engine's own ANALYZE output becomes the
  * rowCount / ndv / min / max the CBO's `FilterEstimation` and
  * `CostBasedJoinReorder` consume. This is why q80-style multi-join
  * queries needed hand-placed filters: without column stats Catalyst
  * keeps the written join order and passes `sizeInBytes` through
  * filters unchanged; with them (and `spark.sql.cbo.enabled` +
  * `spark.sql.cbo.joinReorder.enabled`) the selective dimension joins
  * first and filtered sides become broadcast candidates — `CboSpec`
  * demonstrates both on the TPC-H-ish fixtures.
  *
  * [[analyze]] is the programmatic twin of
  * `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS ...` with the same
  * cost shape as [[ColumnStats.approxProfile]]: ONE corpus scan, all
  * aggregates map-combinable (`approx_count_distinct` HLL++ for ndv —
  * never the exact-ndv Expand), one fixed-width SinglePartition
  * collapse. At 100 TB that is the only ANALYZE plan you can afford,
  * and it is exactly what Spark's own ANALYZE command runs — here the
  * profile additionally lands in the session catalog via
  * `alterTableStats`, so it works for any registered source the
  * external catalog can't ANALYZE natively.
  */
object CatalogStats {

  /** Register a parquet directory as a catalog table (idempotent) —
    * catalog identity is what lets stats attach and survive
    * re-resolution; a temp view has nowhere to hang them.
    */
  def registerParquet(spark: SparkSession, table: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING parquet LOCATION '$path'")

  /** One-scan column profile → `CatalogStatistics` on `table`.
    *
    * min/max ride only on types whose `CatalogColumnStat` external-string
    * round-trip is the plain cast ([[minMaxSafe]]); strings/binaries get
    * avg/max LENGTH stats instead (what join-size estimation actually
    * uses for them); everything else still contributes count/ndv/nulls.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String],
      rsd: Double = 0.01): CatalogStatistics = {
    val df = spark.table(table)
    val fields = cols.map(c => df.schema(df.schema.fieldIndex(c)))
    val aggs = count(lit(1)).as("_n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"cnt_${f.name}"),
        approx_count_distinct(c, rsd).as(s"ndv_${f.name}")) ++
        (f.dataType match {
          case t if minMaxSafe(t) =>
            Seq(min(c).cast("string").as(s"min_${f.name}"),
              max(c).cast("string").as(s"max_${f.name}"))
          case StringType | BinaryType =>
            Seq(ceil(avg(length(c))).cast("long").as(s"avgl_${f.name}"),
              max(length(c)).cast("long").as(s"maxl_${f.name}"))
          case _ => Nil
        })
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("_n")
    val colStats = fields.map { f =>
      val cnt = row.getAs[Long](s"cnt_${f.name}")
      val lens = f.dataType match {
        case StringType | BinaryType =>
          (Option(row.getAs[Long](s"avgl_${f.name}")).filter(_ => cnt > 0),
            Option(row.getAs[Long](s"maxl_${f.name}")).filter(_ => cnt > 0))
        case t => (Some(t.defaultSize.toLong), Some(t.defaultSize.toLong))
      }
      val (mn, mx) = f.dataType match {
        case t if minMaxSafe(t) && cnt > 0 =>
          (Option(row.getAs[String](s"min_${f.name}")),
            Option(row.getAs[String](s"max_${f.name}")))
        case _ => (None, None)
      }
      f.name -> CatalogColumnStat(
        distinctCount = Some(BigInt(row.getAs[Long](s"ndv_${f.name}"))),
        min = mn, max = mx,
        nullCount = Some(BigInt(n - cnt)),
        avgLen = lens._1, maxLen = lens._2)
    }.toMap
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val stats = CatalogStatistics(
      sizeInBytes = BigInt(tableBytes(spark, ident)),
      rowCount = Some(BigInt(n)),
      colStats = colStats)
    spark.sessionState.catalog.alterTableStats(ident, Some(stats))
    // the SessionCatalog caches resolved data-source relations; without
    // this the next spark.table() replays the stats-less plan
    spark.catalog.refreshTable(table)
    stats
  }

  /** Types whose `CatalogColumnStat.fromExternalString` accepts the SQL
    * cast-to-string form (numerics parse their own toString; DATE is the
    * ISO yyyy-MM-dd the cast emits). TIMESTAMP is deliberately out: its
    * external form is format-sensitive, and a wrong round-trip would
    * poison every estimate on the column.
    */
  private def minMaxSafe(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType | DateType | BooleanType => true
    case _ => false
  }

  private def tableBytes(spark: SparkSession, ident: TableIdentifier): Long = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(ident).location)
    loc.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(loc).getLength
  }
}

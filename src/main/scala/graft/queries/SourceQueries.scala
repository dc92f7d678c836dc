package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format surface beyond parquet: CSV, JSON, ORC round trips
  * (the reference's fixtures scanned ORC tables — SURVEY §5). Each query
  * copies a table into the format under test, reads it back through the
  * format's reader, and aggregates; the oracle runs on the original
  * parquet, so any format-conversion bug breaks the hash.
  */
object SourceQueries {

  private val ordersSlim = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  def all: Seq[Q] = Seq(

    Q("q43_csv_source",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
          .write.mode("overwrite").option("header", "true").csv(s"$tmp/orders_csv")
        s.read.schema(ordersSlim).option("header", "true").csv(s"$tmp/orders_csv")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"),
            max($"o_orderkey").as("max_key"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total, max(o_orderkey) AS max_key
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("q44_json_source",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
        Tables(s, dir, "customer")
          .write.mode("overwrite").json(s"$tmp/customer_json")
        s.read.json(s"$tmp/customer_json")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("bal"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q45_orc_source",
      (s, dir) => {
        import s.implicits._
        // fixture keyed by corpus dir and written once (the _SUCCESS
        // marker commits the write): bench reps and long sessions reuse
        // the layout instead of leaking a fresh temp dir per invocation
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val tmp = graft.Scratch.dir(s"graft_orc_$key")
        if (!new java.io.File(s"$tmp/orders_orc/_SUCCESS").exists()) {
          Tables(s, dir, "orders").write.mode("overwrite").orc(s"$tmp/orders_orc")
        }
        s.read.orc(s"$tmp/orders_orc")
          .groupBy(date_format($"o_orderdate", "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"ym")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin)),

    // avro round trip WITHOUT spark-avro (absent from this environment):
    // distributed read via AvroKeyInputFormat — see sources/AvroSource.
    // Fixture written once per corpus identity; the oracle runs on the
    // original parquet, so any schema/value conversion bug breaks the hash
    Q("q95_avro_source",
      (s, dir) => {
        import s.implicits._
        import graft.sources.AvroSource
        // fixture keyed by the corpus dir: a process touching two scale
        // factors must not reuse the other's avro copy
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val fixture = graft.Scratch.dir(s"graft_avro_$key") + "/orders.avro"
        if (!new java.io.File(fixture).exists()) {
          AvroSource.writeAvroFixture(
            Tables(s, dir, "orders")
              .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
                $"o_totalprice"),
            fixture)
        }
        AvroSource.readAvro(s, fixture)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"),
            max($"o_orderkey").as("max_key"),
            countDistinct($"o_custkey").as("n_cust"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total, max(o_orderkey) AS max_key,
             |  count(DISTINCT o_custkey) AS n_cust
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // schema evolution: a corpus written over time gains columns; a
    // mergeSchema read must union the file schemas and null-fill the
    // missing column in old files. Partition 1 = pre-evolution rows
    // (no o_orderstatus), partition 2 = post-evolution; the oracle
    // recreates the same null pattern from the original table
    Q("q96_schema_evolution",
      (s, dir) => {
        import s.implicits._
        // evolved layout keyed by corpus dir, written once behind an
        // existence check (same contract as q95's avro fixture): v2's
        // _SUCCESS commits LAST, so a half-built layout re-writes cleanly
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val tmp = graft.Scratch.dir(s"graft_evo_$key")
        if (!new java.io.File(s"$tmp/v2/_SUCCESS").exists()) {
          val orders = Tables(s, dir, "orders")
          orders.filter($"o_orderkey" % 2 === 0)
            .select($"o_orderkey", $"o_totalprice")
            .write.mode("overwrite").parquet(s"$tmp/v1")
          orders.filter($"o_orderkey" % 2 === 1)
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .write.mode("overwrite").parquet(s"$tmp/v2")
        }
        s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
          .agg(count(lit(1)).as("n"),
            round(sum($"o_totalprice"), 2).as("total"),
            count($"o_orderstatus").as("n_status"),
            countDistinct($"o_orderstatus").as("d_status"))
      },
      Some("""SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
             |  count(CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END)
             |    AS n_status,
             |  count(DISTINCT CASE WHEN o_orderkey % 2 = 1
             |    THEN o_orderstatus END) AS d_status
             |FROM orders""".stripMargin)),

    // ANALYZE-style one-pass column statistics (operators.ColumnStats) —
    // the ndv/null/min/max profile a cost-based optimizer or catalog
    // keeps per column, four columns in a SINGLE aggregation over ONE
    // scan. q97 is the EXACT-ndv oracle/audit variant: count/null/min/max
    // partial-aggregate map-side, but the four exact countDistinct force
    // RewriteDistinctAggregates' Expand (4x the scanned rows) plus a
    // corpus-grain shuffle of the distinct values — exact ndv is NOT
    // count-class. q98 below gates the 100 TB profile (approx ndv, no
    // Expand, pinned by ScaleSpec)
    Q("q97_column_stats",
      (s, dir) => {
        import s.implicits._
        graft.operators.ColumnStats.exactProfile(
            Tables(s, dir, "lineitem"),
            Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice"))
          .orderBy($"col_name")
      },
      Some("""WITH w AS (
             |  SELECT count(l_orderkey) AS n1, count(*) - count(l_orderkey) AS z1,
             |    count(DISTINCT l_orderkey) AS d1, round(CAST(min(l_orderkey) AS DOUBLE), 2) AS mn1,
             |    round(CAST(max(l_orderkey) AS DOUBLE), 2) AS mx1,
             |    count(l_suppkey) AS n2, count(*) - count(l_suppkey) AS z2,
             |    count(DISTINCT l_suppkey) AS d2, round(CAST(min(l_suppkey) AS DOUBLE), 2) AS mn2,
             |    round(CAST(max(l_suppkey) AS DOUBLE), 2) AS mx2,
             |    count(l_quantity) AS n3, count(*) - count(l_quantity) AS z3,
             |    count(DISTINCT l_quantity) AS d3, round(CAST(min(l_quantity) AS DOUBLE), 2) AS mn3,
             |    round(CAST(max(l_quantity) AS DOUBLE), 2) AS mx3,
             |    count(l_extendedprice) AS n4, count(*) - count(l_extendedprice) AS z4,
             |    count(DISTINCT l_extendedprice) AS d4, round(CAST(min(l_extendedprice) AS DOUBLE), 2) AS mn4,
             |    round(CAST(max(l_extendedprice) AS DOUBLE), 2) AS mx4
             |  FROM lineitem)
             |SELECT 'l_orderkey' AS col_name, n1 AS n_rows, z1 AS n_null, d1 AS ndv, mn1 AS min_v, mx1 AS max_v FROM w
             |UNION ALL
             |SELECT 'l_suppkey', n2, z2, d2, mn2, mx2 FROM w
             |UNION ALL
             |SELECT 'l_quantity', n3, z3, d3, mn3, mx3 FROM w
             |UNION ALL
             |SELECT 'l_extendedprice', n4, z4, d4, mn4, mx4 FROM w
             |ORDER BY col_name""".stripMargin)),

    // the 100 TB ANALYZE plan: same per-column profile with
    // approx_count_distinct for ndv — every aggregate is declarative, so
    // the plan is one scan + map-side partials + one SinglePartition
    // collapse, NO Expand (ScaleSpec pins that shape). HLL++ estimates
    // are engine-specific, so the gate follows the q29 contract: emit the
    // exact ndv plus a boolean asserting the estimate lands within 5% —
    // deterministic on fixed data (Spark's HLL++ is seedless), and a real
    // oracle instead of rows-only. The exact side exists only to judge
    // the estimate; production ANALYZE runs approxProfile alone
    Q("q98_column_stats_approx",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
        val cols = Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")
        val ap = graft.operators.ColumnStats.approxProfile(li, cols)
          .withColumnRenamed("ndv", "ndv_est")
        val ex = graft.operators.ColumnStats.exactProfile(li, cols)
          .select($"col_name", $"ndv".as("ndv_exact"))
        ap.join(ex, Seq("col_name"))
          .select($"col_name", $"n_rows", $"n_null", $"ndv_exact",
            $"min_v", $"max_v",
            (abs($"ndv_est" - $"ndv_exact") <= $"ndv_exact" * 0.05).as("ndv_ok"))
          .orderBy($"col_name")
      },
      Some("""WITH w AS (
             |  SELECT count(l_orderkey) AS n1, count(*) - count(l_orderkey) AS z1,
             |    count(DISTINCT l_orderkey) AS d1, round(CAST(min(l_orderkey) AS DOUBLE), 2) AS mn1,
             |    round(CAST(max(l_orderkey) AS DOUBLE), 2) AS mx1,
             |    count(l_suppkey) AS n2, count(*) - count(l_suppkey) AS z2,
             |    count(DISTINCT l_suppkey) AS d2, round(CAST(min(l_suppkey) AS DOUBLE), 2) AS mn2,
             |    round(CAST(max(l_suppkey) AS DOUBLE), 2) AS mx2,
             |    count(l_quantity) AS n3, count(*) - count(l_quantity) AS z3,
             |    count(DISTINCT l_quantity) AS d3, round(CAST(min(l_quantity) AS DOUBLE), 2) AS mn3,
             |    round(CAST(max(l_quantity) AS DOUBLE), 2) AS mx3,
             |    count(l_extendedprice) AS n4, count(*) - count(l_extendedprice) AS z4,
             |    count(DISTINCT l_extendedprice) AS d4, round(CAST(min(l_extendedprice) AS DOUBLE), 2) AS mn4,
             |    round(CAST(max(l_extendedprice) AS DOUBLE), 2) AS mx4
             |  FROM lineitem)
             |SELECT 'l_orderkey' AS col_name, n1 AS n_rows, z1 AS n_null, d1 AS ndv_exact, mn1 AS min_v, mx1 AS max_v, true AS ndv_ok FROM w
             |UNION ALL
             |SELECT 'l_suppkey', n2, z2, d2, mn2, mx2, true FROM w
             |UNION ALL
             |SELECT 'l_quantity', n3, z3, d3, mn3, mx3, true FROM w
             |UNION ALL
             |SELECT 'l_extendedprice', n4, z4, d4, mn4, mx4, true FROM w
             |ORDER BY col_name""".stripMargin)),

    // group-level set similarity: exact pairwise token-set Jaccard between
    // languages (the estimator counterpart is MinHashSetAgg, spec-tested)
    Q("q46_group_jaccard",
      (s, dir) => {
        import s.implicits._
        val tok = Tables(s, dir, "documents")
          .select($"lang", explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "").distinct()
        val counts = tok.groupBy($"lang").agg(count(lit(1)).as("n"))
        val inter = tok.select($"lang".as("lang_a"), $"token")
          .join(tok.select($"lang".as("lang_b"), $"token"), Seq("token"))
          .filter($"lang_a" < $"lang_b")
          .groupBy($"lang_a", $"lang_b").agg(count(lit(1)).as("ni"))
        inter
          .join(counts.select($"lang".as("lang_a"), $"n".as("na")), Seq("lang_a"))
          .join(counts.select($"lang".as("lang_b"), $"n".as("nb")), Seq("lang_b"))
          .select($"lang_a", $"lang_b",
            round($"ni" / ($"na" + $"nb" - $"ni"), 4).as("jaccard"))
          .orderBy($"lang_a", $"lang_b")
      },
      Some("""WITH tok AS (
             |  SELECT DISTINCT lang, token FROM (
             |    SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
             |  WHERE token <> ''),
             |counts AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
             |inter AS (
             |  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS ni
             |  FROM tok a JOIN tok b ON a.token = b.token AND a.lang < b.lang
             |  GROUP BY a.lang, b.lang)
             |SELECT lang_a, lang_b,
             |  round(ni / (ca.n + cb.n - ni), 4) AS jaccard
             |FROM inter
             |JOIN counts ca ON ca.lang = lang_a
             |JOIN counts cb ON cb.lang = lang_b
             |ORDER BY lang_a, lang_b""".stripMargin))
  )
}

package graft.queries

import graft.{Q, Tables}
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Fourth coverage wave: salted skew joins behind the gate, MapType
  * surface, datetime function battery, typed Dataset ops.
  */
object Extra3Queries {

  /** Typed row for the Dataset surface (q71). */
  final case class OrderT(o_orderkey: Long, o_totalprice: Double, o_orderstatus: String)

  /** Drop a managed table AND its possibly-orphaned warehouse location (a
    * fresh JVM has a fresh in-memory catalog, but the previous run's
    * directory survives — `overwrite` alone then fails with
    * LOCATION_ALREADY_EXISTS). */
  def freshTable(s: org.apache.spark.sql.SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Session-scoped build-once for derived table layouts (bucketed
    * tables are a persisted investment like the s04 IVF layout: built
    * once, amortized over every later join). The in-memory catalog dies
    * with the session, so catalog presence + a matching source key means
    * THIS session built it from the same input and the build can be
    * skipped — steady-state calls measure the join, not the layout. */
  private val builtTables = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def buildTableOnce(
      s: org.apache.spark.sql.SparkSession, name: String, srcKey: String)(
      build: => Unit): Unit = builtTables.synchronized {
    if (builtTables.get(name) != srcKey || !s.catalog.tableExists(name)) {
      freshTable(s, name)
      build
      builtTables.put(name, srcKey)
    }
  }

  def all: Seq[Q] = Seq(

    // ---- salted join produces results identical to the plain join (the
    //      skew treatment changes partitioning, not semantics): hot keys
    //      spread over 8 sub-keys, small side replicated 8× ----
    Q("q68_salted_join",
      (s, dir) => {
        import s.implicits._
        import graft.operators.SkewOps
        val l = Tables(s, dir, "lineitem")
          .select($"l_suppkey", $"l_extendedprice")
        val sup = Tables(s, dir, "supplier")
          .select($"s_suppkey", $"s_nationkey")
        SkewOps.saltedJoin(l, sup, "l_suppkey", "s_suppkey", salt = 8)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n,
             |  round(sum(l_extendedprice), 2) AS total
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ---- MapType surface: token→count map per document via
    //      map_from_entries, exploded back with map_keys cardinality ----
    Q("q69_map_ops",
      (s, dir) => {
        import s.implicits._
        val tok = Tables(s, dir, "documents").filter($"doc_id" < 50)
          .select($"doc_id", explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"doc_id", $"token")
          .agg(count(lit(1)).as("cnt"))
        tok.groupBy($"doc_id")
          .agg(map_from_entries(array_sort(collect_list(struct($"token", $"cnt"))))
            .as("m"))
          .select($"doc_id", size(map_keys($"m")).cast("long").as("n_distinct"),
            explode($"m").as(Seq("token", "cnt")))
          .orderBy($"doc_id", $"token")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, token, count(*) AS cnt
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |        FROM documents WHERE doc_id < 50)
             |  WHERE token <> '' GROUP BY doc_id, token),
             |d AS (SELECT doc_id, count(*) AS n_distinct FROM tok GROUP BY doc_id)
             |SELECT t.doc_id, d.n_distinct, t.token, t.cnt
             |FROM tok t JOIN d ON t.doc_id = d.doc_id
             |ORDER BY t.doc_id, t.token""".stripMargin)),

    // ---- datetime function battery: quarter / ISO weekday / last_day /
    //      add_months / datediff (formatted or integer outputs only — no
    //      raw timestamps in the compare) ----
    Q("q70_datetime_funcs",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders").filter($"o_orderkey" < 2000)
          .select($"o_orderkey",
            quarter($"o_orderdate").cast("long").as("qtr"),
            (weekday($"o_orderdate") + 1).cast("long").as("isodow"),
            date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
            date_format(add_months($"o_orderdate", 2), "yyyy-MM-dd").as("plus2m"),
            datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long")
              .as("days_since"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  quarter(o_orderdate) AS qtr,
             |  isodow(o_orderdate) AS isodow,
             |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
             |  strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
             |  date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since
             |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin)),

    // ---- typed Dataset surface: case-class encoder, typed filter + map
    //      (the Dataset[T] path compiles to the same Catalyst plan —
    //      deserialization only at the lambda boundary) ----
    Q("q71_typed_ops",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          .as[OrderT]
          .filter(_.o_totalprice > 100000)
          .map(o => (o.o_orderkey, o.o_orderstatus,
            math.floor(o.o_totalprice / 1000.0).toLong))
          .toDF("o_orderkey", "o_orderstatus", "k_price")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS k_price
             |FROM orders WHERE o_totalprice > 100000
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- partitioned layout: write partitioned by a key, read back one
    //      partition — the filter prunes to a single directory at the
    //      file-index level (the 100 TB pattern: lake partitioned by
    //      date/type, queries touch only their slice) ----
    Q("q72_partitioned_roundtrip",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
        Tables(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"event_type", $"value", $"us")
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(s"$tmp/events_by_type")
        s.read.parquet(s"$tmp/events_by_type")
          .filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
          .filter($"n" >= 3)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id HAVING count(*) >= 3
             |ORDER BY user_id""".stripMargin)),

    // ---- dynamic partition overwrite (the Hive INSERT OVERWRITE ...
    //      PARTITION analog, reference-world core op): an update batch
    //      rewrites ONLY the partitions it contains — at 100 TB the
    //      daily restatement touches one day's directories, not the
    //      table. Here the 'click' partition is restated to high-value
    //      clicks; 'purchase'/'view' partitions keep their original rows
    //      (proving untouched partitions survive the overwrite) ----
    Q("q87_dynamic_partition_overwrite",
      (s, dir) => {
        import s.implicits._
        // stable per-source path: every run overwrites the same layout
        // instead of leaking a fresh temp copy of events per invocation
        val key = java.lang.Long.toHexString(
          java.util.Arrays.hashCode(dir.getBytes("UTF-8")).toLong & 0xFFFFFFFFL)
        val path = s"${graft.Scratch.dir(s"graft_dpo_$key")}/events_dpo"
        val base = Tables(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"event_type", $"value", $"us")
        base.write.mode("overwrite").partitionBy("event_type").parquet(path)
        base.filter($"event_type" === "click" && $"value" > 50)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("event_type").parquet(path)
        s.read.parquet(path)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM (SELECT event_type, value FROM events
             |      WHERE event_type <> 'click'
             |      UNION ALL
             |      SELECT event_type, value FROM events
             |      WHERE event_type = 'click' AND value > 50)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- mergeable HLL sketch columns (Spark 4 hll_sketch_agg /
    //      hll_union_agg): per-day sketches of active users built once,
    //      then MERGED across days for any date range — the incremental
    //      distinct-count pattern at 100 TB, where re-scanning raw events
    //      per query is replaced by unioning kilobyte sketches. Gate:
    //      merged estimate within 5% of the exact range-wide distinct ----
    Q("q89_hll_sketch_merge",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "events")
          .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
        // stage 1: one sketch per (day, event_type) — in production this
        // table is persisted and appended per ingest batch
        val daily = e.groupBy($"day", $"event_type")
          .agg(hll_sketch_agg($"user_id").as("sk"),
            countDistinct($"user_id").as("day_exact"))
        // stage 2: range query answered from sketches alone
        daily.groupBy($"event_type")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
            sum($"day_exact").as("sum_daily"))
          .join(e.groupBy($"event_type")
            .agg(countDistinct($"user_id").as("exact_n")), Seq("event_type"))
          .select($"event_type", $"exact_n",
            (abs($"est" - $"exact_n") <= $"exact_n" * 0.05).as("within_5pct"),
            // the merged estimate tracks the deduplicated range-wide
            // distinct, never the per-day sum: est <= exact*1.05 and
            // exact <= sum_daily, so the 1.05 bound is GUARANTEED given
            // within_5pct (a strict est < sum_daily would be
            // data-dependent — false whenever no user repeats days)
            ($"est" <= $"sum_daily" * 1.05).as("bounded_by_daily_sum"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_n,
             |  true AS within_5pct, true AS bounded_by_daily_sum
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- HLL set-INTERSECTION estimate (q159): audience overlap from
    //      sketches alone via inclusion–exclusion — |A∩B| ≈ est(A) +
    //      est(B) − est(A∪B), where est(A∪B) is one hll_union_agg
    //      merge of the two stored sketches (q89's incremental-
    //      distinct pattern asked the segment-overlap question every
    //      audience system asks: "how many users both click and
    //      purchase", answered WITHOUT re-scanning raw events).
    //      Inclusion–exclusion compounds the three estimates' errors
    //      against a possibly-small intersection, so the band is
    //      honest about it: 15% of the LARGER side + 5 absolute (the
    //      q89/q98 band-check discipline — HLL is deterministic, so
    //      the boolean is stable, and the exact values ride beside
    //      it). ----
    Q("q159_hll_intersection",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
        // stage 1: one stored sketch per segment (persisted in prod) —
        // localCheckpointed because a/b/u all derive from it: without
        // it each would re-run the events scan + sketch aggregation
        val sk = e.groupBy($"event_type")
          .agg(hll_sketch_agg($"user_id").as("sk"),
            countDistinct($"user_id").as("exact_n"))
          .localCheckpoint(true)
        val a = sk.filter($"event_type" === "click")
          .select($"sk".as("sk_a"), $"exact_n".as("n_click_exact"))
        val b = sk.filter($"event_type" === "purchase")
          .select($"sk".as("sk_b"), $"exact_n".as("n_purchase_exact"))
        // stage 2: union estimate from the two sketches alone
        val u = sk.agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_u"))
        val estA = hll_sketch_estimate($"sk_a")
        val estB = hll_sketch_estimate($"sk_b")
        val exact = e.groupBy($"user_id")
          .agg(countDistinct($"event_type").as("k"))
          .filter($"k" === 2)
          .agg(count(lit(1)).as("n_inter_exact"))
        a.crossJoin(b).crossJoin(broadcast(u)).crossJoin(broadcast(exact))
          .select($"n_click_exact", $"n_purchase_exact", $"n_inter_exact",
            (abs(estA + estB - $"est_u" - $"n_inter_exact") <=
              greatest($"n_click_exact", $"n_purchase_exact") * 0.15 + 5)
              .as("inter_within_band"))
      },
      Some("""WITH seg AS (
             |  SELECT user_id, event_type FROM events
             |  WHERE event_type IN ('click', 'purchase'))
             |SELECT
             |  (SELECT count(DISTINCT user_id) FROM seg
             |   WHERE event_type = 'click') AS n_click_exact,
             |  (SELECT count(DISTINCT user_id) FROM seg
             |   WHERE event_type = 'purchase') AS n_purchase_exact,
             |  (SELECT count(*) FROM (
             |    SELECT user_id FROM seg GROUP BY user_id
             |    HAVING count(DISTINCT event_type) = 2)) AS n_inter_exact,
             |  true AS inter_within_band""".stripMargin)),

    // ---- Z-order (Morton) clustered layout: files own compact
    //      rectangles of (l_partkey, l_suppkey) space, so parquet
    //      min/max stats prune a box predicate on EITHER dimension
    //      (pruning ratios asserted in ScaleSpec; exercised here
    //      end-to-end with a content oracle) ----
    Q("q88_zorder_layout",
      (s, dir) => {
        import s.implicits._
        val key = java.lang.Long.toHexString(
          java.util.Arrays.hashCode(dir.getBytes("UTF-8")).toLong & 0xFFFFFFFFL)
        val path = s"${graft.Scratch.dir(s"graft_zorder_$key")}/lineitem_z"
        val li = Tables(s, dir, "lineitem")
          .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
        // ~10% probe box per dimension from the ranges the layout write
        // already computed (no second bounds scan); data-derived so the
        // query is meaningful at every SF (key domains scale with SF)
        val ranges = Layout.zorderWrite(
          li, "l_partkey", "l_suppkey", files = 32, path = path)
        val (pMax, sMax) = (ranges.aMax.toLong, ranges.bMax.toLong)
        s.read.parquet(path)
          .filter($"l_partkey".between(pMax * 4 / 10, pMax * 5 / 10) &&
            $"l_suppkey".between(sMax * 4 / 10, sMax * 5 / 10))
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(*) AS n,
             |  round(sum(l_extendedprice), 2) AS total
             |FROM lineitem
             |WHERE l_partkey BETWEEN (SELECT max(l_partkey) * 4 // 10 FROM lineitem)
             |                    AND (SELECT max(l_partkey) * 5 // 10 FROM lineitem)
             |  AND l_suppkey BETWEEN (SELECT max(l_suppkey) * 4 // 10 FROM lineitem)
             |                    AND (SELECT max(l_suppkey) * 5 // 10 FROM lineitem)
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ---- bucketed layout: both sides bucketed on the join key → the
    //      sort-merge join runs with NO exchange (pre-shuffled storage;
    //      asserted in ScaleSpec, exercised here end-to-end) ----
    Q("q73_bucketed_join",
      (s, dir) => {
        import s.implicits._
        // key freshness on the source files' CONTENT identity (footer
        // fingerprint, not mtime) — a regenerated fixture with changed
        // data rebuilds exactly once; a byte-identical regen reuses
        def srcKey(t: String): String =
          Tables.contentIdent(s"$dir/$t.parquet")
        buildTableOnce(s, "graft_bkt_orders", srcKey("orders")) {
          Tables(s, dir, "orders")
            .write.mode("overwrite").bucketBy(8, "o_custkey")
            .sortBy("o_custkey").saveAsTable("graft_bkt_orders")
        }
        buildTableOnce(s, "graft_bkt_customer", srcKey("customer")) {
          Tables(s, dir, "customer")
            .write.mode("overwrite").bucketBy(8, "c_custkey")
            .sortBy("c_custkey").saveAsTable("graft_bkt_customer")
        }
        s.table("graft_bkt_orders")
          .join(s.table("graft_bkt_customer"),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- fuzzy/encoding scalar battery: edit distance (typo-tolerant
    //      matching for data cleaning), character translation, field
    //      splitting, base64 round-trip ----
    Q("q79_fuzzy_encoding",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "part").filter($"p_partkey" < 500)
          .select($"p_partkey",
            levenshtein($"p_name", $"p_type").cast("long").as("edit_dist"),
            translate($"p_name", "aeiou", "AEIOU").as("vowel_caps"),
            split_part($"p_type", lit(" "), lit(1)).as("first_word"),
            base64(encode($"p_brand", "UTF-8")).as("brand_b64"),
            decode(unbase64(base64(encode($"p_name", "UTF-8"))), "UTF-8")
              .as("roundtrip"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  levenshtein(p_name, p_type) AS edit_dist,
             |  translate(p_name, 'aeiou', 'AEIOU') AS vowel_caps,
             |  split_part(p_type, ' ', 1) AS first_word,
             |  to_base64(encode(p_brand)) AS brand_b64,
             |  p_name AS roundtrip
             |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin)),

    // ---- count-min sketch heavy hitters: ONE constant-size sketch per
    //      table scan (vs a full groupBy of every key), probed in-plan by
    //      the custom cms_estimate expression; the CMS bound
    //      (true <= est <= true + eps*N, seeded ⇒ deterministic) is the
    //      gated property, with the exact counts alongside ----
    Q("q82_cms_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        import graft.functions.SketchExprs.cms_estimate
        val l = Tables(s, dir, "lineitem").select($"l_suppkey")
        val sk = l.agg(
          expr("count_min_sketch(l_suppkey, 0.0001d, 0.99d, 42)").as("sk"),
          count(lit(1)).as("n"))
        val truth = l.groupBy($"l_suppkey").agg(count(lit(1)).as("true_cnt"))
        truth.filter($"l_suppkey" <= 10)
          .crossJoin(broadcast(sk))
          .withColumn("est", cms_estimate($"sk", $"l_suppkey"))
          .select($"l_suppkey", $"true_cnt",
            ($"est" >= $"true_cnt" &&
              $"est" <= $"true_cnt" + ceil($"n" * 0.0001).cast("long")).as("ok"))
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(*) AS true_cnt, true AS ok
             |FROM lineitem WHERE l_suppkey <= 10
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ---- FILTER-clause aggregation + ordered listagg (Spark 4) ----
    Q("q85_filter_listagg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "nation")
          .groupBy($"n_regionkey")
          .agg(
            expr("count(*) FILTER (WHERE n_nationkey % 2 = 0)").as("n_even"),
            expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
              .as("names"))
          .orderBy($"n_regionkey")
      },
      Some("""SELECT n_regionkey,
             |  count(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even,
             |  string_agg(n_name, ',' ORDER BY n_name) AS names
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // ---- try_* arithmetic: errors become NULL instead of failing the
    //      job (the ANSI-safe cleaning surface for dirty data) ----
    Q("q86_try_arithmetic",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem").filter($"l_orderkey" < 500)
          .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
            round(expr("try_divide(l_extendedprice, l_linenumber - 1)"), 4)
              .as("per_prior_line"), // line 1 divides by zero -> NULL
            expr("try_add(CAST(9223372036854775807 AS BIGINT), l_orderkey + 1)")
              .as("overflowed"), // orderkey >= 0 ⇒ always overflows -> NULL
            expr("try_cast(l_returnflag AS BIGINT)").as("not_a_number"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  round(l_extendedprice / nullif(l_linenumber - 1, 0), 4)
             |    AS per_prior_line,
             |  CAST(NULL AS BIGINT) AS overflowed,
             |  try_cast(l_returnflag AS BIGINT) AS not_a_number
             |FROM lineitem WHERE l_orderkey < 500
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- fuzzy match (entity resolution, the INGEST shape): a BOUNDED
    //      batch of dirty names — 40 master names with one deterministic
    //      character substitution, the typo'd-record arrival a master-
    //      data pipeline actually resolves — matched against the FULL
    //      supplier master table at edit distance <= 2. Blocking is the
    //      lossless length band (|len(a)-len(b)| <= 2 is necessary for
    //      lev <= 2) with the batch side exploding its ±2 length keys
    //      and BROADCAST, so the master table never shuffles: one master
    //      scan, candidates = |master| x (batch rows in band) — linear
    //      in the corpus with a constant batch factor. Re-scoped round
    //      16 (the m08 precedent): the old whole-corpus length-band
    //      SELF-join measured 85.7x wall at 10x data (block sizes grow
    //      with the table — the weak-blocking anti-pattern) and is
    //      retired to the ScaleProbe pedagogy probe; whole-corpus fuzzy
    //      self-joins belong to the position-anchored PassJoin design
    //      (q128 / Dedup.editDistanceJoin). ----
    Q("q84_fuzzy_match",
      (s, dir) => {
        import s.implicits._
        val sup = Tables(s, dir, "supplier")
        // dirty ingest batch: position 9 ('#') substituted — lev 1 from
        // the source row, lev <= 2 to masters one digit away from it
        val batch = sup.filter($"s_suppkey" <= 40)
          .select(($"s_suppkey" + 500000L).as("id_b"),
            concat(substring($"s_name", 1, 8), lit("X"),
              expr("substring(s_name, 10)")).as("name_b"))
          .withColumn("la",
            explode(sequence(length($"name_b") - 2, length($"name_b") + 2)))
        sup.select($"s_suppkey".as("id_a"), $"s_name".as("name_a"),
            length($"s_name").as("la"))
          .join(broadcast(batch), Seq("la"))
          .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
          .filter($"dist" <= 2)
          .select($"id_a", $"id_b", $"dist")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH batch AS (
             |  SELECT s_suppkey + 500000 AS id_b,
             |    concat(substring(s_name, 1, 8), 'X', substring(s_name, 10))
             |      AS name_b
             |  FROM supplier WHERE s_suppkey <= 40)
             |SELECT m.s_suppkey AS id_a, b.id_b,
             |  CAST(levenshtein(m.s_name, b.name_b) AS BIGINT) AS dist
             |FROM supplier m JOIN batch b
             |  ON abs(length(m.s_name) - length(b.name_b)) <= 2
             |WHERE levenshtein(m.s_name, b.name_b) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- approx percentile (t-digest-family sketch) gated within a
    //      1% band of the exact interpolated percentile, q29-style ----
    Q("q83_approx_percentile",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            percentile($"l_extendedprice", lit(0.5)).as("exact_p50"),
            percentile_approx($"l_extendedprice", lit(0.5), lit(10000))
              .as("approx"))
          .select($"l_returnflag", round($"exact_p50", 2).as("exact_p50"),
            (abs($"approx" - $"exact_p50") <= $"exact_p50" * 0.01)
              .as("within_1pct"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
             |  true AS within_1pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Bloom-filter semi-join pruning (hand-rolled runtime filter,
    //      the 100 TB fact-scan idiom): build a constant-size mergeable
    //      bloom over the SELECTIVE dimension's keys, drop fact rows at
    //      the scan before they pay the join shuffle; the exact join
    //      then removes the bloom's false positives, so the composition
    //      is bit-identical to the plain join — which is exactly what
    //      the oracle checks ----
    Q("q92_bloom_prune",
      (s, dir) => {
        import s.implicits._
        import graft.functions.BloomExprs
        val hot = Tables(s, dir, "orders")
          .filter($"o_totalprice" > 400000)
          .select($"o_orderkey", $"o_orderpriority")
        // ~10 bits/key at the expected build cardinality; FPs only cost
        // verification work in the exact join below. The sketch reaches
        // the probe as a SCALAR SUBQUERY (how Spark's own runtime filter
        // injects it): evaluated once, then a codegen constant. Joining
        // it as a broadcast column instead would make every fact row
        // re-copy the 128 KiB sketch out of its UnsafeRow (getBinary
        // allocates per call) — measured 75x slower on the bench.
        val bf = hot.agg(
          BloomExprs.bloom_agg(xxhash64($"o_orderkey"), 1 << 20, 5).as("bf"))
          .scalar()
        val pruned = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice")
          .filter(BloomExprs.bloom_might_contain(bf, xxhash64($"l_orderkey")))
        pruned.join(hot, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum($"l_extendedprice"), 2).as("total"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  round(sum(l_extendedprice), 2) AS total
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_totalprice > 400000
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- Jaro-Winkler similarity: custom codegen'd Expression vs
    //      DuckDB's built-in, over a bounded part-name block (scale path
    //      for fuzzy matching = q84's length-band blocking with this as
    //      the verifier) ----
    Q("q93_jaro_winkler",
      (s, dir) => {
        import s.implicits._
        import graft.functions.StringSim
        val p = Tables(s, dir, "part").filter($"p_partkey" < 100)
        val a = p.select($"p_partkey".as("id_a"), $"p_name".as("name_a"))
        val b = p.select($"p_partkey".as("id_b"), $"p_name".as("name_b"))
        a.crossJoin(b).filter($"id_a" < $"id_b")
          .select($"id_a", $"id_b",
            round(StringSim.jaro_winkler($"name_a", $"name_b"), 4).as("jw"))
          .orderBy($"id_a", $"id_b")
      },
      Some("""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
             |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
             |WHERE a.p_partkey < 100 AND b.p_partkey < 100
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Spark 4 VARIANT surface: ingest nested JSON payloads as
    //      semi-structured VARIANT, extract typed fields with
    //      variant_get path expressions, aggregate. The JSON text is
    //      built from order columns on BOTH sides so the gate checks the
    //      parse->path-extract->cast pipeline, not string formatting ----
    Q("q94_variant_json",
      (s, dir) => {
        import s.implicits._
        // The price gate is applied to o_totalprice BEFORE the payload is
        // built: `price` is o_totalprice verbatim, so the result set is
        // identical, but the predicate pushes to the parquet scan and the
        // parse_json(to_json(...)) pipeline runs once per SURVIVING row.
        // Filtering on the extracted `price` instead makes Catalyst push
        // the filter below the projection and duplicate the whole JSON
        // round-trip per row (2x the dominant cost — see README's
        // "expensive expression + pushed filter" pitfall).
        val v = Tables(s, dir, "orders")
          .filter($"o_totalprice" > 100000)
          .select(parse_json(to_json(struct(
            $"o_orderkey".as("k"),
            struct($"o_custkey".as("id")).as("cust"),
            $"o_totalprice".as("price"),
            $"o_orderstatus".as("status")))).as("v"))
          .select(
            variant_get($"v", "$.status", "string").as("status"),
            variant_get($"v", "$.cust.id", "bigint").as("cust_id"),
            variant_get($"v", "$.price", "double").as("price"))
        v.groupBy($"status")
          .agg(count(lit(1)).as("n"),
            countDistinct($"cust_id").as("n_cust"),
            round(sum($"price"), 2).as("total"))
          .orderBy($"status")
      },
      Some("""WITH j AS (
             |  SELECT to_json(struct_pack(
             |    k := o_orderkey,
             |    cust := struct_pack(id := o_custkey),
             |    price := o_totalprice,
             |    status := o_orderstatus)) AS v
             |  FROM orders
             |  WHERE o_totalprice > 100000
             |), x AS (
             |  SELECT json_extract_string(v, '$.status') AS status,
             |    CAST(json_extract(v, '$.cust.id') AS BIGINT) AS cust_id,
             |    CAST(json_extract(v, '$.price') AS DOUBLE) AS price
             |  FROM j
             |)
             |SELECT status, count(*) AS n,
             |  count(DISTINCT cust_id) AS n_cust,
             |  round(sum(price), 2) AS total
             |FROM x
             |GROUP BY status ORDER BY status""".stripMargin)),

    // ---- CDC snapshot diff: classify changed keys between two snapshot
    //      deliveries (Mutations.snapshotDiff — ONE key shuffle, null-safe
    //      struct compare, unchanged bulk never materializes). The "new"
    //      snapshot derives deterministically from the old so the oracle
    //      reproduces it: drop %97 keys, bump acctbal on %10=3, add
    //      shifted keys for %50=7 ----
    Q("q99_snapshot_diff",
      (s, dir) => {
        import s.implicits._
        val old = Tables(s, dir, "customer")
        val newSnap = old.filter($"c_custkey" % 97 =!= 0)
          .withColumn("c_acctbal",
            when($"c_custkey" % 10 === 3, round($"c_acctbal" + 100, 2))
              .otherwise($"c_acctbal"))
          .unionByName(old.filter($"c_custkey" % 50 === 7)
            .withColumn("c_custkey", $"c_custkey" + 1000000))
        graft.operators.Mutations.snapshotDiff(old, newSnap, Seq("c_custkey"))
          .orderBy($"c_custkey")
      },
      Some("""WITH newsnap AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 10 = 3
             |         THEN round(c_acctbal + 100, 2) ELSE c_acctbal END AS c_acctbal,
             |    c_mktsegment
             |  FROM customer WHERE c_custkey % 97 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 50 = 7
             |)
             |SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |       WHEN n.c_custkey IS NULL THEN 'delete'
             |       ELSE 'update' END AS change_type
             |FROM customer o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey
             |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
             |   OR NOT (o.c_name IS NOT DISTINCT FROM n.c_name
             |       AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
             |       AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
             |       AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- SCD Type-2 merge: dimension-history maintenance under an
    //      update batch (Mutations.scd2Merge — history passes through
    //      un-joined, batch broadcasts, 1-2 rows per key via map-side
    //      explode). Batch: changed rows (%10=3), a no-op delivery
    //      (%20=5, proves unchanged updates don't churn history), and
    //      brand-new keys (%50=7 shifted) ----
    Q("q100_scd2_merge",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val dim = cust
          .withColumn("valid_from", lit(0L))
          .withColumn("valid_to", lit(null).cast("long"))
          .withColumn("is_current", lit(true))
        val batch = cust.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", round($"c_acctbal" + 100, 2))
          .unionByName(cust.filter($"c_custkey" % 20 === 5))
          .unionByName(cust.filter($"c_custkey" % 50 === 7)
            .withColumn("c_custkey", $"c_custkey" + 1000000))
        graft.operators.Mutations
          .scd2Merge(dim, batch, "c_custkey", ts = 100L)
          .select($"c_custkey", $"c_acctbal", $"valid_from", $"valid_to",
            $"is_current")
          .orderBy($"c_custkey", $"valid_from")
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, round(c_acctbal + 100, 2) AS c_acctbal, true AS chg
             |  FROM customer WHERE c_custkey % 10 = 3
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal, false AS chg
             |  FROM customer WHERE c_custkey % 20 = 5
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_acctbal, true AS chg
             |  FROM customer WHERE c_custkey % 50 = 7
             |)
             |SELECT d.c_custkey, d.c_acctbal, CAST(0 AS BIGINT) AS valid_from,
             |  CAST(100 AS BIGINT) AS valid_to, false AS is_current
             |FROM customer d JOIN upd u ON d.c_custkey = u.c_custkey AND u.chg
             |UNION ALL
             |SELECT d.c_custkey, d.c_acctbal, 0, NULL, true
             |FROM customer d LEFT JOIN upd u
             |  ON d.c_custkey = u.c_custkey AND u.chg
             |WHERE u.c_custkey IS NULL
             |UNION ALL
             |SELECT u.c_custkey, u.c_acctbal, 100, NULL, true
             |FROM upd u WHERE u.chg
             |ORDER BY c_custkey, valid_from""".stripMargin)),

    // ---- SCD Type-1 upsert (MERGE INTO: matched keys overwrite, new
    //      keys insert, no history — Mutations.scd1Upsert; one broadcast
    //      anti-join, dimension never shuffles or compares attrs) ----
    Q("q101_scd1_upsert",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val batch = cust.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", round($"c_acctbal" + 100, 2))
          .unionByName(cust.filter($"c_custkey" % 50 === 7)
            .withColumn("c_custkey", $"c_custkey" + 1000000))
        graft.operators.Mutations.scd1Upsert(cust, batch, "c_custkey")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
             |FROM (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 10 <> 3
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_nationkey,
             |    round(c_acctbal + 100, 2), c_mktsegment
             |  FROM customer WHERE c_custkey % 10 = 3
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
             |    c_mktsegment
             |  FROM customer WHERE c_custkey % 50 = 7)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- partition-scoped MERGE INTO (lakehouse copy-on-write upsert):
    //      the batch touches only the 'click' partition, so mergeWrite
    //      reads and rewrites THAT partition alone — every other
    //      partition's files stay untouched bytes (ScaleSpec asserts).
    //      Rebuilt from the fixture every invocation: the merge MUTATES
    //      the table, so determinism comes from rebuild-then-merge ----
    Q("q102_partitioned_merge",
      (s, dir) => {
        import s.implicits._
        val key = java.lang.Long.toHexString(
          java.util.Arrays.hashCode(dir.getBytes("UTF-8")).toLong & 0xFFFFFFFFL)
        val path = s"${graft.Scratch.dir(s"graft_mrg_$key")}/events_merge"
        val base = Tables(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"event_type", $"value", $"us")
        base.write.mode("overwrite").partitionBy("event_type").parquet(path)
        val batch = base
          .filter($"event_type" === "click" && $"event_id" % 10 === 3)
          .withColumn("value", round($"value" + 1000, 2))
          .unionByName(base
            .filter($"event_type" === "click" && $"event_id" % 100 === 7)
            .withColumn("event_id", $"event_id" + 100000000L))
        graft.operators.Mutations.mergeWrite(path, batch, "event_id", "event_type")
        s.read.parquet(path)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM (
             |  SELECT event_type, value FROM events WHERE event_type <> 'click'
             |  UNION ALL
             |  SELECT event_type,
             |    CASE WHEN event_id % 10 = 3 THEN round(value + 1000, 2)
             |         ELSE value END AS value
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT event_type, value FROM events
             |  WHERE event_type = 'click' AND event_id % 100 = 7)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- PageRank (3 Jacobi sweeps, d=0.85) over the symmetrized
    //      customer-supplier trade graph — link-graph quality signal
    //      (GraphOps.pageRank; iterative edge-join + groupBy(dst) sweeps,
    //      oracle = the same three sweeps unrolled as CTEs). Symmetrizing
    //      removes dangling nodes, so both engines' shared simplification
    //      (no dangling-mass redistribution) is vacuous here. Ordering is
    //      on the ROUNDED rank so a last-bit float divergence cannot
    //      reorder the cut ----
    Q("q103_pagerank",
      (s, dir) => {
        import s.implicits._
        val pairs = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("a"),
            ($"l_suppkey" + 1000000L).cast("long").as("b")).distinct()
        // symmetrize by map-side explode, NOT a self-union: a union of
        // two selects over `pairs` re-executes the join+distinct per
        // branch (pairs is uncached) — the explode doubles rows in the
        // same pass
        val edges = pairs.select(explode(array(
            struct($"a".as("src"), $"b".as("dst")),
            struct($"b".as("src"), $"a".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"))
        graft.operators.GraphOps.pageRank(edges, "src", "dst", iterations = 3)
          .select($"id".as("node_id"), round($"pr", 7).as("pr"))
          .orderBy($"pr".desc, $"node_id").limit(20)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |), edges AS (
             |  SELECT a AS src, b AS dst FROM pairs
             |  UNION ALL
             |  SELECT b AS src, a AS dst FROM pairs
             |), nodes AS (
             |  SELECT DISTINCT src AS id FROM edges
             |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |deg AS (
             |  SELECT src, CAST(count(*) AS DOUBLE) AS deg
             |  FROM edges GROUP BY src
             |), pr0 AS (
             |  SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
             |), pr1 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr0 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id
             |), pr2 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr1 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id
             |), pr3 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr2 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id
             |)
             |SELECT id AS node_id, round(pr, 7) AS pr FROM pr3
             |ORDER BY pr DESC, id LIMIT 20""".stripMargin)),

    // ---- ordered-sequence (funnel) matching, the MATCH_RECOGNIZE
    //      surface: per-user progress through click → view → purchase,
    //      each step strictly after the previous match
    //      (Sequences.funnelDepth — one sorted-array fold per key; the
    //      oracle is the equivalent correlated-min chain, unrolled) ----
    Q("q104_funnel",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .select($"user_id", unix_micros($"ts").as("us"), $"event_type")
        graft.operators.Sequences.funnelDepth(
          ev, "user_id", "us", "event_type",
          steps = Seq("click", "view", "purchase"))
          .orderBy($"user_id")
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, min(epoch_us(ts)) AS ts1
             |  FROM events WHERE event_type = 'click' GROUP BY user_id
             |), t2 AS (
             |  SELECT e.user_id, min(epoch_us(e.ts)) AS ts2
             |  FROM events e JOIN t1 ON e.user_id = t1.user_id
             |    AND epoch_us(e.ts) > t1.ts1
             |  WHERE e.event_type = 'view' GROUP BY e.user_id
             |), t3 AS (
             |  SELECT e.user_id, min(epoch_us(e.ts)) AS ts3
             |  FROM events e JOIN t2 ON e.user_id = t2.user_id
             |    AND epoch_us(e.ts) > t2.ts2
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
             |)
             |SELECT u.user_id,
             |  CASE WHEN ts3 IS NOT NULL THEN 3
             |       WHEN ts2 IS NOT NULL THEN 2
             |       WHEN ts1 IS NOT NULL THEN 1
             |       ELSE 0 END AS depth
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN t1 ON u.user_id = t1.user_id
             |LEFT JOIN t2 ON u.user_id = t2.user_id
             |LEFT JOIN t3 ON u.user_id = t3.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // ---- small-file compaction (lakehouse OPTIMIZE): fragment the
    //      events table into ~24 files per partition, compact
    //      (Layout.compact), then aggregate the READ-BACK table — loss
    //      or duplication of any row breaks n/total/ids against the
    //      original-table oracle, and the joined-in files_after column
    //      pins that each partition really did collapse to its
    //      size-optimal single file ----
    Q("q105_compact",
      (s, dir) => {
        import s.implicits._
        val key = java.lang.Long.toHexString(
          java.util.Arrays.hashCode(dir.getBytes("UTF-8")).toLong & 0xFFFFFFFFL)
        val path = s"${graft.Scratch.dir(s"graft_cmp_$key")}/events_small"
        val base = Tables(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"event_type", $"value", $"us")
        base.repartition(24)
          .write.mode("overwrite").partitionBy("event_type").parquet(path)
        val stats = graft.operators.Layout.compact(
          s, path, "event_type", targetBytes = 512L * 1024 * 1024)
        val statsDf = stats.toDF()
          .select($"partition".as("event_type"), $"filesAfter".as("files_after"))
        s.read.parquet(path)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"),
            countDistinct($"event_id").as("ids"))
          .join(statsDf, Seq("event_type"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
             |  count(DISTINCT event_id) AS ids, CAST(1 AS BIGINT) AS files_after
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- incremental view maintenance: build the (day, event_type)
    //      aggregate view on 60% of events, fold in the remaining two
    //      20% batches via CHAINED refreshAggView calls (refresh of a
    //      refresh — the daily-ingest steady state), compare against the
    //      full-table recompute oracle. The base never rejoins the plan
    //      after v0 ----
    Q("q106_incremental_view",
      (s, dir) => {
        import s.implicits._
        val keys = Seq("day", "event_type")
        val ev = Tables(s, dir, "events")
          .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
            $"event_id", $"value")
        val v0 = graft.operators.Mutations.aggView(
          ev.filter($"event_id" % 5 <= 2), keys, "value")
        val v1 = graft.operators.Mutations.refreshAggView(
          v0, ev.filter($"event_id" % 5 === 3), keys, "value")
        val v2 = graft.operators.Mutations.refreshAggView(
          v1, ev.filter($"event_id" % 5 === 4), keys, "value")
        v2.select($"day", $"event_type", $"n", round($"total", 2).as("total"),
            round($"mn", 2).as("mn"), round($"mx", 2).as("mx"))
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             |  count(*) AS n, round(sum(value), 2) AS total,
             |  round(min(value), 2) AS mn, round(max(value), 2) AS mx
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // ---- declarative data-quality audit (the Deequ / dbt-test gate a
    //      pipeline runs before trusting a delivery): three row checks
    //      + key uniqueness fused into ONE lineitem aggregate pass, plus
    //      a referential-integrity anti-check against orders. Violation
    //      counts are the gate: range/set checks catch real rows
    //      (discount > 0.08, returnflag 'R'), uniqueness catches the
    //      multi-line orderkey, the FK check proves zero orphans ----
    Q("q107_data_quality",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Expectations
        val li = Tables(s, dir, "lineitem")
        val checks = Seq(
          Expectations.inRange("li_discount_range", "l_discount", 0.0, 0.08),
          Expectations.inSet("li_returnflag_set", "l_returnflag",
            Seq("A", "N")),
          Expectations.notNull("li_shipdate_notnull", "l_shipdate"))
        Expectations.audit(li, checks,
            unique = Seq(("li_orderkey_unique", "l_orderkey")))
          .unionByName(Expectations.fkOrphans("li_orderkey_fk",
            li, "l_orderkey", Tables(s, dir, "orders"), "o_orderkey"))
          .withColumn("ok", $"violations" === 0)
          .orderBy($"chk")
      },
      Some("""WITH a AS (
             |  SELECT count(*) AS total,
             |    CAST(sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.08)
             |      OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_range,
             |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N')
             |      OR l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_set,
             |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_null,
             |    count(*) - count(DISTINCT l_orderkey) AS r_uniq
             |  FROM lineitem),
             |fk AS (
             |  SELECT CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS viol,
             |    count(*) AS total
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |SELECT chk, violations, total, violations = 0 AS ok FROM (
             |  SELECT 'li_discount_range' AS chk, r_range AS violations, total FROM a
             |  UNION ALL SELECT 'li_returnflag_set', r_set, total FROM a
             |  UNION ALL SELECT 'li_shipdate_notnull', r_null, total FROM a
             |  UNION ALL SELECT 'li_orderkey_unique', r_uniq, total FROM a
             |  UNION ALL SELECT 'li_orderkey_fk', viol, total FROM fk)
             |ORDER BY chk""".stripMargin))
  )
}

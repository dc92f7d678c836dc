package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline statistics wave: per-group heavy hitters, TF-IDF
  * scoring, percentile-based quality gating — the corpus-statistics
  * operators a training-data pipeline runs after cleaning/dedup.
  */
object Text2Queries {

  /** Shared t30/t40 oracle: t28's unrolled 4-merge CTE chain through
    * s4 + the subword rollup — train-then-apply (t30) and the stored-
    * layout apply (t40) must both reproduce it exactly. */
  /** The t28 4-merge CTE chain through the fully-merged histogram s4 —
    * shared by the t30/t40 rollup oracle and the t41 encode oracle. */
  private val BpeChainSql: String =
    """w AS (
    |  SELECT tok AS word, count(*) AS cnt FROM (
    |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
    |    FROM documents)
    |  GROUP BY tok),
    |s0 AS (SELECT word, cnt,
    |  list_transform(range(1, length(word)+1), i -> word[i]) AS syms FROM w),
    |p1 AS (
    |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
    |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
    |    FROM s0 WHERE len(syms) >= 2)
    |  GROUP BY l, r),
    |b1 AS (SELECT l, r, n FROM p1 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
    |s1 AS (
    |  SELECT word, cnt,
    |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
    |  FROM (
    |    SELECT word, cnt,
    |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
    |        chr(1) || (SELECT l FROM b1) || chr(2) || chr(1) || (SELECT r FROM b1) || chr(2),
    |        chr(1) || (SELECT l FROM b1) || (SELECT r FROM b1) || chr(2)) AS rep
    |    FROM s0)),
    |p2 AS (
    |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
    |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
    |    FROM s1 WHERE len(syms) >= 2)
    |  GROUP BY l, r),
    |b2 AS (SELECT l, r, n FROM p2 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
    |s2 AS (
    |  SELECT word, cnt,
    |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
    |  FROM (
    |    SELECT word, cnt,
    |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
    |        chr(1) || (SELECT l FROM b2) || chr(2) || chr(1) || (SELECT r FROM b2) || chr(2),
    |        chr(1) || (SELECT l FROM b2) || (SELECT r FROM b2) || chr(2)) AS rep
    |    FROM s1)),
    |p3 AS (
    |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
    |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
    |    FROM s2 WHERE len(syms) >= 2)
    |  GROUP BY l, r),
    |b3 AS (SELECT l, r, n FROM p3 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
    |s3 AS (
    |  SELECT word, cnt,
    |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
    |  FROM (
    |    SELECT word, cnt,
    |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
    |        chr(1) || (SELECT l FROM b3) || chr(2) || chr(1) || (SELECT r FROM b3) || chr(2),
    |        chr(1) || (SELECT l FROM b3) || (SELECT r FROM b3) || chr(2)) AS rep
    |    FROM s2)),
    |p4 AS (
    |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
    |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
    |    FROM s3 WHERE len(syms) >= 2)
    |  GROUP BY l, r),
    |b4 AS (SELECT l, r, n FROM p4 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
    |s4 AS (
    |  SELECT word, cnt,
    |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
    |  FROM (
    |    SELECT word, cnt,
    |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
    |        chr(1) || (SELECT l FROM b4) || chr(2) || chr(1) || (SELECT r FROM b4) || chr(2),
    |        chr(1) || (SELECT l FROM b4) || (SELECT r FROM b4) || chr(2)) AS rep
    |    FROM s3))""".stripMargin

  private val BpeApplySql: String =
    s"""WITH $BpeChainSql
       |SELECT sym, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |  SELECT cnt, unnest(syms) AS sym FROM s4)
       |GROUP BY sym ORDER BY n DESC, sym LIMIT 20""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- exact heavy hitters: top-3 tokens per language ----
    Q("t05_top_tokens",
      (s, dir) => {
        import s.implicits._
        val counts = Tables(s, dir, "documents")
          .select($"lang", explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"lang", $"token")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token".asc)
        counts.withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .orderBy($"lang", $"rn")
      },
      Some("""SELECT lang, token, cnt, rn FROM (
             |  SELECT lang, token, count(*) AS cnt,
             |    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rn
             |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
             |  WHERE token <> ''
             |  GROUP BY lang, token)
             |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin)),

    // ---- TF-IDF: top-5 scored tokens per document over a bounded block ----
    Q("t06_tfidf",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents").filter($"doc_id" < 100)
        val tf = docs
          .select($"doc_id", explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"doc_id", $"token")
          .agg(count(lit(1)).as("tf"))
        val n = docs.agg(countDistinct($"doc_id").as("n_docs"))
        val df = tf.groupBy($"token").agg(countDistinct($"doc_id").as("df"))
        val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"token".asc)
        tf.join(df, Seq("token")).crossJoin(broadcast(n))
          .withColumn("tfidf",
            round($"tf" * log($"n_docs".cast("double") / $"df"), 6))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 5)
          .select($"doc_id", $"token", $"tfidf", $"rn")
          .orderBy($"doc_id", $"rn")
      },
      Some("""WITH d AS (SELECT * FROM documents WHERE doc_id < 100),
             |tf AS (
             |  SELECT doc_id, token, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d)
             |  WHERE token <> '' GROUP BY doc_id, token),
             |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
             |idf AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token)
             |SELECT doc_id, token, tfidf, rn FROM (
             |  SELECT tf.doc_id, tf.token,
             |    round(tf.tf * ln(n.n_docs::DOUBLE / idf.df), 6) AS tfidf,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY round(tf.tf * ln(n.n_docs::DOUBLE / idf.df), 6) DESC,
             |               tf.token) AS rn
             |  FROM tf JOIN idf ON tf.token = idf.token CROSS JOIN n)
             |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin)),

    // ---- percentile quality gate: keep docs inside [p5, p95] of length ----
    Q("t07_length_gate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val bounds = docs.agg(
          expr("percentile(n_chars, 0.05)").as("p5"),
          expr("percentile(n_chars, 0.95)").as("p95"))
        docs.crossJoin(broadcast(bounds))
          .withColumn("kept", $"n_chars" >= $"p5" && $"n_chars" <= $"p95")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"kept", 1L).otherwise(0L)).as("n_kept"))
          .orderBy($"lang")
      },
      Some("""WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS p5,
             |                  quantile_cont(n_chars, 0.95) AS p95 FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN n_chars >= p5 AND n_chars <= p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |FROM documents CROSS JOIN b
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- BPE-ish tokenization: regex piece extraction (word / number /
    //      punctuation classes, then greedy ≤4-char chunks as a stand-in
    //      for merge-table pieces). Per-row codegen'd regex — one corpus
    //      scan, no shuffle before the final sort. ----
    Q("t08_regex_tokens",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"doc_id",
            size(regexp_extract_all(lower($"text"),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_units"),
            size(regexp_extract_all(lower($"text"),
              lit("[a-z]{1,4}"), lit(0))).cast("long").as("n_pieces"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             |    AS n_units,
             |  len(regexp_extract_all(lower(text), '[a-z]{1,4}')) AS n_pieces
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- PII-style redaction: mask digits, count masked chars, verify
    //      the masked payload round-trips (redaction is the first pass of
    //      any release pipeline; here over the JSON props column). ----
    Q("t09_redact",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events").filter($"event_id" < 2000)
          .select($"event_id",
            regexp_replace($"props", "[0-9]", "#").as("redacted"),
            regexp_count($"props", lit("[0-9]")).cast("long").as("n_masked"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             |  regexp_replace(props, '[0-9]', '#', 'g') AS redacted,
             |  len(regexp_extract_all(props, '[0-9]')) AS n_masked
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // ---- deterministic hash sampling + train/val/test split: the
    //      content-addressed assignment every training pipeline needs
    //      (stable under reshuffles/re-runs, unlike rand()-based
    //      TABLESAMPLE). Hash = first 8 md5 hex chars of the id. ----
    Q("t10_hash_split",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .withColumn("bucket",
            (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
              .cast("long") % 100).as("bucket"))
          .select($"doc_id", $"bucket",
            when($"bucket" < 80, "train")
              .when($"bucket" < 90, "val")
              .otherwise("test").as("split"),
            ($"bucket" < 10).as("in_10pct_sample"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, bucket,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             |  bucket < 10 AS in_10pct_sample
             |FROM (SELECT doc_id,
             |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             |          AS bucket
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- document quality classifier: fixed-weight linear model over
    //      length/diversity features + threshold decision (deterministic
    //      "model inference" as a relational plan — the shape a learned
    //      filter takes in a data pipeline; weights would come from
    //      training, the execution is identical) ----
    Q("t11_quality_classifier",
      (s, dir) => {
        import s.implicits._
        val toks = split($"text", " ")
        Tables(s, dir, "documents")
          .withColumn("n_tokens", size(filter(toks, t => t =!= "")).cast("double"))
          .withColumn("ttr",
            size(array_distinct(filter(toks, t => t =!= ""))).cast("double")
              / $"n_tokens")
          .select($"doc_id",
            round(least(lit(1.0), $"n_tokens" / 120.0) * 0.4
              + $"ttr" * 0.4
              + least(lit(1.0), $"n_chars" / 1000.0) * 0.2, 6).as("score"))
          .withColumn("accept", $"score" >= 0.55)
          .orderBy($"doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars,
             |    len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE
             |      AS n_tokens,
             |    len(list_distinct(list_filter(string_split(text, ' '),
             |      x -> x <> '')))::DOUBLE AS n_distinct
             |  FROM documents)
             |SELECT doc_id,
             |  round(least(1.0, n_tokens / 120.0) * 0.4
             |    + (n_distinct / n_tokens) * 0.4
             |    + least(1.0, n_chars / 1000.0) * 0.2, 6) AS score,
             |  round(least(1.0, n_tokens / 120.0) * 0.4
             |    + (n_distinct / n_tokens) * 0.4
             |    + least(1.0, n_chars / 1000.0) * 0.2, 6) >= 0.55 AS accept
             |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- stratified sampling (sampleBy analog) with content-addressed
    //      hashing: per-language keep fractions, reproducible under
    //      reshuffles/re-runs; summarized per stratum ----
    Q("t12_stratified_sample",
      (s, dir) => {
        import s.implicits._
        val frac = when($"lang" === "en", 10)
          .when($"lang" === "de", 25)
          .when($"lang" === "es", 50)
          .otherwise(100)
        Tables(s, dir, "documents")
          .withColumn("bucket",
            conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
              .cast("long") % 100)
          .withColumn("kept", $"bucket" < frac)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"kept", 1L).otherwise(0L)).as("n_sampled"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN bucket < CASE lang WHEN 'en' THEN 10
             |                                        WHEN 'de' THEN 25
             |                                        WHEN 'es' THEN 50
             |                                        ELSE 100 END
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
             |FROM (SELECT lang,
             |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             |          AS bucket
             |      FROM documents)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- bigram language-model scoring (CCNet-style quality filter):
    //      per-doc mean log2 P(w2|w1) under an add-one-smoothed corpus
    //      bigram model. Corpus stats are two shuffles (bigram + prefix
    //      counts), the vocab size is one broadcast scalar, and scoring
    //      joins each doc's bigrams back against the (relatively small)
    //      count tables — at 100 TB the count tables would be written out
    //      once and reused across scoring runs. ----
    Q("t13_bigram_lm",
      (s, dir) => {
        import s.implicits._
        bigramLmScores(s, dir).orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
             |big AS (SELECT doc_id,
             |    unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
             |  FROM d2),
             |bg2 AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big),
             |cnt AS (SELECT w1, w2, count(*) AS c FROM bg2 GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bg2 GROUP BY w1),
             |v AS (SELECT count(DISTINCT t) AS v
             |      FROM (SELECT unnest(toks) AS t FROM d))
             |SELECT doc_id, round(avg(log2((c + 1.0) / (c1 + v))), 4) AS lm_score
             |FROM bg2 JOIN cnt USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- repetition signals (Gopher-style quality rules): duplicate-
    //      token fraction and the share of bigrams taken by the single
    //      most frequent bigram — high values mark boilerplate/spam.
    //      All per-row array math + one per-doc bigram count. ----
    Q("t14_repetition",
      (s, dir) => {
        import s.implicits._
        val toks = filter(split($"text", " "), t => t =!= "")
        val base = Tables(s, dir, "documents")
          .select($"doc_id", toks.as("toks"))
          .filter(size($"toks") >= 2)
          .select($"doc_id", $"toks",
            size($"toks").cast("long").as("n"),
            size(array_distinct($"toks")).cast("long").as("nd"))
        val top = base
          .select($"doc_id", $"n",
            explode(arrays_zip(
              slice($"toks", lit(1), size($"toks") - 1),
              slice($"toks", lit(2), size($"toks") - 1))).as("bg"))
          .groupBy($"doc_id", $"n", $"bg")
          .agg(count(lit(1)).as("c"))
          .groupBy($"doc_id", $"n")
          .agg(max($"c").as("topc"))
        base.select($"doc_id", $"n", $"nd")
          .join(top.select($"doc_id", $"topc"), Seq("doc_id"))
          .select($"doc_id",
            round(lit(1.0) - $"nd".cast("double") / $"n", 4).as("dup_token_frac"),
            round($"topc".cast("double") / ($"n" - 1), 4).as("top_bigram_frac"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |d2 AS (SELECT doc_id, toks, len(toks) AS n,
             |    len(list_distinct(toks)) AS nd
             |  FROM d WHERE len(toks) >= 2),
             |big AS (SELECT doc_id, n,
             |    unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
             |  FROM d2),
             |cnt AS (SELECT doc_id, n, bg, count(*) AS c
             |        FROM big GROUP BY doc_id, n, bg),
             |top AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY doc_id)
             |SELECT d2.doc_id,
             |  round(1 - nd::DOUBLE / n, 4) AS dup_token_frac,
             |  round(topc::DOUBLE / (n - 1), 4) AS top_bigram_frac
             |FROM d2 JOIN top ON d2.doc_id = top.doc_id
             |ORDER BY d2.doc_id""".stripMargin)),

    // ---- PMI collocation mining (word2phrase): top-20 adjacent pairs
    //      by round-3 pointwise mutual information, minCount=5. Ranking
    //      compares ROUNDED pmi with lexicographic tie-break — ln is not
    //      bit-identical across engines, 3 decimals is ----
    Q("t25_pmi_phrases",
      (s, dir) =>
        graft.operators.TextOps.pmiPhrases(
          Tables(s, dir, "documents"), "text", minCount = 5L, k = 20),
      Some("""WITH d AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |bgr AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
             |  FROM d WHERE len(toks) >= 2),
             |bg2 AS (SELECT bg[1] AS w1, bg[2] AS w2 FROM bgr),
             |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg2 GROUP BY w1, w2),
             |cw AS (SELECT w, count(*) AS c
             |       FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w),
             |tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM cw) AS n_tok,
             |               (SELECT CAST(sum(c_ab) AS DOUBLE) FROM cab) AS m_bg)
             |SELECT w1, w2, c_ab,
             |  round(ln((c_ab / m_bg) / ((ca.c / n_tok) * (cb.c / n_tok))), 3) AS pmi
             |FROM cab JOIN cw ca ON cab.w1 = ca.w
             |         JOIN cw cb ON cab.w2 = cb.w CROSS JOIN tot
             |WHERE c_ab >= 5
             |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ---- temperature-scaled domain mixing (XLM-R/mC4 alpha-sampling):
    //      p_d ∝ n_d^0.3 per language, realized as a deterministic
    //      md5-draw keep decision at targetFrac=0.5 of the corpus ----
    Q("t15_domain_mixing",
      (s, dir) =>
        graft.operators.Mixing.temperatureSample(
            Tables(s, dir, "documents"), domainCol = "lang",
            idCol = "doc_id", alpha = 0.3, targetFrac = 0.5)
          .orderBy(col("doc_id")),
      Some("""WITH c AS (SELECT lang, count(*) AS n_d FROM documents GROUP BY lang),
             |t AS (SELECT sum(n_d) AS n_tot, sum(pow(n_d, 0.3)) AS z FROM c),
             |r AS (SELECT lang,
             |    round(least(1.0,
             |      0.5 * n_tot * (pow(n_d, 0.3) / z) / n_d), 6) AS rate
             |  FROM c CROSS JOIN t)
             |SELECT d.doc_id, d.lang, r.rate,
             |  (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
             |     % 1000000) / 1000000.0 < r.rate AS keep
             |FROM documents d JOIN r USING (lang)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- per-domain capping (RefinedWeb-style: at most N docs per
    //      source domain, chosen by a deterministic hash order so
    //      reruns/engines agree). The bounded-heap TopKAgg keeps <= N
    //      rows per domain BEFORE the exchange — a window row_number
    //      would shuffle and sort the whole corpus ----
    Q("t16_domain_cap",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents").select($"doc_id", $"source",
          // deterministic priority draw; negated because TopKAgg keeps
          // highest scores (ties -> lower doc_id, same as the SQL order)
          (-conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("double")).as("negu"))
        d.groupBy($"source")
          .agg(graft.functions.TopKAgg.top_k_by($"negu", $"doc_id", 10).as("tk"))
          .select($"source", posexplode($"tk"))
          .select($"source", $"col.id".as("doc_id"),
            ($"pos" + 1).cast("long").as("rn"))
          .orderBy($"source", $"rn")
      },
      Some("""SELECT source, doc_id, rn FROM (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source ORDER BY
             |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
             |      doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 10 ORDER BY source, rn""".stripMargin)),

    // ---- adaptive per-domain quality gate: drop each language's bottom
    //      quartile by length. Computed as tiny per-domain thresholds
    //      (one agg over |domains| groups) broadcast back onto the
    //      corpus — NOT a percent_rank window, which would shuffle and
    //      sort the full corpus by domain and collapse under domain skew
    //      (one giant 'en' partition at 100 TB) ----
    Q("t17_quality_quantile_gate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val thr = docs.groupBy($"lang")
          .agg(round(percentile($"n_chars", lit(0.25)), 6).as("p25"))
        docs.join(broadcast(thr), Seq("lang"))
          .select($"doc_id", $"lang", $"p25",
            ($"n_chars" >= $"p25").as("keep"))
          .orderBy($"doc_id")
      },
      Some("""WITH thr AS (
             |  SELECT lang, round(quantile_cont(n_chars, 0.25), 6) AS p25
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, lang, p25, n_chars >= p25 AS keep
             |FROM documents JOIN thr USING (lang)
             |ORDER BY doc_id""".stripMargin)),

    // ---- weighted sampling without replacement (priority sampling,
    //      Duffield-Lund-Thorup): per-doc priority w/u with weight
    //      w = n_chars and a deterministic md5 uniform draw u; the n
    //      highest priorities per language are the sample. Longer docs
    //      are proportionally likelier, reruns/engines agree exactly
    //      (integer inputs + one IEEE division — no libm). The bounded
    //      heap keeps <= n rows per language BEFORE the exchange, so the
    //      corpus is never shuffled (t16's cap idiom, weighted) ----
    Q("t18_priority_sample",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents").select($"doc_id", $"lang",
          ($"n_chars".cast("double") /
            (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
              .cast("long") + 1).cast("double")).as("prio"))
        d.groupBy($"lang")
          .agg(graft.functions.TopKAgg.top_k_by($"prio", $"doc_id", 20).as("tk"))
          .select($"lang", posexplode($"tk"))
          .select($"lang", $"col.id".as("doc_id"),
            ($"pos" + 1).cast("long").as("rn"))
          .orderBy($"lang", $"rn")
      },
      Some("""SELECT lang, doc_id, rn FROM (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY
             |      CAST(n_chars AS DOUBLE) /
             |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |             ::BIGINT + 1 AS DOUBLE) DESC,
             |      doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)),

    // ---- sliding-window chunking: overlapping 64-token windows at
    //      stride 48 (RAG / training-sequence prep); map-side explode,
    //      fingerprint carried instead of chunk text ----
    Q("t19_chunking",
      (s, dir) => {
        import s.implicits._
        graft.operators.TextOps
          .chunk(Tables(s, dir, "documents"), "doc_id", "text",
            chunkSize = 64, stride = 48)
          .orderBy($"doc_id", $"chunk_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents
             |), n AS (
             |  SELECT doc_id, toks, len(toks) AS n_tok,
             |    CASE WHEN len(toks) = 0 THEN 0
             |         WHEN len(toks) <= 64 THEN 1
             |         ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT)
             |    END AS n_chunks
             |  FROM t
             |)
             |SELECT doc_id, i AS chunk_id,
             |  i*48 + 1 AS tok_start,
             |  least(CAST(64 AS BIGINT), n_tok - i*48) AS chunk_len,
             |  md5(array_to_string(toks[(i*48+1):(i*48+64)], ' ')) AS fp
             |FROM n, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) g
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- CCNet-style perplexity bucketing: rank documents by the t13
    //      bigram-LM score and cut head/middle/tail terciles. The gate
    //      uses an exact global ntile (deterministic, oracle-matched);
    //      the 100 TB path swaps the global sort for approx-quantile
    //      thresholds exactly as t17 does — the bucket semantics are
    //      identical, only the cut estimation changes ----
    Q("t20_perplexity_buckets",
      (s, dir) => {
        import s.implicits._
        val scored = bigramLmScores(s, dir)
        val w = Window.orderBy($"lm_score".desc, $"doc_id")
        scored.withColumn("nt", ntile(3).over(w))
          .withColumn("bucket",
            when($"nt" === 1, "head").when($"nt" === 2, "middle").otherwise("tail"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(avg($"lm_score"), 4).as("avg_score"),
            round(min($"lm_score"), 4).as("min_score"),
            round(max($"lm_score"), 4).as("max_score"))
          .orderBy($"bucket")
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
             |big AS (SELECT doc_id,
             |    unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
             |  FROM d2),
             |bg2 AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big),
             |cnt AS (SELECT w1, w2, count(*) AS c FROM bg2 GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bg2 GROUP BY w1),
             |v AS (SELECT count(DISTINCT t) AS v
             |      FROM (SELECT unnest(toks) AS t FROM d)),
             |scored AS (
             |  SELECT doc_id, round(avg(log2((c + 1.0) / (c1 + v))), 4) AS lm_score
             |  FROM bg2 JOIN cnt USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
             |  GROUP BY doc_id),
             |b AS (SELECT doc_id, lm_score,
             |    ntile(3) OVER (ORDER BY lm_score DESC, doc_id) AS nt
             |  FROM scored)
             |SELECT CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             |  ELSE 'tail' END AS bucket,
             |  count(*) AS n_docs,
             |  round(avg(lm_score), 4) AS avg_score,
             |  round(min(lm_score), 4) AS min_score,
             |  round(max(lm_score), 4) AS max_score
             |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- DSIR importance resampling (Xie et al. 2023): rank raw docs by
    //      the log importance ratio of target vs raw hashed-bigram
    //      models, select the top slice. Target here = two sources; the
    //      bucket hash is the portable md5 construction so the oracle
    //      replicates it bit-for-bit. One corpus scan (persisted bigram
    //      stream), two 256-row histograms, broadcast log-ratio join ----
    Q("t21_dsir_selection",
      (s, dir) => {
        import s.implicits._
        graft.operators.Mixing.dsirWeights(
            Tables(s, dir, "documents"), "doc_id", "text",
            isTarget = $"source".isin("src0", "src1"), buckets = 256)
          .orderBy($"dsir_w".desc, $"doc_id")
          .limit(100)
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |d2 AS (SELECT doc_id, source, toks FROM d WHERE len(toks) >= 2),
             |bg AS (SELECT doc_id, source IN ('src0','src1') AS is_t,
             |    unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
             |  FROM d2),
             |f AS (SELECT doc_id, is_t,
             |    (('0x' || substr(md5(z[1] || ' ' || z[2]), 1, 8))::BIGINT % 256)
             |      AS bucket
             |  FROM bg),
             |raw AS (SELECT bucket, count(*) AS c_r FROM f GROUP BY bucket),
             |tgt AS (SELECT bucket, count(*) AS c_t FROM f WHERE is_t GROUP BY bucket),
             |tot AS (SELECT (SELECT sum(c_r) FROM raw) AS n_r,
             |               (SELECT sum(c_t) FROM tgt) AS n_t),
             |ratio AS (SELECT r.bucket,
             |    log2((coalesce(t.c_t, 0) + 1.0) / (tot.n_t + 256))
             |      - log2((r.c_r + 1.0) / (tot.n_r + 256)) AS lw
             |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot),
             |s AS (SELECT doc_id, round(sum(lw), 4) AS dsir_w
             |  FROM f JOIN ratio USING (bucket) GROUP BY doc_id)
             |SELECT doc_id, dsir_w FROM s
             |ORDER BY dsir_w DESC, doc_id LIMIT 100""".stripMargin)),

    // ---- BM25 sparse retrieval (Okapi, Lucene idf floor): score the
    //      corpus against a small query term set, top-10. The Spark plan
    //      has ZERO full-width shuffles: per-doc tf_i map-side from the
    //      token array, df/N/avgdl in ONE global map-combinable agg
    //      (single broadcast row), TakeOrderedAndProject for the top-k.
    //      All weight-formula inputs are integer-valued doubles (exact
    //      partial sums), so the oracle matches at round(,4) without any
    //      summation-order caveat ----
    Q("t22_bm25",
      (s, dir) => {
        graft.operators.Retrieval.bm25TopK(
          Tables(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("hash", "join", "vector"), k = 10)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents
             |), u AS (
             |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf_0,
             |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_1,
             |    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf_2
             |  FROM base
             |), st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             |    sum(CASE WHEN tf_0 > 0 THEN 1.0 ELSE 0.0 END) AS df_0,
             |    sum(CASE WHEN tf_1 > 0 THEN 1.0 ELSE 0.0 END) AS df_1,
             |    sum(CASE WHEN tf_2 > 0 THEN 1.0 ELSE 0.0 END) AS df_2
             |  FROM u
             |), sc AS (
             |  SELECT doc_id, round(
             |    (CASE WHEN tf_0 > 0 THEN ln(1.0 + (n - df_0 + 0.5) / (df_0 + 0.5))
             |       * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_1 > 0 THEN ln(1.0 + (n - df_1 + 0.5) / (df_1 + 0.5))
             |       * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_2 > 0 THEN ln(1.0 + (n - df_2 + 0.5) / (df_2 + 0.5))
             |       * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END), 4) AS score
             |  FROM u, st
             |)
             |SELECT doc_id, score FROM sc WHERE score > 0.0
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- BM25 served from the PERSISTED term-bucketed index (t22's
    //      known-query path re-run through the persist-once layout):
    //      postings/df written partitionBy(bucket), the serving scan
    //      prunes to the 3 query terms' buckets and never touches the
    //      documents corpus (ScaleSpec pins both). Index builds once per
    //      corpus identity (same fixture keying as s04's IVF layout);
    //      bench reps measure the pruned probe alone. Scores match t22
    //      bit-for-bit — integer-valued doubles + fixed-order term adds
    //      — so the oracle is t22's verbatim ----
    Q("t23_bm25_index",
      (s, dir) => {
        // content-keyed (footer fingerprint, not mtime): a byte-identical
        // testdata regen reuses the index; changed data re-keys it
        val key = Tables.contentKey(s"$dir/documents.parquet")
        val layout = graft.Scratch.dir(s"graft_bm25_idx_$key")
        graft.operators.Retrieval.bm25IndexWrite(
          Tables(s, dir, "documents"), "doc_id", "text", layout)
        graft.operators.Retrieval.bm25TopKFromIndex(s, layout,
          queryTerms = Seq("hash", "join", "vector"), k = 10)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents
             |), u AS (
             |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf_0,
             |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_1,
             |    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf_2
             |  FROM base
             |), st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             |    sum(CASE WHEN tf_0 > 0 THEN 1.0 ELSE 0.0 END) AS df_0,
             |    sum(CASE WHEN tf_1 > 0 THEN 1.0 ELSE 0.0 END) AS df_1,
             |    sum(CASE WHEN tf_2 > 0 THEN 1.0 ELSE 0.0 END) AS df_2
             |  FROM u
             |), sc AS (
             |  SELECT doc_id, round(
             |    (CASE WHEN tf_0 > 0 THEN ln(1.0 + (n - df_0 + 0.5) / (df_0 + 0.5))
             |       * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_1 > 0 THEN ln(1.0 + (n - df_1 + 0.5) / (df_1 + 0.5))
             |       * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_2 > 0 THEN ln(1.0 + (n - df_2 + 0.5) / (df_2 + 0.5))
             |       * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END), 4) AS score
             |  FROM u, st
             |)
             |SELECT doc_id, score FROM sc WHERE score > 0.0
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- t24: incremental BM25 index maintenance — build the layout on
    //      80% of the corpus, APPEND the rest (one batch pass + touched-
    //      bucket df roll-up; the indexed corpus is never rescanned),
    //      serve. Scores must equal a full-corpus build bit-for-bit
    //      (exact integer-sum stats carry), so the oracle is t22/t23's
    //      full-corpus SQL verbatim. Rebuild-then-append per invocation
    //      (the append MUTATES the layout; the extended ident forces the
    //      rebuild — s08's maintenance-cycle-per-invocation shape) ----
    Q("t24_bm25_index_append",
      (s, dir) => {
        import s.implicits._
        val key = java.lang.Long.toHexString(
          java.util.Arrays.hashCode(dir.getBytes("UTF-8")).toLong & 0xFFFFFFFFL)
        val layout = graft.Scratch.dir(s"graft_bm25_app_$key")
        val docs = Tables(s, dir, "documents")
        graft.operators.Retrieval.bm25IndexWrite(
          docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", layout)
        graft.operators.Retrieval.bm25IndexAppend(
          docs.filter($"doc_id" % 5 === 0), "doc_id", "text", layout)
        graft.operators.Retrieval.bm25TopKFromIndex(s, layout,
          queryTerms = Seq("hash", "join", "vector"), k = 10)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents
             |), u AS (
             |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf_0,
             |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_1,
             |    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf_2
             |  FROM base
             |), st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             |    sum(CASE WHEN tf_0 > 0 THEN 1.0 ELSE 0.0 END) AS df_0,
             |    sum(CASE WHEN tf_1 > 0 THEN 1.0 ELSE 0.0 END) AS df_1,
             |    sum(CASE WHEN tf_2 > 0 THEN 1.0 ELSE 0.0 END) AS df_2
             |  FROM u
             |), sc AS (
             |  SELECT doc_id, round(
             |    (CASE WHEN tf_0 > 0 THEN ln(1.0 + (n - df_0 + 0.5) / (df_0 + 0.5))
             |       * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_1 > 0 THEN ln(1.0 + (n - df_1 + 0.5) / (df_1 + 0.5))
             |       * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END)
             |    + (CASE WHEN tf_2 > 0 THEN ln(1.0 + (n - df_2 + 0.5) / (df_2 + 0.5))
             |       * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |     ELSE 0.0 END), 4) AS score
             |  FROM u, st
             |)
             |SELECT doc_id, score FROM sc WHERE score > 0.0
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- GPT-style sequence packing: docs concatenated in doc_id order
    //      (1 separator slot between docs) and cut into 128-token
    //      training sequences; docs SPAN boundaries (zero padding waste).
    //      Oracle replays the exclusive prefix sum + boundary slicing;
    //      both sides integer-exact, so every piece row must agree ----
    Q("t26_pack_sequences",
      (s, dir) =>
        graft.operators.TextOps.packSequences(
            Tables(s, dir, "documents"), "doc_id", "text",
            budget = 128, sepTokens = 1)
          .orderBy(col("seq_id"), col("doc_id")),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             |         AS BIGINT) AS n
             |  FROM documents
             |), nz AS (SELECT doc_id, n FROM d WHERE n > 0),
             |o AS (
             |  SELECT doc_id, n,
             |    CAST(COALESCE(SUM(n + 1) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |         AS BIGINT) AS off
             |  FROM nz
             |), w AS (
             |  SELECT doc_id, n, off,
             |    unnest(range(off // 128, (off + n - 1) // 128 + 1)) AS seq_id
             |  FROM o
             |)
             |SELECT seq_id, doc_id,
             |  greatest(off, seq_id * 128) - off + 1 AS doc_tok_start,
             |  least(off + n, (seq_id + 1) * 128)
             |    - greatest(off, seq_id * 128) AS piece_len,
             |  greatest(off, seq_id * 128) - seq_id * 128 AS seq_offset
             |FROM w ORDER BY seq_id, doc_id""".stripMargin)),

    // ---- length-bucketed batching: docs sorted by token count DESC
    //      (ties by doc_id) into batches of 8; per-batch padded width +
    //      padding-waste fraction. The interesting check is pad_frac —
    //      a wrong global order or batch split shifts widths ----
    Q("t27_length_batches",
      (s, dir) =>
        graft.operators.TextOps.lengthBatches(
            Tables(s, dir, "documents"), "doc_id", "text", batchSize = 8)
          .orderBy(col("batch_id")),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             |         AS BIGINT) AS n
             |  FROM documents
             |), r AS (
             |  SELECT doc_id, n,
             |    row_number() OVER (ORDER BY n DESC, doc_id) AS rn FROM d
             |), b AS (SELECT (rn - 1) // 8 AS batch_id, n FROM r)
             |SELECT batch_id, count(*) AS n_docs, max(n) AS width,
             |  CAST(sum(n) AS BIGINT) AS n_tok,
             |  CASE WHEN max(n) = 0 THEN 0.0
             |       ELSE round(1.0 - CAST(sum(n) AS DOUBLE)
             |                    / (max(n) * count(*)), 4) END AS pad_frac
             |FROM b GROUP BY batch_id ORDER BY batch_id""".stripMargin)),

    // ---- exact phrase query from a persisted positional index: build
    //      the position-array postings (bucket-partitioned by term hash,
    //      same layout contract as t23), then serve "table hash" by
    //      reading the two terms' buckets and intersecting shifted
    //      position arrays. Oracle recomputes occurrences directly from
    //      the text — index route and direct scan must agree on every
    //      doc's count ----
    Q("t29_phrase_index",
      (s, dir) => {
        val key = Tables.contentKey(s"$dir/documents.parquet")
        val layout = graft.Scratch.dir(s"graft_pos_idx_$key")
        graft.operators.Retrieval.positionalIndexWrite(
          Tables(s, dir, "documents"), "doc_id", "text", layout)
        graft.operators.Retrieval.phraseMatchesFromIndex(s, layout,
            phrase = Seq("table", "hash"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents)
             |SELECT doc_id, n_occ FROM (
             |  SELECT doc_id, CAST(len(list_filter(range(1, len(toks)),
             |      i -> toks[i] = 'table' AND toks[i+1] = 'hash'))
             |    AS BIGINT) AS n_occ
             |  FROM d)
             |WHERE n_occ > 0 ORDER BY doc_id""".stripMargin)),

    // ---- distributed BPE merge training (Sennrich 2016): 4 merges at
    //      minCount=2 over the word-frequency histogram; greedy
    //      left-to-right merge application. The oracle unrolls the 4
    //      iterations as CTEs, applying each merge on a marker-wrapped
    //      symbol string (chr(1)sym chr(2) per symbol) so string replace
    //      reproduces the fold's non-overlapping left-to-right semantics
    //      exactly ([a,a,a] -> [aa,a]); argmax ties break (n DESC, l, r)
    //      in both engines ----
    Q("t28_bpe_train",
      (s, dir) =>
        graft.operators.TextOps.bpeTrain(
            Tables(s, dir, "documents"), "text", nMerges = 4, minCount = 2L)
          .orderBy(col("merge_rank")),
      Some("""WITH w AS (
             |  SELECT tok AS word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
             |    FROM documents)
             |  GROUP BY tok),
             |s0 AS (SELECT word, cnt,
             |  list_transform(range(1, length(word)+1), i -> word[i]) AS syms FROM w),
             |p1 AS (
             |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
             |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
             |    FROM s0 WHERE len(syms) >= 2)
             |  GROUP BY l, r),
             |b1 AS (SELECT l, r, n FROM p1 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
             |s1 AS (
             |  SELECT word, cnt,
             |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
             |  FROM (
             |    SELECT word, cnt,
             |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
             |        chr(1) || (SELECT l FROM b1) || chr(2) || chr(1) || (SELECT r FROM b1) || chr(2),
             |        chr(1) || (SELECT l FROM b1) || (SELECT r FROM b1) || chr(2)) AS rep
             |    FROM s0)),
             |p2 AS (
             |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
             |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
             |    FROM s1 WHERE len(syms) >= 2)
             |  GROUP BY l, r),
             |b2 AS (SELECT l, r, n FROM p2 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
             |s2 AS (
             |  SELECT word, cnt,
             |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
             |  FROM (
             |    SELECT word, cnt,
             |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
             |        chr(1) || (SELECT l FROM b2) || chr(2) || chr(1) || (SELECT r FROM b2) || chr(2),
             |        chr(1) || (SELECT l FROM b2) || (SELECT r FROM b2) || chr(2)) AS rep
             |    FROM s1)),
             |p3 AS (
             |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
             |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
             |    FROM s2 WHERE len(syms) >= 2)
             |  GROUP BY l, r),
             |b3 AS (SELECT l, r, n FROM p3 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1),
             |s3 AS (
             |  SELECT word, cnt,
             |    string_split(substr(rep, 2, length(rep) - 2), chr(2)||chr(1)) AS syms
             |  FROM (
             |    SELECT word, cnt,
             |      replace(chr(1) || array_to_string(syms, chr(2)||chr(1)) || chr(2),
             |        chr(1) || (SELECT l FROM b3) || chr(2) || chr(1) || (SELECT r FROM b3) || chr(2),
             |        chr(1) || (SELECT l FROM b3) || (SELECT r FROM b3) || chr(2)) AS rep
             |    FROM s2)),
             |p4 AS (
             |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n FROM (
             |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
             |    FROM s3 WHERE len(syms) >= 2)
             |  GROUP BY l, r),
             |b4 AS (SELECT l, r, n FROM p4 WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1)
             |SELECT * FROM (SELECT 1 AS merge_rank, l AS left_sym, r AS right_sym, n FROM b1
             |  UNION ALL SELECT 2 AS merge_rank, l AS left_sym, r AS right_sym, n FROM b2
             |  UNION ALL SELECT 3 AS merge_rank, l AS left_sym, r AS right_sym, n FROM b3
             |  UNION ALL SELECT 4 AS merge_rank, l AS left_sym, r AS right_sym, n FROM b4)
             |ORDER BY merge_rank""".stripMargin)),

    // ---- BPE tokenizer application (the train->apply pair): segment
    //      the corpus with t28's 4 learned merges and report the top-20
    //      subword symbols by occurrence-weighted count. Oracle = t28's
    //      unrolled CTE chain through s4 + the symbol rollup — training
    //      and application must produce the SAME segmentation ----
    Q("t30_bpe_segment",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val learned = graft.operators.TextOps
          .bpeTrain(docs, "text", nMerges = 4, minCount = 2L)
          .orderBy(col("merge_rank")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        // explode_outer + null filter: see t40 — a plain explode's
        // inferred size() filter sinks the merge chain to token grain
        graft.operators.TextOps.bpeSegment(docs, "text", learned)
          .select(explode_outer(col("syms")).as("sym"), col("cnt"))
          .filter(col("sym").isNotNull)
          .groupBy(col("sym")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("sym")).limit(20)
      },
      Some(BpeApplySql)),

    // ---- Winnowing document fingerprints (Schleimer et al. SIGMOD'03,
    //      the MOSS algorithm): k=8 char-gram hashes, window w=4, keep
    //      each window's min hash — any shared substring of >= w+k-1=11
    //      chars between two docs shares a fingerprint. Per-doc profile
    //      gate (fingerprint count + set bounds); TextOps.winnow is pure
    //      per-row array algebra (zero shuffle, whole-stage codegen), the
    //      oracle replays gram hashing + the window min in SQL. Gram hash
    //      = first 8 hex chars of md5, identical in both engines ----
    Q("t31_winnowing",
      (s, dir) => {
        import s.implicits._
        graft.operators.TextOps.winnow(
            Tables(s, dir, "documents"), "doc_id", "text", k = 8, w = 4)
          .select($"doc_id", size($"fps").cast("long").as("n_fp"),
            array_min($"fps").as("min_fp"), array_max($"fps").as("max_fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, i,
             |    substr(md5(substr(t, CAST(i AS INT), 8)), 1, 8) AS h
             |  FROM d, unnest(generate_series(1, length(t) - 7)) AS u(i)
             |), m AS (
             |  SELECT doc_id, i, min(h) OVER (
             |    PARTITION BY doc_id ORDER BY i
             |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mh
             |  FROM g
             |), sel AS (SELECT DISTINCT doc_id, mh FROM m WHERE i >= 4),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
             |    min(mh) AS min_fp, max(mh) AS max_fp
             |  FROM sel GROUP BY doc_id)
             |SELECT doc.doc_id, coalesce(a.n_fp, 0) AS n_fp,
             |  a.min_fp, a.max_fp
             |FROM documents doc LEFT JOIN agg a ON doc.doc_id = a.doc_id
             |ORDER BY doc.doc_id""".stripMargin)),

    // ---- Unigram-LM tokenizer training (Kudo 2018 / SentencePiece):
    //      Viterbi-EM over the word histogram, 2 EM rounds, piece length
    //      <= 3, top-40 vocabulary. The oracle unrolls both EM rounds:
    //      the same seed counts, the same per-word score map, and the
    //      same left-to-right DP (list_reduce with a growing dp list,
    //      argmax by the lexicographic (score, last-piece-len) struct —
    //      DuckDB's list_aggregate 'max' and Spark's array_max order
    //      structs identically). Scores are quantized round(ln, 6) so
    //      the lone libm-dependent step can never diverge by an ulp;
    //      counts are integer-exact in both engines ----
    Q("t32_unigram_train",
      (s, dir) =>
        graft.operators.TextOps.unigramTrain(
          Tables(s, dir, "documents"), "text",
          maxPieceLen = 3, emIters = 2, topK = 40),
      Some("""WITH w AS (
             |  SELECT tok AS word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
             |    FROM documents)
             |  GROUP BY tok),
             |sp AS (
             |  SELECT word, cnt, st, ln, substr(word, st, ln) AS piece, (st-1)*3 + ln AS k
             |  FROM (SELECT word, cnt, unnest(range(1, length(word)+1)) AS st FROM w) t,
             |       (SELECT unnest([1,2,3]) AS ln) l
             |  WHERE st + ln - 1 <= length(word)),
             |v0 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n FROM sp GROUP BY piece),
             |v0s AS (SELECT piece, n,
             |        round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM v0)), 6) AS lp
             |        FROM v0),
             |pm1 AS (
             |  SELECT sp.word, any_value(sp.cnt) AS cnt,
             |         map(list(sp.k ORDER BY sp.k), list(v.lp ORDER BY sp.k)) AS pm
             |  FROM sp JOIN v0s v USING (piece) GROUP BY sp.word),
             |seg1 AS (
             |  SELECT cnt,
             |    list_reduce(
             |      [[{'s': 0.0, 'ps': CAST([] AS VARCHAR[])}]] ||
             |        list_transform(range(1, length(word)+1), ii -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
             |      (acc, x) -> acc || [{
             |        's': (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).s,
             |        'ps': acc[len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1].ps ||
             |              [substr(word, len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1, (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k)]
             |      }]
             |    )[length(word)+1].ps AS ps
             |  FROM pm1),
             |c1 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
             |       FROM (SELECT cnt, unnest(ps) AS piece FROM seg1) GROUP BY piece),
             |v1s AS (SELECT piece, n,
             |        round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM c1)), 6) AS lp
             |        FROM c1),
             |pm2 AS (
             |  SELECT sp.word, any_value(sp.cnt) AS cnt,
             |         map(list(sp.k ORDER BY sp.k), list(v.lp ORDER BY sp.k)) AS pm
             |  FROM sp JOIN v1s v USING (piece) GROUP BY sp.word),
             |seg2 AS (
             |  SELECT cnt,
             |    list_reduce(
             |      [[{'s': 0.0, 'ps': CAST([] AS VARCHAR[])}]] ||
             |        list_transform(range(1, length(word)+1), ii -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
             |      (acc, x) -> acc || [{
             |        's': (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).s,
             |        'ps': acc[len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1].ps ||
             |              [substr(word, len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1, (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k)]
             |      }]
             |    )[length(word)+1].ps AS ps
             |  FROM pm2),
             |c2 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
             |       FROM (SELECT cnt, unnest(ps) AS piece FROM seg2) GROUP BY piece)
             |SELECT piece, n,
             |  round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM c2)), 4) AS logp
             |FROM c2 ORDER BY n DESC, piece LIMIT 40""".stripMargin)),

    // ---- Unigram tokenizer application (the train->apply pair, the
    //      t28/t30 shape for the unigram model): segment the corpus
    //      with t32's trained top-40 vocabulary and report the top-20
    //      subword pieces by occurrence-weighted count. Out-of-vocab
    //      pieces cost the -20 floor, so the restriction to the top-40
    //      exercises the fallback path. Oracle = t32's unrolled EM chain
    //      plus one more Viterbi pass under the emitted (round-4) scores ----
    Q("t33_unigram_segment",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val vocab = graft.operators.TextOps.unigramTrain(
          docs, "text", maxPieceLen = 3, emIters = 2, topK = 40)
        graft.operators.TextOps.unigramSegment(docs, "text", vocab)
          .select(explode(col("ps")).as("piece"), col("cnt"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("piece")).limit(20)
      },
      Some("""WITH w AS (
             |  SELECT tok AS word, count(*) AS cnt FROM (
             |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
             |    FROM documents)
             |  GROUP BY tok),
             |sp AS (
             |  SELECT word, cnt, st, ln, substr(word, st, ln) AS piece, (st-1)*3 + ln AS k
             |  FROM (SELECT word, cnt, unnest(range(1, length(word)+1)) AS st FROM w) t,
             |       (SELECT unnest([1,2,3]) AS ln) l
             |  WHERE st + ln - 1 <= length(word)),
             |v0 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n FROM sp GROUP BY piece),
             |v0s AS (SELECT piece, n,
             |        round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM v0)), 6) AS lp
             |        FROM v0),
             |pm1 AS (
             |  SELECT sp.word, any_value(sp.cnt) AS cnt,
             |         map(list(sp.k ORDER BY sp.k), list(v.lp ORDER BY sp.k)) AS pm
             |  FROM sp JOIN v0s v USING (piece) GROUP BY sp.word),
             |seg1 AS (
             |  SELECT cnt,
             |    list_reduce(
             |      [[{'s': 0.0, 'ps': CAST([] AS VARCHAR[])}]] ||
             |        list_transform(range(1, length(word)+1), ii -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
             |      (acc, x) -> acc || [{
             |        's': (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).s,
             |        'ps': acc[len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1].ps ||
             |              [substr(word, len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1, (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k)]
             |      }]
             |    )[length(word)+1].ps AS ps
             |  FROM pm1),
             |c1 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
             |       FROM (SELECT cnt, unnest(ps) AS piece FROM seg1) GROUP BY piece),
             |v1s AS (SELECT piece, n,
             |        round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM c1)), 6) AS lp
             |        FROM c1),
             |pm2 AS (
             |  SELECT sp.word, any_value(sp.cnt) AS cnt,
             |         map(list(sp.k ORDER BY sp.k), list(v.lp ORDER BY sp.k)) AS pm
             |  FROM sp JOIN v1s v USING (piece) GROUP BY sp.word),
             |seg2 AS (
             |  SELECT cnt,
             |    list_reduce(
             |      [[{'s': 0.0, 'ps': CAST([] AS VARCHAR[])}]] ||
             |        list_transform(range(1, length(word)+1), ii -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
             |      (acc, x) -> acc || [{
             |        's': (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).s,
             |        'ps': acc[len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1].ps ||
             |              [substr(word, len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1, (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k)]
             |      }]
             |    )[length(word)+1].ps AS ps
             |  FROM pm2),
             |c2 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
             |       FROM (SELECT cnt, unnest(ps) AS piece FROM seg2) GROUP BY piece),
             |v2o AS (SELECT piece,
             |        round(ln(CAST(n AS DOUBLE)/(SELECT CAST(sum(n) AS DOUBLE) FROM c2)), 4) AS lp
             |        FROM c2 ORDER BY n DESC, piece LIMIT 40),
             |pm3 AS (
             |  SELECT sp.word, any_value(sp.cnt) AS cnt,
             |         map(list(sp.k ORDER BY sp.k), list(v.lp ORDER BY sp.k)) AS pm
             |  FROM sp JOIN v2o v USING (piece) GROUP BY sp.word),
             |seg3 AS (
             |  SELECT cnt,
             |    list_reduce(
             |      [[{'s': 0.0, 'ps': CAST([] AS VARCHAR[])}]] ||
             |        list_transform(range(1, length(word)+1), ii -> CAST([] AS STRUCT(s DOUBLE, ps VARCHAR[])[])),
             |      (acc, x) -> acc || [{
             |        's': (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).s,
             |        'ps': acc[len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1].ps ||
             |              [substr(word, len(acc) - (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k + 1, (list_aggregate(list_transform(range(1, least(3, len(acc))+1), k -> {'s': acc[len(acc)-k+1].s + coalesce(map_extract(pm, (len(acc)-k)*3 + k)[1], -20.0), 'k': k}), 'max')).k)]
             |      }]
             |    )[length(word)+1].ps AS ps
             |  FROM pm3)
             |SELECT piece, CAST(sum(cnt) AS BIGINT) AS n
             |FROM (SELECT cnt, unnest(ps) AS piece FROM seg3) GROUP BY piece
             |ORDER BY n DESC, piece LIMIT 20""".stripMargin)),

    // ---- RM3 pseudo-relevance feedback (Lavrenko & Croft; the
    //      Anserini/Indri default): BM25 top-10 -> quantized feedback
    //      term model over those docs -> top-8 expansion terms
    //      interpolated at alpha=0.5 -> weighted rescore. The two
    //      float-derived RANKINGS (doc weights, term contributions) are
    //      integer-quantized before ordering, so expansion selection is
    //      an exact integer sort in both engines; final scores round-4.
    //      Oracle replays the whole chain: t22's BM25 CTE, the same
    //      quantized feedback model, the same interpolation, and a
    //      relational weighted rescore ----
    Q("t34_rm3_expansion",
      (s, dir) =>
        graft.operators.Retrieval.rm3TopK(
          Tables(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("hash", "join", "vector"),
          fbDocs = 10, fbTerms = 8, alpha = 0.5, k = 10),
      Some("""WITH base AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |u AS (
             |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf_0,
             |    CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf_1,
             |    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf_2
             |  FROM base),
             |st AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
             |    sum(CASE WHEN tf_0 > 0 THEN 1.0 ELSE 0.0 END) AS df_0,
             |    sum(CASE WHEN tf_1 > 0 THEN 1.0 ELSE 0.0 END) AS df_1,
             |    sum(CASE WHEN tf_2 > 0 THEN 1.0 ELSE 0.0 END) AS df_2
             |  FROM u),
             |sc AS (
             |  SELECT doc_id, round(
             |    (CASE WHEN tf_0 > 0 THEN ln(1.0 + (n - df_0 + 0.5) / (df_0 + 0.5))
             |       * (tf_0 * 2.2) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ELSE 0.0 END)
             |    + (CASE WHEN tf_1 > 0 THEN ln(1.0 + (n - df_1 + 0.5) / (df_1 + 0.5))
             |       * (tf_1 * 2.2) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ELSE 0.0 END)
             |    + (CASE WHEN tf_2 > 0 THEN ln(1.0 + (n - df_2 + 0.5) / (df_2 + 0.5))
             |       * (tf_2 * 2.2) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) ELSE 0.0 END), 4) AS score
             |  FROM u, st),
             |top AS (SELECT doc_id, score FROM sc WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT 10),
             |tot AS (SELECT sum(score) AS t FROM top),
             |dw AS (SELECT doc_id, CAST(round(score / t * 1000000.0) AS BIGINT) AS wq FROM top, tot),
             |ftf AS (
             |  SELECT b.doc_id, tok AS term, CAST(count(*) AS DOUBLE) AS tf,
             |    any_value(CAST(len(b.toks) AS DOUBLE)) AS dl
             |  FROM base b JOIN dw USING (doc_id), unnest(b.toks) AS t1(tok)
             |  GROUP BY b.doc_id, tok),
             |rm AS (
             |  SELECT term, CAST(sum(CAST(round(tf / dl * wq * 1000.0) AS BIGINT)) AS BIGINT) AS w
             |  FROM ftf JOIN dw USING (doc_id) GROUP BY term),
             |rt AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM rm),
             |et AS (SELECT term, w FROM rm ORDER BY w DESC, term LIMIT 8),
             |terms AS (
             |  SELECT term FROM (VALUES ('hash'), ('join'), ('vector')) v(term)
             |  UNION
             |  SELECT term FROM et),
             |fw AS (
             |  SELECT t.term, CAST(round(
             |      (CASE WHEN t.term IN ('hash', 'join', 'vector')
             |        THEN 0.5 * 1000000.0 / 3 ELSE 0.0 END)
             |      + 0.5 * 1000000.0 * CAST(coalesce(rm.w, 0) AS DOUBLE) / wt
             |    ) AS BIGINT) AS fwq
             |  FROM terms t LEFT JOIN rm USING (term), rt),
             |x AS (
             |  SELECT b.doc_id, tok AS term, CAST(count(*) AS DOUBLE) AS tf,
             |    any_value(CAST(len(b.toks) AS DOUBLE)) AS dl
             |  FROM base b, unnest(b.toks) AS t2(tok)
             |  WHERE tok IN (SELECT term FROM terms)
             |  GROUP BY b.doc_id, tok),
             |df2 AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM x GROUP BY term),
             |sc2 AS (
             |  SELECT x.doc_id, round(sum(
             |      (CAST(fwq AS DOUBLE) / 1000000.0)
             |      * ln(1.0 + (n - df + 0.5) / (df + 0.5))
             |      * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * x.dl / avgdl))), 4) AS score
             |  FROM x JOIN df2 USING (term) JOIN fw USING (term), st
             |  GROUP BY x.doc_id)
             |SELECT doc_id, score FROM sc2 WHERE score > 0.0
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- Rule-based PII scrubbing (the CCNet/Dolma-style compliance
    //      pass): emails, IPv4s, SSN-shaped ids redacted in a fixed
    //      order, per-class counts taken on the exact text state each
    //      pattern scrubs. The corpus is synthetic (no real PII), so the
    //      gate INJECTS deterministic PII keyed off doc_id (email for
    //      %2, IP for %3, SSN for %5 — all eight count combinations
    //      occur); md5 + length of the scrubbed text pin the full
    //      string transformation, not just the counts. Patterns stay in
    //      the Java∩RE2 regex subset so both engines match identically ----
    Q("t35_pii_scrub",
      (s, dir) => {
        import s.implicits._
        val aug = Tables(s, dir, "documents").select($"doc_id",
          concat($"text",
            when($"doc_id" % 2 === 0, concat(lit(" contact user"), $"doc_id",
              lit("@mail"), $"doc_id" % 7, lit(".com"))).otherwise(lit("")),
            when($"doc_id" % 3 === 0, concat(lit(" from 10."), $"doc_id" % 256,
              lit(".0."), ($"doc_id" * 3) % 256)).otherwise(lit("")),
            when($"doc_id" % 5 === 0, concat(lit(" ssn "),
              lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
              lpad(($"doc_id" % 100).cast("string"), 2, "0"), lit("-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))).as("text"))
        graft.operators.TextOps.piiScrub(aug, "text")
          .select($"doc_id", $"n_emails", $"n_ips", $"n_ids",
            length($"scrubbed").cast("long").as("scrub_len"),
            md5($"scrubbed").as("scrub_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text
             |    || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
             |         || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END
             |    || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
             |         || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
             |         || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
             |         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
             |  FROM documents),
             |s1 AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g') AS t1
             |  FROM aug),
             |s2 AS (
             |  SELECT doc_id, n_emails,
             |    CAST(len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
             |    regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g') AS t2
             |  FROM s1),
             |s3 AS (
             |  SELECT doc_id, n_emails, n_ips,
             |    CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ids,
             |    regexp_replace(t2, '\b\d{3}-\d{2}-\d{4}\b', '[PII]', 'g') AS scrubbed
             |  FROM s2)
             |SELECT doc_id, n_emails, n_ips, n_ids,
             |  CAST(length(scrubbed) AS BIGINT) AS scrub_len, md5(scrubbed) AS scrub_md5
             |FROM s3 ORDER BY doc_id""".stripMargin)),

    // ---- Unicode NFC normalization (t36): the canonical-composition
    //      pass multilingual cleaning runs before tokenization/dedup
    //      (decomposed accents hash differently and split duplicate
    //      groups). graft.functions.StringSim.NfcNormalize is a
    //      codegen'd custom Expression (Spark has no builtin); the gate
    //      injects decomposed combining sequences keyed by doc_id and
    //      pins codepoint lengths before/after plus the md5 of the
    //      normalized bytes against DuckDB's nfc_normalize ----
    Q("t36_unicode_nfc",
      (s, dir) => {
        import s.implicits._
        val aug = Tables(s, dir, "documents").select($"doc_id", concat($"text",
          when($"doc_id" % 2 === 0, lit(" cafe\u0301")).otherwise(lit("")),
          when($"doc_id" % 3 === 0, lit(" Zu\u0308rich")).otherwise(lit("")))
          .as("text"))
        aug.select($"doc_id",
          length($"text").cast("long").as("len_raw"),
          length(graft.functions.StringSim.nfc_normalize($"text"))
            .cast("long").as("len_nfc"),
          md5(graft.functions.StringSim.nfc_normalize($"text")).as("nfc_md5"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(length(t) AS BIGINT) AS len_raw,
             |  CAST(length(nfc_normalize(t)) AS BIGINT) AS len_nfc,
             |  md5(nfc_normalize(t)) AS nfc_md5
             |FROM (SELECT doc_id, text
             |  || CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769) ELSE '' END
             |  || CASE WHEN doc_id % 3 = 0 THEN ' Zu' || chr(776) || 'rich' ELSE '' END AS t
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- Zipf fit (t37): least-squares slope/intercept of ln(count) vs
    //      ln(rank) over the top-100 terms — the corpus-health scalar
    //      (natural text ~ slope -1; boilerplate bends away). Ranks are
    //      (count desc, term)-total; ln values quantize to 1e-6-grid
    //      INTEGERS before the moment sums (integer arithmetic —
    //      summation-order-exact in both engines), the closed-form slope
    //      cancels the scale factors and divides identically. ----
    Q("t37_zipf_fit",
      (s, dir) =>
        graft.operators.TextOps.zipfFit(
          Tables(s, dir, "documents"), "text", topRanks = 100),
      Some("""WITH tc AS (
             |  SELECT tok AS term, CAST(count(*) AS BIGINT) AS n
             |  FROM documents,
             |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(tok)
             |  GROUP BY tok),
             |top AS (SELECT term, n FROM tc ORDER BY n DESC, term LIMIT 100),
             |rk AS (
             |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
             |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS yq
             |  FROM top),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |  CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
             |  CAST(sum(xq*yq) AS BIGINT) AS sxy,
             |  CAST(sum(xq*xq) AS BIGINT) AS sxx FROM rk)
             |SELECT k AS n_ranks,
             |  round((CAST(k AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
             |    / (CAST(k AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4) AS slope,
             |  round((CAST(sy AS DOUBLE)/1e6
             |    - (CAST(k AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
             |      / (CAST(k AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
             |      * (CAST(sx AS DOUBLE)/1e6)) / CAST(k AS DOUBLE), 4) AS intercept
             |FROM m""".stripMargin)),

    // ---- Exact-k stratified sample (t38): every language keeps its 20
    //      lowest-md5-hash documents (ties by id) — the balanced-eval
    //      primitive rate-based sampling (t15) cannot provide (binomial
    //      spread vs exact counts). The hash is the portable md5
    //      construction, bit-reproducible in both engines. ----
    Q("t38_stratified_sample",
      (s, dir) => {
        import s.implicits._
        graft.operators.Mixing.stratifiedSample(
            Tables(s, dir, "documents").select($"doc_id", $"lang"),
            "lang", "doc_id", k = 20)
          .orderBy($"lang", $"doc_id")
      },
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000,
             |      doc_id) AS rk
             |  FROM documents) WHERE rk <= 20
             |ORDER BY lang, doc_id""".stripMargin)),

    // ---- URL canonicalization (t39): the crawl-dedup key prep — per
    //      doc, a clean variant and a messy alias (uppercase scheme/www
    //      host, utm_* params, reordered query, fragment) are SYNTHESIZED
    //      (the t36 injection pattern) and normalized; both must
    //      collapse to ONE canonical URL per doc (n_norm = 1 is asserted
    //      by the gate data itself). Pure codegen'd regex/array algebra,
    //      Java∩RE2 patterns, replayed verbatim by the oracle. ----
    Q("t39_url_normalize",
      (s, dir) => {
        import s.implicits._
        val u1 = concat(lit("https://"), $"source",
          lit(".example.com/Path/"), $"doc_id", lit("?b=2&a=1"))
        val u2 = concat(lit("HTTPS://WWW."), upper($"source"),
          lit(".EXAMPLE.COM/Path/"), $"doc_id",
          lit("?utm_source=x&a=1&utm_campaign=y&b=2#frag"))
        Tables(s, dir, "documents").select($"doc_id", $"source")
          .select($"doc_id", explode(array(u1, u2)).as("url"))
          .select($"doc_id",
            graft.operators.TextOps.urlNormalize($"url").as("nurl"))
          .groupBy($"doc_id")
          .agg(min($"nurl").as("url_norm"),
            countDistinct($"nurl").as("n_norm"),
            count(lit(1)).as("n_variants"))
          .orderBy($"doc_id")
      },
      Some("""WITH v AS (
             |  SELECT doc_id, unnest([
             |    'https://' || source || '.example.com/Path/' || doc_id || '?b=2&a=1',
             |    'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM/Path/' || doc_id
             |      || '?utm_source=x&a=1&utm_campaign=y&b=2#frag']) AS url
             |  FROM documents),
             |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM v),
             |s2 AS (SELECT doc_id,
             |  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |  regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM s1),
             |s3 AS (SELECT doc_id, scheme,
             |  regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\.', '') AS host,
             |  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s2),
             |s4 AS (SELECT doc_id, scheme, host,
             |  regexp_extract(pathq, '^([^?]*)', 1) AS path,
             |  regexp_extract(pathq, '\?(.*)$', 1) AS query FROM s3),
             |s5 AS (SELECT doc_id,
             |  scheme || '://' || host
             |    || CASE WHEN path = '' THEN '/' ELSE path END
             |    || CASE WHEN q = '' THEN '' ELSE '?' || q END AS nurl
             |  FROM (SELECT doc_id, scheme, host, path,
             |    array_to_string(list_sort(list_filter(string_split(query, '&'),
             |      p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q
             |  FROM s4))
             |SELECT doc_id, min(nurl) AS url_norm,
             |  CAST(count(DISTINCT nurl) AS BIGINT) AS n_norm,
             |  CAST(count(*) AS BIGINT) AS n_variants
             |FROM s5 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- BPE apply from a STORED layout (t40, the t30 serving shape):
    //      bpeTrainLayout persists the merge table once (content-keyed
    //      ident, the t23/s04 build-if-absent pattern), the gate then
    //      times APPLY-ONLY — the histogram-grain fold over the stored
    //      merges. Output (and oracle) identical to t30: the stored
    //      merges must reproduce training's segmentation exactly. ----
    Q("t40_bpe_apply",
      (s, dir) => {
        val key = Tables.contentKey(s"$dir/documents.parquet")
        val layout = graft.Scratch.dir(s"graft_bpe_$key")
        val docs = Tables(s, dir, "documents")
        graft.operators.TextOps.bpeTrainLayout(
          docs, "text", nMerges = 4, minCount = 2L, layout)
        // explode_outer + null filter, NOT explode: a plain explode lets
        // InferFiltersFromGenerate derive `size(syms) > 0` and push the
        // whole merge chain BELOW the word histogram — re-evaluating it
        // per token OCCURRENCE (~10x the distinct-word work; t40
        // measured 1.4s -> 0.9s idle). The null filter sits on the generate
        // output and cannot sink
        graft.operators.TextOps.bpeSegmentFromLayout(docs, "text", layout)
          .select(explode_outer(col("syms")).as("sym"), col("cnt"))
          .filter(col("sym").isNotNull)
          .groupBy(col("sym")).agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("sym")).limit(20)
      },
      Some(BpeApplySql)),

    // ---- corpus-grain BPE encoding (t41, the tokenize-for-training
    //      endpoint): each document's ordered subword stream under the
    //      STORED merge table, reported as (n_pieces, md5 of the
    //      space-joined stream) so the gate pins exact piece ORDER per
    //      document without corpus-width result rows. Oracle = the t28
    //      chain through s4 as a word→syms map, flattened over each
    //      doc's token list in position order. ----
    Q("t41_bpe_encode",
      (s, dir) => {
        val key = Tables.contentKey(s"$dir/documents.parquet")
        val layout = graft.Scratch.dir(s"graft_bpe_$key")
        val docs = Tables(s, dir, "documents")
        graft.operators.TextOps.bpeTrainLayout(
          docs, "text", nMerges = 4, minCount = 2L, layout)
        graft.operators.TextOps.bpeEncodeFromLayout(docs, "doc_id", "text", layout)
          .select(col("id").as("doc_id"),
            size(col("pieces")).cast("long").as("n_pieces"),
            md5(concat_ws(" ", col("pieces"))).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $BpeChainSql,
             |d AS (SELECT doc_id,
             |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |mm AS (SELECT map(list(word), list(syms)) AS m FROM s4),
             |enc AS (SELECT doc_id,
             |  flatten(list_transform(toks, t -> map_extract(mm.m, t)[1])) AS pieces
             |  FROM d, mm)
             |SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_pieces,
             |  md5(array_to_string(pieces, ' ')) AS fp
             |FROM enc ORDER BY doc_id""".stripMargin))
  )

  /** Per-document add-one-smoothed bigram-LM score (t13's model; see the
    * t13 entry for the corpus-model construction). Shared by t13 and the
    * t20 bucketing gate.
    *
    * CACHING CONTRACT: this persists two intermediates (the token
    * projection and the bigram count table) and returns a LAZY result
    * that reads both — it cannot unpersist them itself without undoing
    * the single-scan plan. The caller owns release: run the action, then
    * `spark.catalog.clearCache()` (what Verify/Bench do per gate/rep). A
    * caller that invokes this repeatedly without clearing accumulates one
    * cached copy of each intermediate per invocation. */
  private def bigramLmScores(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val toks = filter(split($"text", " "), t => t =!= "")
    // the token projection feeds three branches (bigram build for the
    // count model, bigram rows for scoring, vocab) — cache it so the
    // corpus is scanned ONCE per run; re-deriving the explode from cache
    // is map-side CPU, not I/O (same discipline as Dedup.materializeOnce;
    // the gate/bench runner clears the cache per query)
    val base = docs.select($"doc_id", toks.as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bigrams = base
      .filter(size($"toks") >= 2)
      .select($"doc_id",
        slice($"toks", lit(1), size($"toks") - 1).as("h"),
        slice($"toks", lit(2), size($"toks") - 1).as("t"))
      .select($"doc_id", explode(arrays_zip($"h", $"t")).as("bg"))
      .select($"doc_id", $"bg.h".as("w1"), $"bg.t".as("w2"))
    // the count table is the reusable model artifact (at 100 TB, write it
    // to a table instead); persisted because both the scoring join and
    // the c1 rollup read it — without the cache the corpus-grain bigram
    // shuffle behind it would run twice
    val cnt = bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unigram-context counts roll up from the bigram count table — no
    // second pass over the corpus-volume bigram stream
    val c1 = cnt.groupBy($"w1").agg(sum($"c").as("c1"))
    val vocab = base.select(explode($"toks").as("t"))
      .agg(countDistinct($"t").as("v"))
    bigrams.join(cnt, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(round(avg(log2(($"c" + 1.0) / ($"c1" + $"v"))), 4).as("lm_score"))
  }
}

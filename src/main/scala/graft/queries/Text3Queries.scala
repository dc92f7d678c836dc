package graft.queries

import graft.{Q, Tables}
import graft.operators.{Retrieval, TextOps}
import org.apache.spark.sql.functions._

/** Round-13 text/retrieval wave: query-likelihood (Dirichlet) ranking,
  * the filter-funnel audit table, and WordPiece segmentation.
  */
object Text3Queries {

  /** The t42 serving vocabulary, shared verbatim by the Spark gate and
    * the oracle's VALUES list: single characters (minus `q`, so `query`
    * exercises the whole-word [UNK] path), a handful of word/prefix
    * pieces, and `##` continuations including multi-char suffixes that
    * the greedy matcher must prefer over the single-char fallbacks. */
  private val WpVocab: Seq[String] = {
    val singles = "abcdefghijklmnoprstuvwy".map(_.toString)
    val multi = Seq("join", "scan", "table", "row", "ha", "me", "val",
      "sl", "fa", "the", "sm", "cus", "col", "fil")
    val cont = singles.map("##" + _) ++ Seq("##sh", "##ch", "##rge",
      "##ue", "##ow", "##st", "##mall", "##tomer", "##umn", "##ter")
    singles ++ multi ++ cont
  }

  def all: Seq[Q] = Seq(

    // ---- WordPiece segmentation (t42): the BERT serving tokenizer —
    //      greedy longest-match-first under a fixed vocabulary, `##`
    //      continuations, whole-word [UNK] on a dead end. Histogram
    //      grain (one token count, then a per-distinct-word fold with
    //      the vocab as a broadcast map literal). The oracle replays
    //      the greedy walk as a recursive CTE whose longest-match step
    //      is an ORDER BY len DESC LIMIT 1 against the same VALUES
    //      vocabulary — same algorithm, independent mechanics. ----
    Q("t42_wordpiece",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        TextOps.wordpieceSegment(docs, "text", WpVocab)
          .select(col("word"), concat_ws(" ", col("pieces")).as("seg"),
            col("cnt"))
          .orderBy(col("word"))
      },
      Some(s"""WITH RECURSIVE vocab(piece) AS (VALUES ${
               WpVocab.map(v => s"('$v')").mkString(", ")}),
             |v AS (SELECT piece,
             |   CASE WHEN starts_with(piece, '##') THEN substr(piece, 3)
             |        ELSE piece END AS raw,
             |   starts_with(piece, '##') AS cont,
             |   length(CASE WHEN starts_with(piece, '##') THEN substr(piece, 3)
             |               ELSE piece END) AS len
             | FROM vocab),
             |words AS (SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(list_filter(string_split(text, ' '),
             |    x -> x <> '')) AS word FROM documents) GROUP BY word),
             |step AS (
             |  SELECT word, cnt, 1 AS pos, CAST([] AS VARCHAR[]) AS parts,
             |    false AS bad, false AS done
             |  FROM words WHERE length(word) <= 100
             |  UNION ALL
             |  SELECT word, cnt,
             |    CASE WHEN best IS NULL THEN length(word) + 1
             |         ELSE pos + blen END AS pos,
             |    CASE WHEN best IS NULL THEN ['[UNK]']
             |         ELSE list_append(parts, best) END AS parts,
             |    best IS NULL AS bad,
             |    CASE WHEN best IS NULL THEN true
             |         ELSE pos + blen > length(word) END AS done
             |  FROM (
             |    SELECT s.word, s.cnt, s.pos, s.parts,
             |      (SELECT piece FROM v WHERE v.cont = (s.pos > 1)
             |         AND v.raw = substr(s.word, s.pos, v.len)
             |       ORDER BY v.len DESC LIMIT 1) AS best,
             |      (SELECT len FROM v WHERE v.cont = (s.pos > 1)
             |         AND v.raw = substr(s.word, s.pos, v.len)
             |       ORDER BY v.len DESC LIMIT 1) AS blen
             |    FROM step s WHERE NOT s.done))
             |SELECT word, array_to_string(parts, ' ') AS seg,
             |  CAST(cnt AS BIGINT) AS cnt
             |FROM step WHERE done ORDER BY word""".stripMargin)),

    // ---- Query-likelihood retrieval with Dirichlet smoothing (t43):
    //      the LM scorer next to BM25 (t22) — docs matching >= 1 query
    //      term score Σ_t ln((tf + μ·cf/|C|)/(dl + μ)) INCLUDING the
    //      background mass of query terms they lack. Every ln operand
    //      is integer-derived and each term quantizes to micro-nats
    //      before the sum, so the ranking is an integer sort in both
    //      engines. One corpus scan, one broadcast stats row, top-k as
    //      TakeOrderedAndProject — the bm25TopK scale shape. ----
    Q("t43_ql_dirichlet",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Retrieval.qlDirichletTopK(docs, "doc_id", "text",
          Seq("merge", "scan", "hash"), mu = 2000L, k = 10)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS t
             |  FROM documents),
             |proj AS (
             |  SELECT doc_id, len(t) AS dl,
             |    len(list_filter(t, x -> x = 'merge')) AS tf_0,
             |    len(list_filter(t, x -> x = 'scan'))  AS tf_1,
             |    len(list_filter(t, x -> x = 'hash'))  AS tf_2
             |  FROM toks),
             |stats AS (
             |  SELECT sum(dl) AS clen, sum(tf_0) AS cf_0,
             |    sum(tf_1) AS cf_1, sum(tf_2) AS cf_2 FROM proj)
             |SELECT doc_id,
             |  (CASE WHEN cf_0 > 0 THEN CAST(round(ln(
             |     (CAST(tf_0 AS DOUBLE) + CAST(cf_0 * 2000 AS DOUBLE) / CAST(clen AS DOUBLE))
             |     / CAST(dl + 2000 AS DOUBLE)) * 1e6) AS BIGINT) ELSE 0 END
             | + CASE WHEN cf_1 > 0 THEN CAST(round(ln(
             |     (CAST(tf_1 AS DOUBLE) + CAST(cf_1 * 2000 AS DOUBLE) / CAST(clen AS DOUBLE))
             |     / CAST(dl + 2000 AS DOUBLE)) * 1e6) AS BIGINT) ELSE 0 END
             | + CASE WHEN cf_2 > 0 THEN CAST(round(ln(
             |     (CAST(tf_2 AS DOUBLE) + CAST(cf_2 * 2000 AS DOUBLE) / CAST(clen AS DOUBLE))
             |     / CAST(dl + 2000 AS DOUBLE)) * 1e6) AS BIGINT) ELSE 0 END
             |  ) AS score_micro
             |FROM proj, stats
             |WHERE tf_0 + tf_1 + tf_2 > 0 AND dl > 0
             |ORDER BY score_micro DESC, doc_id
             |LIMIT 10""".stripMargin)),

    // ---- Filter-funnel audit (t44): the per-rule drop table every
    //      cleaning recipe publishes. Four ordered keep-rules over
    //      documents; each doc is charged to its FIRST failing rule
    //      (chained-.filter semantics), so drops sum to total − kept.
    //      ONE codegen map pass + a ≤5-group count + a 5-row window —
    //      the corpus never shuffles. Oracle restates the same CASE
    //      chain and funnel window directly. ----
    Q("t44_filter_funnel",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        TextOps.filterFunnel(docs, Seq(
          "min_len" -> (length(col("text")) >= 150),
          "max_len" -> (length(col("text")) <= 450),
          "en_only" -> (col("lang") === "en"),
          "min_toks" -> (size(TextOps.tokens(col("text"))) >= 40)))
      },
      Some("""WITH f AS (
             |  SELECT CASE
             |    WHEN NOT (length(text) >= 150) THEN 1
             |    WHEN NOT (length(text) <= 450) THEN 2
             |    WHEN NOT (lang = 'en') THEN 3
             |    WHEN NOT (len(list_filter(string_split(text, ' '),
             |      x -> x <> '')) >= 40) THEN 4
             |    ELSE 5 END AS stage
             |  FROM documents),
             |c AS (SELECT stage, count(*) AS n FROM f GROUP BY stage),
             |r AS (SELECT * FROM (VALUES (1, 'min_len'), (2, 'max_len'),
             |  (3, 'en_only'), (4, 'min_toks'), (5, 'kept')) AS t(stage, rule)),
             |j AS (SELECT r.stage, r.rule, coalesce(c.n, 0) AS n
             |  FROM r LEFT JOIN c USING (stage)),
             |w AS (SELECT stage, rule, n,
             |  sum(n) OVER (ORDER BY stage DESC) AS n_in FROM j)
             |SELECT CAST(stage AS BIGINT) AS stage, rule,
             |  CAST(n_in AS BIGINT) AS n_in,
             |  CAST(CASE WHEN rule = 'kept' THEN 0 ELSE n END AS BIGINT)
             |    AS n_dropped,
             |  CAST(CASE WHEN rule = 'kept' THEN n_in ELSE n_in - n END
             |    AS BIGINT) AS n_out
             |FROM w ORDER BY stage""".stripMargin)),

    // ---- Field-weighted BM25F (t45): title = first 8 tokens at weight
    //      2.0 / b 0.75, body = the rest at 1.0 / b 0.4. Per-field
    //      length normalization, then ONE saturation over the weighted
    //      pseudo-frequency (the Zaragoza et al. structure — a title
    //      hit must not saturate separately from body hits); df counts
    //      any-field matches. Same one-scan / broadcast-stats /
    //      TakeOrdered shape as t22. Oracle restates the identical
    //      float chain; round-4 ordering absorbs ln ulps (t22
    //      precedent). ----
    Q("t45_bm25f",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val toks = TextOps.tokens(col("text"))
        Retrieval.bm25fTopK(docs, "doc_id",
          Seq((slice(toks, 1, 8), 2.0, 0.75),
            (slice(toks, 9, 1000000), 1.0, 0.4)),
          Seq("join", "table", "merge"), k1 = 1.2, k = 10)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS t
             |  FROM documents),
             |fld AS (
             |  SELECT doc_id, t[1:8] AS f0,
             |    CASE WHEN len(t) >= 9 THEN t[9:len(t)]
             |         ELSE CAST([] AS VARCHAR[]) END AS f1
             |  FROM toks),
             |proj AS (
             |  SELECT doc_id,
             |    CAST(len(f0) AS DOUBLE) AS dl0, CAST(len(f1) AS DOUBLE) AS dl1,
             |    CAST(len(list_filter(f0, x -> x = 'join'))  AS DOUBLE) AS tf00,
             |    CAST(len(list_filter(f1, x -> x = 'join'))  AS DOUBLE) AS tf10,
             |    CAST(len(list_filter(f0, x -> x = 'table')) AS DOUBLE) AS tf01,
             |    CAST(len(list_filter(f1, x -> x = 'table')) AS DOUBLE) AS tf11,
             |    CAST(len(list_filter(f0, x -> x = 'merge')) AS DOUBLE) AS tf02,
             |    CAST(len(list_filter(f1, x -> x = 'merge')) AS DOUBLE) AS tf12
             |  FROM fld),
             |stats AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    avg(dl0) AS a0, avg(dl1) AS a1,
             |    sum(CASE WHEN tf00 + tf10 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
             |    sum(CASE WHEN tf01 + tf11 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
             |    sum(CASE WHEN tf02 + tf12 > 0 THEN 1.0 ELSE 0.0 END) AS df2
             |  FROM proj),
             |tfp AS (
             |  SELECT doc_id, n, df0, df1, df2,
             |    (CASE WHEN tf00 > 0 THEN 2.0 * tf00 / (1.0 + 0.75 * (dl0 / a0 - 1.0)) ELSE 0.0 END
             |     + CASE WHEN tf10 > 0 THEN 1.0 * tf10 / (1.0 + 0.4 * (dl1 / a1 - 1.0)) ELSE 0.0 END) AS tfp0,
             |    (CASE WHEN tf01 > 0 THEN 2.0 * tf01 / (1.0 + 0.75 * (dl0 / a0 - 1.0)) ELSE 0.0 END
             |     + CASE WHEN tf11 > 0 THEN 1.0 * tf11 / (1.0 + 0.4 * (dl1 / a1 - 1.0)) ELSE 0.0 END) AS tfp1,
             |    (CASE WHEN tf02 > 0 THEN 2.0 * tf02 / (1.0 + 0.75 * (dl0 / a0 - 1.0)) ELSE 0.0 END
             |     + CASE WHEN tf12 > 0 THEN 1.0 * tf12 / (1.0 + 0.4 * (dl1 / a1 - 1.0)) ELSE 0.0 END) AS tfp2
             |  FROM proj, stats),
             |scored AS (
             |  SELECT doc_id, round(
             |      CASE WHEN tfp0 > 0 THEN ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * tfp0 / (1.2 + tfp0) ELSE 0.0 END
             |    + CASE WHEN tfp1 > 0 THEN ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tfp1 / (1.2 + tfp1) ELSE 0.0 END
             |    + CASE WHEN tfp2 > 0 THEN ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tfp2 / (1.2 + tfp2) ELSE 0.0 END,
             |    4) AS score
             |  FROM tfp)
             |SELECT doc_id, score FROM scored
             |WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- Per-group quantile-rank calibration (t46): document length
    //      calibrated WITHIN each language (the CCNet/FineWeb per-dump
    //      normalization — raw scores live on incomparable scales
    //      across sources; ranks within a source are comparable).
    //      Midrank quantile u = (r + (c+1)/2)/(n_g + 1), carried as the
    //      doubled integer numerator/denominator so the round-6 u is
    //      ONE division of identical longs in both engines. ----
    Q("t46_quantile_normalize",
      (s, dir) => {
        import s.implicits._
        TextOps.quantileNormalize(Tables(s, dir, "documents"),
            $"lang", $"n_chars".cast("long"))
          .orderBy($"grp", $"score")
      },
      Some("""WITH g AS (
             |  SELECT lang AS grp, CAST(n_chars AS BIGINT) AS score,
             |    count(*) AS c
             |  FROM documents GROUP BY 1, 2),
             |r AS (
             |  SELECT grp, score, c,
             |    2 * coalesce(sum(c) OVER (PARTITION BY grp ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + c + 1 AS u_num2,
             |    2 * (sum(c) OVER (PARTITION BY grp) + 1) AS u_den2
             |  FROM g)
             |SELECT grp, score, CAST(c AS BIGINT) AS c,
             |  CAST(u_num2 AS BIGINT) AS u_num2,
             |  CAST(u_den2 AS BIGINT) AS u_den2,
             |  round(CAST(u_num2 AS DOUBLE) / CAST(u_den2 AS DOUBLE), 6) AS u
             |FROM r ORDER BY grp, score""".stripMargin)),

    // ---- IR evaluation metrics (t47): MRR / Recall@10 / nDCG@10 of a
    //      deterministic run file (per-language top-20 by length) vs
    //      deterministic binary judgments (doc_id ≡ 0 mod 7) —
    //      Retrieval.irMetrics, the trec_eval triple. Ranks are
    //      integers, so rr and every DCG gain quantize to micro-units
    //      BEFORE their integer sums (the t43 micro-nat discipline);
    //      recall and ndcg are single round-6 divisions of exact
    //      longs. Queries with nothing relevant retrieved score 0. ----
    Q("t47_ir_metrics",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents")
        val runs = docs.select($"lang".as("query"), $"doc_id".as("doc"),
            row_number().over(Window.partitionBy($"lang")
              .orderBy($"n_chars".desc, $"doc_id")).as("rank"))
          .filter($"rank" <= 20)
        val qrels = docs.filter($"doc_id" % 7 === 0)
          .select($"lang".as("query"), $"doc_id".as("doc"))
        Retrieval.irMetrics(runs, "query", "doc", "rank",
            qrels, "query", "doc", k = 10)
          .orderBy($"query")
      },
      Some("""WITH runs AS (
             |  SELECT lang AS query, doc_id AS doc,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY n_chars DESC, doc_id) AS rank
             |  FROM documents QUALIFY rank <= 20),
             |qrels AS (
             |  SELECT DISTINCT lang AS query, doc_id AS doc
             |  FROM documents WHERE doc_id % 7 = 0),
             |perq AS (SELECT query, count(*) AS n_rel FROM qrels GROUP BY 1),
             |hits AS (
             |  SELECT r.query, min(r.rank) AS first_rel_rank,
             |    sum(CASE WHEN r.rank <= 10 THEN 1 ELSE 0 END) AS hits_at_k,
             |    sum(CASE WHEN r.rank <= 10 THEN
             |      CAST(round(1e6 / (ln(r.rank + 1.0) / ln(2.0)), 0) AS BIGINT)
             |      ELSE 0 END) AS dcg_micro
             |  FROM runs r JOIN qrels q ON r.query = q.query AND r.doc = q.doc
             |  GROUP BY r.query),
             |idcg AS (
             |  SELECT query, n_rel,
             |    CAST(list_sum(list_transform(range(1, least(n_rel, 10) + 1),
             |      rk -> CAST(round(1e6 / (ln(rk + 1.0) / ln(2.0)), 0)
             |        AS BIGINT))) AS BIGINT) AS idcg_micro
             |  FROM perq)
             |SELECT i.query, CAST(i.n_rel AS BIGINT) AS n_rel,
             |  CAST(h.first_rel_rank AS BIGINT) AS first_rel_rank,
             |  coalesce(CAST(round(1e6 / h.first_rel_rank, 0) AS BIGINT), 0)
             |    AS rr_micro,
             |  CAST(coalesce(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
             |  round(CAST(coalesce(h.hits_at_k, 0) AS DOUBLE)
             |    / CAST(i.n_rel AS DOUBLE), 6) AS recall_at_k,
             |  CAST(coalesce(h.dcg_micro, 0) AS BIGINT) AS dcg_micro,
             |  i.idcg_micro,
             |  round(CAST(coalesce(h.dcg_micro, 0) AS DOUBLE)
             |    / CAST(i.idcg_micro AS DOUBLE), 6) AS ndcg
             |FROM idcg i LEFT JOIN hits h ON i.query = h.query
             |ORDER BY i.query""".stripMargin)),

    // ---- TextRank keywords (t48): PageRank centrality over the
    //      corpus word co-occurrence graph (adjacent tokens, window 2)
    //      — the composition proof that the text and graph halves
    //      share one data model. Words ride their portable 63-bit md5
    //      hash through the 3 unrolled sweeps (the q103 oracle shape)
    //      and join back to min(word) per id; the cut orders on the
    //      ROUNDED rank so a last-bit float divergence cannot reorder
    //      it. ----
    Q("t48_textrank",
      (s, dir) => {
        import s.implicits._
        graft.operators.TextOps.textrankKeywords(
            Tables(s, dir, "documents"), "text", iterations = 3)
          .orderBy($"pr".desc, $"word").limit(20)
      },
      Some("""WITH d AS (
             |  SELECT list_filter(string_split(text, ' '), x -> x <> '')
             |    AS toks
             |  FROM documents),
             |d2 AS (SELECT toks FROM d WHERE len(toks) >= 2),
             |bg AS (
             |  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]))
             |    AS bg
             |  FROM d2),
             |p AS (
             |  SELECT bg[1] AS w1, bg[2] AS w2 FROM bg WHERE bg[1] <> bg[2]),
             |ph AS (
             |  SELECT w1, w2,
             |    (((('0x' || substr(md5(w1), 1, 8))::BIGINT & 2147483647)
             |      << 32) | ('0x' || substr(md5(w1), 9, 8))::BIGINT) AS h1,
             |    (((('0x' || substr(md5(w2), 1, 8))::BIGINT & 2147483647)
             |      << 32) | ('0x' || substr(md5(w2), 9, 8))::BIGINT) AS h2
             |  FROM p),
             |canon AS (
             |  SELECT DISTINCT least(h1, h2) AS u, greatest(h1, h2) AS v
             |  FROM ph),
             |edges AS (
             |  SELECT u AS src, v AS dst FROM canon
             |  UNION ALL SELECT v, u FROM canon),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |deg AS (
             |  SELECT src, CAST(count(*) AS DOUBLE) AS deg
             |  FROM edges GROUP BY src),
             |pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
             |pr1 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr0 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id),
             |pr2 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr1 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id),
             |pr3 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.s,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS s
             |    FROM edges e JOIN pr2 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON nd.id = s.id),
             |words AS (
             |  SELECT id, min(word) AS word FROM (
             |    SELECT h1 AS id, w1 AS word FROM ph
             |    UNION ALL SELECT h2, w2 FROM ph)
             |  GROUP BY id)
             |SELECT w.word, round(p.pr, 7) AS pr
             |FROM pr3 p JOIN words w ON p.id = w.id
             |ORDER BY pr DESC, word LIMIT 20""".stripMargin)),

    // ---- ROUGE-2 pair scoring (t49): clipped bigram-overlap P/R/F1
    //      between each document and its 40-token head — the
    //      generation-eval metric next to t47's retrieval triple. The
    //      shared match count makes F1 = 2m/(n_ref+n_hyp) exactly; all
    //      three metrics are single round-6 divisions of exact longs.
    //      Sides under 2 tokens score null, never NaN. ----
    Q("t49_rouge",
      (s, dir) => {
        import s.implicits._
        val toks = filter(split($"text", " "), t => t =!= "")
        val pairs = Tables(s, dir, "documents")
          .select($"doc_id", $"text".as("ref"),
            array_join(slice(toks, 1, 40), " ").as("hyp"))
        graft.operators.TextOps.rougeN(pairs, "doc_id", "ref", "hyp", n = 2)
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS rt
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, rt, rt[1:least(len(rt), 40)] AS ht FROM d),
             |rg AS (
             |  SELECT doc_id, unnest(CASE WHEN len(rt) >= 2 THEN
             |    list_transform(range(1, len(rt)),
             |      i -> rt[CAST(i AS INT)] || chr(1) || rt[CAST(i AS INT) + 1])
             |    ELSE []::VARCHAR[] END) AS g
             |  FROM p),
             |hg AS (
             |  SELECT doc_id, unnest(CASE WHEN len(ht) >= 2 THEN
             |    list_transform(range(1, len(ht)),
             |      i -> ht[CAST(i AS INT)] || chr(1) || ht[CAST(i AS INT) + 1])
             |    ELSE []::VARCHAR[] END) AS g
             |  FROM p),
             |cr AS (SELECT doc_id, g, count(*) AS cr FROM rg GROUP BY 1, 2),
             |ch AS (SELECT doc_id, g, count(*) AS ch FROM hg GROUP BY 1, 2),
             |m AS (
             |  SELECT coalesce(cr.doc_id, ch.doc_id) AS doc_id,
             |    coalesce(cr, 0) AS cr, coalesce(ch, 0) AS ch
             |  FROM cr FULL OUTER JOIN ch
             |    ON cr.doc_id = ch.doc_id AND cr.g = ch.g),
             |agg AS (
             |  SELECT doc_id, sum(cr) AS n_ref, sum(ch) AS n_hyp,
             |    sum(least(cr, ch)) AS match_n
             |  FROM m GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
             |  CAST(coalesce(n_hyp, 0) AS BIGINT) AS n_hyp,
             |  CAST(coalesce(match_n, 0) AS BIGINT) AS match_n,
             |  CASE WHEN coalesce(n_hyp, 0) > 0 THEN
             |    round(CAST(match_n AS DOUBLE) / CAST(n_hyp AS DOUBLE), 6)
             |  END AS p,
             |  CASE WHEN coalesce(n_ref, 0) > 0 THEN
             |    round(CAST(match_n AS DOUBLE) / CAST(n_ref AS DOUBLE), 6)
             |  END AS r,
             |  CASE WHEN coalesce(n_ref, 0) + coalesce(n_hyp, 0) > 0 THEN
             |    round(2.0 * CAST(match_n AS DOUBLE)
             |      / CAST(n_ref + n_hyp AS DOUBLE), 6)
             |  END AS f1
             |FROM d LEFT JOIN agg USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- lexical richness (t50): Yule's K and Simpson's repeat rate
    //      per document — length-invariant repetitiveness next to
    //      t14's raw fractions. Both reduce to (n, sum c^2) exact
    //      longs; each statistic is one round-6 division. ----
    Q("t50_lexical_richness",
      (s, dir) => {
        import s.implicits._
        graft.operators.TextOps.lexicalRichness(
            Tables(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             |      AS w
             |  FROM documents),
             |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
             |a AS (
             |  SELECT doc_id, sum(c) AS n, sum(c * c) AS s2
             |  FROM c GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(coalesce(a.n, 0) AS BIGINT) AS n,
             |  CAST(coalesce(a.s2, 0) AS BIGINT) AS s2,
             |  CASE WHEN coalesce(a.n, 0) > 0 THEN
             |    round(1e4 * CAST(a.s2 - a.n AS DOUBLE)
             |      / CAST(a.n * a.n AS DOUBLE), 6) END AS yule_k,
             |  CASE WHEN coalesce(a.n, 0) > 1 THEN
             |    round(CAST(a.s2 - a.n AS DOUBLE)
             |      / CAST(a.n * (a.n - 1) AS DOUBLE), 6) END AS simpson_d
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin))
,
    // ---- Dunning LLR collocations (t51): the significance-calibrated
    //      collocation test next to t25's PMI — G² over each adjacent
    //      pair's 2×2 bigram-slot contingency, every cell's 2·O·ln(O/E)
    //      micro-quantized then nano-summed so the ranking is an exact
    //      integer sort in both engines. ----
    Q("t51_llr_collocations",
      (s, dir) =>
        graft.operators.TextOps.llrCollocations(
          Tables(s, dir, "documents"), "text", minCount = 5L, k = 20),
      Some("""             |WITH d AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |bgr AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
             |  FROM d WHERE len(toks) >= 2),
             |bg2 AS (SELECT bg[1] AS w1, bg[2] AS w2 FROM bgr),
             |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg2 GROUP BY 1, 2),
             |rm AS (SELECT w1, sum(c_ab) AS r1 FROM cab GROUP BY 1),
             |cm AS (SELECT w2, sum(c_ab) AS c1 FROM cab GROUP BY 1),
             |t AS (SELECT sum(c_ab) AS nn FROM cab),
             |j AS (
             |  SELECT cab.w1, cab.w2, c_ab, r1, c1, nn
             |  FROM cab JOIN rm USING (w1) JOIN cm USING (w2), t
             |  WHERE c_ab >= 5),
             |s AS (SELECT w1, w2, c_ab,
             |(CASE WHEN c_ab > 0 THEN CAST(round(2.0 * (c_ab) * (CAST(CAST(round(ln((CAST(c_ab AS DOUBLE) * CAST(nn AS DOUBLE)) / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) * 1e6) AS BIGINT) AS DOUBLE) / 1e6) * 1e9) AS BIGINT) ELSE 0 END) +
             |(CASE WHEN r1 - c_ab > 0 THEN CAST(round(2.0 * (r1 - c_ab) * (CAST(CAST(round(ln((CAST(r1 - c_ab AS DOUBLE) * CAST(nn AS DOUBLE)) / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) * 1e6) AS BIGINT) AS DOUBLE) / 1e6) * 1e9) AS BIGINT) ELSE 0 END) +
             |(CASE WHEN c1 - c_ab > 0 THEN CAST(round(2.0 * (c1 - c_ab) * (CAST(CAST(round(ln((CAST(c1 - c_ab AS DOUBLE) * CAST(nn AS DOUBLE)) / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) * 1e6) AS BIGINT) AS DOUBLE) / 1e6) * 1e9) AS BIGINT) ELSE 0 END) +
             |(CASE WHEN nn - r1 - c1 + c_ab > 0 THEN CAST(round(2.0 * (nn - r1 - c1 + c_ab) * (CAST(CAST(round(ln((CAST(nn - r1 - c1 + c_ab AS DOUBLE) * CAST(nn AS DOUBLE)) / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) * 1e6) AS BIGINT) AS DOUBLE) / 1e6) * 1e9) AS BIGINT) ELSE 0 END) AS llr_nano
             |FROM j)
             |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
             |  CAST(llr_nano AS BIGINT) AS llr_nano,
             |  round(CAST(llr_nano AS DOUBLE) / 1e9, 6) AS llr
             |FROM s ORDER BY llr_nano DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ---- LM quality scoring from the PERSISTED model layout (t52):
    //      t13's bigram-LM filter as train-once/score-forever — the
    //      count model written bucket-partitioned once, a probe batch
    //      scored reading only its touched buckets (never re-scanning
    //      the corpus). Scores reproduce t13's one-pass formula
    //      exactly for corpus members. ----
    Q("t52_lm_index",
      (s, dir) => {
        import s.implicits._
        val key = Tables.contentKey(s"$dir/documents.parquet")
        val layout = graft.Scratch.dir(s"graft_lm_idx_$key")
        val docs = Tables(s, dir, "documents")
        TextOps.lmIndexWrite(docs, "text", layout)
        TextOps.lmScoreFromIndex(s, layout,
            docs.filter($"doc_id" < 50), "doc_id", "text")
          .orderBy($"doc_id")
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
             |c1 AS (SELECT w1, sum(c) AS c1 FROM cnt GROUP BY w1),
             |v AS (SELECT count(DISTINCT t) AS v
             |      FROM (SELECT unnest(toks) AS t FROM d))
             |SELECT doc_id,
             |  round(avg(log2((c + 1.0) / (c1 + v))), 4) AS lm_score
             |FROM bg2 JOIN cnt USING (w1, w2) JOIN c1 USING (w1)
             |CROSS JOIN v
             |WHERE doc_id < 50
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- term burstiness (t53): which terms CLUMP across documents?
    //      Church & Gale's variance-to-mean ratio of per-doc counts —
    //      content words burst, template glue sits near the Poisson
    //      VMR of 1. num/den exact longs (docs missing a term carry 0
    //      into both moments via N alone), one round-6 division. ----
    Q("t53_burstiness",
      (s, dir) =>
        graft.operators.TextOps.burstiness(
          Tables(s, dir, "documents"), "doc_id", "text",
          minCount = 20L, k = 20),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |n AS (SELECT count(*) AS nd FROM d),
             |tc AS (
             |  SELECT term, doc_id, count(*) AS c FROM (
             |    SELECT doc_id, unnest(toks) AS term FROM d)
             |  GROUP BY 1, 2),
             |m AS (
             |  SELECT term, count(*) AS n_docs, sum(c) AS total,
             |    sum(c * c) AS s2
             |  FROM tc GROUP BY 1 HAVING sum(c) >= 20)
             |SELECT term, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(total AS BIGINT) AS total,
             |  round(CAST(nd * s2 - total * total AS DOUBLE)
             |    / CAST(nd * total AS DOUBLE), 6) AS vmr
             |FROM m, n
             |ORDER BY vmr DESC, term LIMIT 20""".stripMargin))
  )
}

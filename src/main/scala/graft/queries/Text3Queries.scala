package graft.queries

import graft.{Q, Tables}
import graft.operators.{Retrieval, TextOps}
import org.apache.spark.sql.functions._

/** Round-13 text/retrieval wave: query-likelihood (Dirichlet) ranking,
  * the filter-funnel audit table, and WordPiece segmentation.
  */
object Text3Queries {

  def all: Seq[Q] = Seq(

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
             |FROM w ORDER BY stage""".stripMargin))
  )
}

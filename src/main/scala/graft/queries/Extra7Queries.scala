package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-13 third wave: information-theoretic column association,
  * link prediction, autocorrelation, and partition-quality metrics.
  */
object Extra7Queries {

  def all: Seq[Q] = Seq(

    // ---- Mutual information + NMI (q140): does order status tell
    //      you anything about order priority? The effect-size
    //      companion to q139's chi-square from the information side.
    //      Only PRESENT cells score (absent cells contribute exactly
    //      0 — no grid), shares are quotients of exact longs, ln
    //      quantizes to micro-nats BEFORE the product, contributions
    //      to nano-nats before the order-free sum; entropies ride the
    //      same chain over the margins, NMI is one sqrt + divide of
    //      the quantized values. ----
    Q("q140_mutual_information",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.mutualInformation(
          Tables(s, dir, "orders"), $"o_orderstatus", $"o_orderpriority")
      },
      Some("""WITH cells AS (
             |  SELECT o_orderstatus AS x, o_orderpriority AS y,
             |    count(*) AS o
             |  FROM orders
             |  WHERE o_orderstatus IS NOT NULL
             |    AND o_orderpriority IS NOT NULL
             |  GROUP BY 1, 2),
             |xm AS (SELECT x, sum(o) AS xm FROM cells GROUP BY 1),
             |ym AS (SELECT y, sum(o) AS ym FROM cells GROUP BY 1),
             |t AS (SELECT sum(o) AS n FROM cells),
             |mi AS (
             |  SELECT sum(CAST(round(
             |      CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
             |      * (CAST(CAST(round(ln(
             |          (CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
             |          / (CAST(xm AS DOUBLE) * CAST(ym AS DOUBLE))) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS mi_nano
             |  FROM cells JOIN xm USING (x) JOIN ym USING (y), t),
             |hx AS (
             |  SELECT count(*) AS n_x,
             |    sum(CAST(round(
             |      -(CAST(xm AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(CAST(round(ln(
             |          CAST(xm AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS hx_nano
             |  FROM xm, t),
             |hy AS (
             |  SELECT count(*) AS n_y,
             |    sum(CAST(round(
             |      -(CAST(ym AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(CAST(round(ln(
             |          CAST(ym AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS hy_nano
             |  FROM ym, t)
             |SELECT CAST(t.n AS BIGINT) AS n,
             |  CAST(hx.n_x AS BIGINT) AS n_x, CAST(hy.n_y AS BIGINT) AS n_y,
             |  CAST(mi.mi_nano AS BIGINT) AS mi_nano,
             |  round(CAST(mi.mi_nano AS DOUBLE) / 1e9, 6) AS mi,
             |  CAST(hx.hx_nano AS BIGINT) AS hx_nano,
             |  CAST(hy.hy_nano AS BIGINT) AS hy_nano,
             |  CASE WHEN hx.hx_nano > 0 AND hy.hy_nano > 0 THEN
             |    round((CAST(mi.mi_nano AS DOUBLE) / 1e9)
             |      / sqrt((CAST(hx.hx_nano AS DOUBLE) / 1e9)
             |           * (CAST(hy.hy_nano AS DOUBLE) / 1e9)), 6)
             |  END AS nmi
             |FROM t, mi, hx, hy""".stripMargin))
  )
}

package graft.queries

import graft.Q
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming queries run to completion against the finite
  * events file source, oracle-checked against the batch-equivalent SQL —
  * streaming and batch must agree on a replayed input.
  */
object StreamQueries {

  def all: Seq[Q] = Seq(

    Q("st01_stream_hourly",
      (s, dir) => {
        val res = StreamOps.runToMemory(
          s, StreamOps.hourlyCounts(StreamOps.readEvents(s, dir)),
          "st01_out", OutputMode.Complete())
        res.select(
            date_format(col("window.start"), "yyyy-MM-dd HH").as("hr"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy(col("hr"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    Q("st02_stream_sessions",
      (s, dir) => {
        val sess = StreamOps.sessionize(StreamOps.readEvents(s, dir))
        StreamOps.runToMemory(s, sess.toDF(), "st02_out", OutputMode.Update())
          .orderBy(col("user_id"), col("session_id"))
      },
      // same ground truth as the batch window-function sessionization
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, ts, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, sec,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin))
  )
}

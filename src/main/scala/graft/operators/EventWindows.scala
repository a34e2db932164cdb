package graft.operators

import graft.Exact.dsum
import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time window semantics (SURVEY.md §2.10 T5 extensions) as batch
  * queries — the same operators run under `readStream` + watermark in
  * [[graft.streaming.QueuePipeline]]; batch mode makes them oracle-checkable.
  *
  * Oracle equivalences worth noting:
  *  - `session_window(ts, gap)`: a new session starts when the inter-event
  *    gap is ≥ gap (Spark's window is [start, last+gap), an event landing
  *    exactly at the boundary opens a NEW session). The SQL mirror is the
  *    gaps-and-islands construction with `>=`.
  *  - sliding `window(ts, width, slide)`: every event belongs to
  *    width/slide windows; the SQL mirror cross-joins each event with its
  *    window-start offsets computed from epoch-µs floor division.
  */
object EventWindows {

  type Q = (SparkSession, String) => DataFrame

  private val GapUs = 1800L * 1000000L // 30 minutes

  val queries: Map[String, Q] = Map(
    // Native session windows per user: count + bounds per session.
    "t6_session_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("sess_start"),
          col("w.end").as("sess_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")),

    // Sliding 1h windows every 30min per event type.
    "t7_sliding_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")))

  val oracle: Map[String, String] = Map(
    "t6_session_window" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) >= $GapUs
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sid AS (
         |  SELECT user_id, ts, value,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g)
         |SELECT user_id, min(ts) AS sess_start,
         |  max(ts) + INTERVAL 30 MINUTE AS sess_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM sid GROUP BY user_id, sess
         |ORDER BY user_id, sess_start""".stripMargin,

    "t7_sliding_window" ->
      """SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
        |         - k * 1800000000) AS win_start,
        |  event_type, count(*) AS n
        |FROM events, (SELECT unnest([0, 1]) AS k)
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin)
}

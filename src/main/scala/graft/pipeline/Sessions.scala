package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream, batch flavor — the
  * batch-mode twin of [[graft.streaming.Streams]]' stateful session
  * windows, and the standard shape for user-behavior rollups over an
  * events table.
  *
  * Scale shape: ONE shuffle on `user_id`; the lag window, the running
  * session counter, and the per-session aggregation all run inside that
  * partitioning (the groupBy keys are (user_id, session_idx), a superset
  * of the window's partition key, so no second exchange of the full
  * stream is needed — partial aggregation handles the rest). Timestamps
  * compare as epoch MICROSECONDS (integers) so the session boundaries
  * are bit-identical across engines.
  */
object Sessions {

  /** Split each user's events into sessions whenever the gap between
    * consecutive events exceeds `gapSeconds`; aggregate per session.
    * Deterministic: ordering ties on `ts` break by `event_id`. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_sess").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }
}

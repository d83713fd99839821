package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range joins — the batch spelling of the stream
  * engines' interval join. A naive time-range join is a theta join:
  * Spark plans it as BroadcastNestedLoop (or a cartesian per key), which
  * is quadratic per key and a non-starter at scale. Bucketing both sides
  * to `windowSec`-wide time bands turns it into an EQUI-join on
  * (key, bucket) with a bounded probe fan-out of 2 — a `[ts-w, ts]`
  * window can only reach its own band and the one before — followed by
  * the exact range predicate as a post-filter. Work is proportional to
  * true matches plus band spill, never |L|×|R| per key.
  */
object RangeJoins {

  /** For each probe row, the number of build rows with the same key whose
    * timestamp lies in `[probe ts - windowSec, probe ts]` (timestamps in
    * epoch microseconds). Zero-match probe rows are kept with n = 0.
    *
    * Contract: `probe(key, id, ts_us)` with `id` unique; `build(key,
    * ts_us)`. One shuffle per side on (key, bucket); the 2× probe
    * fan-out happens BEFORE its shuffle, so no partition ever holds more
    * than two bands of one key.
    */
  def slidingCount(probe: DataFrame, build: DataFrame,
      windowSec: Long): DataFrame = {
    val w = windowSec * 1000000L
    val pb = probe.withColumn("_b0", floor(col("ts_us") / w))
      .withColumn("bucket", explode(array(col("_b0") - 1, col("_b0"))))
      .drop("_b0")
    val bb = build.withColumn("bucket", floor(col("ts_us") / w))
      .withColumnRenamed("ts_us", "build_ts_us")
    pb.join(bb, Seq("key", "bucket"), "left")
      .withColumn("_hit",
        col("build_ts_us").isNotNull &&
          col("build_ts_us") >= col("ts_us") - w &&
          col("build_ts_us") <= col("ts_us"))
      .groupBy("key", "id", "ts_us")
      .agg(count(when(col("_hit"), 1)).cast("long").as("n"))
  }
}

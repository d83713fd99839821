package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic cardinality sketching for the training-data pipeline.
  *
  * Why not HyperLogLog: Spark's `approx_count_distinct` and any other
  * engine's HLL use different hash functions and register layouts, so an
  * estimate can never be replayed by the DuckDB oracle. KMV (k-minimum
  * values) over the engine-portable rolling hash IS replayable: both
  * engines hash identically, keep the k smallest distinct hashes, and
  * apply the same estimator — deterministic to the last bit.
  *
  * Scale posture: the sketch is algebraic — per-partition top-k merges
  * associatively (Spark executes orderBy+limit as TakeOrdered: partial
  * per-partition top-k, then a tiny driver merge), so the full column is
  * never collected; state is O(k).
  */
object Sketches {
  val P: Long = 2147483647L // the shared rolling-hash modulus

  /** The k smallest distinct rolling hashes of `c` (the KMV sketch
    * itself, as a k-row DataFrame). Mergeable: union + distinct + top-k. */
  def kmvSketch(df: DataFrame, c: Column, k: Int): DataFrame =
    df.select(TextFunctions.rollingHash(c).as("h"))
      .where(col("h") > 0) // 0 = empty string; KMV needs h in (0, P)
      .distinct()
      .orderBy(col("h"))
      .limit(k)

  /** KMV distinct-count estimate of `c`: exact when fewer than k distinct
    * hashes exist, else `(k-1) * P / kth_min` — the standard KMV
    * estimator over the hash space (0, P). Returns one row
    * (est_distinct: double, rounded 4). */
  def kmvDistinct(df: DataFrame, c: Column, k: Int): DataFrame =
    kmvSketch(df, c, k)
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("kth"), 4))
          .as("est_distinct"))

  /** Per-group KMV distinct-count estimates — the grouped form of
    * [[kmvDistinct]], one row per group. Sketch state is the k smallest
    * distinct hashes PER GROUP: the distinct prunes before the per-group
    * rank, so the window sorts each group's distinct-hash set (bounded
    * by the value cardinality, ≪ raw rows), never the raw column. */
  def kmvDistinctBy(df: DataFrame, group: Column, c: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.select(group.as("grp"), TextFunctions.rollingHash(c).as("h"))
      .where(col("h") > 0).distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    h.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("grp")
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(col("grp"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("kth"), 4))
          .as("est_distinct"))
  }

  /** Pure-Scala executable spec (PropertySpec: mergeability + estimator). */
  def kmvSpec(hashes: Seq[Long], k: Int): Double = {
    val ks = hashes.filter(_ > 0).distinct.sorted.take(k)
    if (ks.length < k) ks.length.toDouble
    else {
      val raw = (k - 1).toDouble * P / ks.last
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}

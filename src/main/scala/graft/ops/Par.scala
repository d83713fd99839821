package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism floor for heavy per-row stages (optimization guide §2.5
  * input skew / §2.6 idle capacity): a scan of one small parquet file
  * yields a single input partition, and any expensive expression stage
  * pinned above it (tokenize + explode + hash, byte walks) then runs on
  * one core while the rest of the machine idles — measured 6.4s of task
  * time in ~1 active task for the DSIR weight pass at sf0.1.
  *
  * [[spread]] round-robin-repartitions UP to the session's default
  * parallelism, and only when the plan has fewer partitions than that:
  * at production scale a table scan already carries thousands of
  * partitions, so the guard makes it an exact no-op there — no extra
  * exchange of payload bytes is ever paid where parallelism already
  * exists (guide §8's "move heavy bytes once" rule). Keyless
  * round-robin keeps Spark's sort-before-repartition determinism
  * (guide §2.5), so retried tasks reproduce the same placement.
  *
  * Call sites put it AFTER the pushdown-eligible projections/filters of
  * a scan (so `PushedFilters`/`ReadSchema` still reach the parquet
  * reader) and BEFORE the expensive expression stage. */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators for the 100 TB posture: multi-dimensional
  * clustering keys. A table range-partitioned and sorted by a Z-ORDER
  * (Morton) key interleaving two bucketized columns keeps rows that are
  * close in EITHER dimension physically adjacent, so parquet row-group
  * min/max stats prune 2-D predicates (lang = 'x' AND n_chars BETWEEN …)
  * that a single-column sort can only serve for its leading column —
  * the Delta/Iceberg OPTIMIZE ZORDER pattern as an explicit, exactly
  * replayable expression (integer arithmetic only; no library call).
  */
object Layout {

  /** Morton interleave of two `bits`-bit bucket ids: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. Buckets must already fit in
    * `bits` bits (see [[intBucket]]); bit positions are disjoint so the
    * sum IS the bitwise-or. Pure codegen'd integer arithmetic. */
  def zorderKey(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i) % 2, 2 * i) +
        shiftleft(shiftright(b, i) % 2, 2 * i + 1)
    }.reduce(_ + _)

  /** Hilbert-curve key of two `bits`-bit bucket ids
    * ([[org.apache.spark.sql.graft.HilbertIndex]]): the locality
    * upgrade over [[zorderKey]] — consecutive keys are always
    * grid-ADJACENT (Z-order jumps at power-of-two seams), so a key
    * range covers a compact 2-D region and row-group min/max pruning
    * is tighter for the same sort. Data-dependent rotate/reflect walk,
    * evaluated in one codegen'd integer loop per row. */
  def hilbertKey(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.graft.{GraftExpressions, HilbertIndex}
    GraftExpressions.col(HilbertIndex(
      GraftExpressions.expr(a.cast("long")),
      GraftExpressions.expr(b.cast("long")), bits))
  }

  /** Deterministic SHARD MANIFEST — the integrity artifact a training
    * run ships next to its shards: per shard, the doc count, total
    * characters, an ORDER-INDEPENDENT content checksum (sum of the
    * portable rolling hashes — addition commutes, so the manifest is
    * identical under any partitioning or write order), and the id
    * range. A reader re-derives the manifest and compares — corruption,
    * truncation, or a nondeterministic upstream shows up as a checksum
    * mismatch before any training step runs. One groupBy on the
    * ≤`shards`-row key after [[shardAssign]]'s assignment. */
  def shardManifest(docs: DataFrame, shards: Int): DataFrame = {
    import graft.functions.TextFunctions
    val content = docs.select(col("doc_id"), col("n_chars"),
      TextFunctions.rollingHash(TextFunctions.normalize(col("text"))).as("h"))
    shardAssign(docs, shards).select(col("doc_id"), col("shard"))
      .join(content, "doc_id")
      .groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("total_chars"),
        sum("h").cast("long").as("hash_sum"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
  }

  /** Equal-width integer bucketizer: value // width, capped to the
    * 2^bits-1 top bucket. Integer division keeps the key exactly
    * replayable by any engine (a float-range bucketizer would hinge on
    * rounding at bin edges). */
  def intBucket(c: Column, width: Int, bits: Int): Column =
    least(lit((1 << bits) - 1), floor(c / width).cast("long"))

  /** Size-balanced output-shard assignment — the writer-side step that
    * keeps training shards (and their downstream reader tasks) the same
    * byte size: documents ordered by size DESC (doc_id tiebreak) deal
    * onto `shards` shards SERPENTINE-wise (round r left-to-right, round
    * r+1 right-to-left — the boustrophedon variant of LPT scheduling,
    * which cancels the systematic big-end bias plain round-robin keeps),
    * fully deterministic and replayable.
    *
    * Scale shape: the global size rank is DECOMPOSED so no corpus-wide
    * single-partition window exists — per-size-bucket counts (the size
    * codomain is bounded, the t_auc/rfm discipline) take the cumulative
    * window over that tiny bucket table, and the intra-bucket
    * row_number is PARTITIONED by size, i.e. distributed. The bucket
    * table joins back broadcast. */
  def shardAssign(docs: DataFrame, shards: Int, sizeCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val buckets = docs.groupBy(col(sizeCol)).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col(sizeCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets
      .withColumn("_before", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .select(col(sizeCol), col("_before"))
    val wIn = Window.partitionBy(col(sizeCol)).orderBy(col(idCol))
    docs.join(broadcast(cum), sizeCol)
      .withColumn("_rk", col("_before") + row_number().over(wIn) - 1)
      .select(col(idCol),
        when(expr(s"_rk DIV $shards") % 2 === 0, col("_rk") % shards)
          .otherwise(lit(shards - 1) - col("_rk") % shards)
          .cast("int").as("shard"))
  }
}

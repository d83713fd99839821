package graft.ops

import org.apache.spark.sql.Column
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

  /** Equal-width integer bucketizer: value // width, capped to the
    * 2^bits-1 top bucket. Integer division keeps the key exactly
    * replayable by any engine (a float-range bucketizer would hinge on
    * rounding at bin edges). */
  def intBucket(c: Column, width: Int, bits: Int): Column =
    least(lit((1 << bits) - 1), floor(c / width).cast("long"))
}

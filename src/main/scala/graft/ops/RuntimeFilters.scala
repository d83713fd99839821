package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions.{col => toCol, expr => toExpr}

/** Manual runtime-filter join pruning — the pattern Spark's own
  * `InjectRuntimeFilter` rule applies when statistics allow, exposed as an
  * explicit operator for when the optimizer can't prove it (filtered
  * dimension behind a derived column, statistics missing at 100 TB, or a
  * semi-join key produced mid-pipeline).
  *
  * Why it matters at scale: a shuffled semi-join materializes and
  * shuffles the ENTIRE fact side before any pruning happens. Building a
  * bloom filter over the (filtered) dimension keys first costs one tiny
  * aggregate, broadcasts a few MB, and drops non-matching fact rows at
  * the SCAN — before the shuffle — while the exact semi-join afterwards
  * removes the bloom's false positives, so results are bit-identical to
  * the plain semi-join (which is exactly how the oracle replays it).
  */
object RuntimeFilters {

  /** Exact semi-join of `big` to `small`, pre-pruned by a bloom filter
    * over `smallKey`. Result ≡ `big.join(small, bigKey === smallKey,
    * "left_semi")` for ANY bloom sizing — undersizing only raises the
    * false-positive rate the exact join then pays to filter.
    *
    * Uses Spark's native codegen'd bloom expressions (the same kernels
    * `InjectRuntimeFilter` plants), keyed by xxhash64 on both sides.
    */
  def bloomPrunedSemiJoin(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      estimatedItems: Long = 1000000L): DataFrame = {
    val bloom = small.select(toCol(
      new BloomFilterAggregate(new XxHash64(Seq(toExpr(smallKey))),
        Literal(estimatedItems)).toAggregateExpression()).as("_bf"))
    // no distinct(): left_semi already has set semantics, and the dedup
    // would be a full extra exchange over the dimension keys
    val smallKeys = small.select(smallKey.as("_rf_key"))
    // might_contain requires its bloom side to be a constant or a scalar
    // subquery (the exact shape InjectRuntimeFilter plants); the one-row
    // aggregate above becomes that subquery
    val bloomSubquery = ScalarSubquery(bloom.queryExecution.analyzed)
    big.filter(toCol(BloomFilterMightContain(
        bloomSubquery, new XxHash64(Seq(toExpr(bigKey))))))
      .join(smallKeys, bigKey === col("_rf_key"), "left_semi")
  }
}

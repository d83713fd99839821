package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RuntimeFilters

class RuntimeFiltersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "payload")
  private val dim = (1L to 5000L by 50).map(i => (i, s"d$i")).toDF("dk", "attr")

  test("bloomPrunedSemiJoin is row-identical to the plain semi-join") {
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val pruned = RuntimeFilters.bloomPrunedSemiJoin(
      fact, col("k"), dim, col("dk"))
      .as[(Long, Long)].collect().toSet
    assert(pruned === plain)
    assert(pruned.size === 100)
  }

  test("false positives from an undersized bloom are removed by the exact join") {
    // 100 keys crammed into a bloom sized for 10 items -> the might_contain
    // prefilter passes many non-members; the semi-join must drop them all
    val pruned = RuntimeFilters.bloomPrunedSemiJoin(
      fact, col("k"), dim, col("dk"), estimatedItems = 10L)
      .as[(Long, Long)].collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(pruned === plain)
  }

  test("the bloom prefilter sits on the fact side BEFORE the join") {
    val plan = RuntimeFilters.bloomPrunedSemiJoin(
      fact, col("k"), dim, col("dk"))
      .queryExecution.executedPlan.toString
    // might_contain must appear as a Filter in the executed plan (scan-side
    // pruning), not be optimized away
    assert(plan.contains("might_contain"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SkewOps

class SkewOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // skewed fact: 90% of rows share key "hot"
  private val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
    (901 to 1000).map(i => (i.toLong, s"k${i % 7}")))
    .toDF("row_id", "key")
  private val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i * 10) }.toDF("key", "dim_val")

  test("saltedJoin is row-identical to the plain join") {
    val plain = fact.join(dim, "key").select("row_id", "key", "dim_val")
      .collect().toSet
    val salted = SkewOps.saltedJoin(fact, dim, "key", "row_id", buckets = 8)
      .select("row_id", "key", "dim_val").collect().toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("saltedCollectSet equals the direct collect_set") {
    val direct = fact.groupBy("key")
      .agg(array_sort(collect_set(col("row_id"))).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    val salted = SkewOps.saltedCollectSet(fact, "key", "row_id", "row_id", 8)
      .select(col("key"), array_sort(col("row_id_set")).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(salted === direct)
  }
}

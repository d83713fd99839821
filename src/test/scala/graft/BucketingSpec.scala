package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Corpus
import graft.store.Bucketing

/** The 100-TB co-location story must be real, not aspirational: a join
  * between tables bucketed on the join key must plan with ZERO shuffle
  * exchanges. Also covers the JSONL export sink roundtrip. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bucketed nodes ⋈ edges plans with zero exchanges") {
    val nodes = (1L to 200L).map(i => (s"n.$i", s"name$i")).toDF("full_name", "name")
    val edges = (1L to 400L).map(i => (s"n.${i % 200 + 1}", s"n.${i % 50 + 1}"))
      .toDF("src", "dst")
    for (t <- Seq("b_nodes", "b_edges")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(nodes, "b_nodes", "full_name", 4)
    Bucketing.writeBucketed(edges, "b_edges", "src", 4)
    // disable broadcast so the planner exercises the big-big join path —
    // at 100 TB neither side broadcasts, which is the case bucketing is for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "b_edges")
        .join(Bucketing.read(spark, "b_nodes"),
          col("src") === col("full_name"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === 400L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("exportJsonl roundtrips with deterministic shard assignment") {
    val docs = (0L until 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/out"
    Corpus.exportJsonl(docs, dir, shards = 4)
    val back = spark.read.json(dir)
    assert(back.count() === 100L)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ===
      (0L until 100L))
    // 4 part files (hash-sharded), stable across writes
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(parts === 4)
  }
}

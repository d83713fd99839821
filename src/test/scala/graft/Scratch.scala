package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// temporary timing harness for iterative-operator variants (not shipped API)
object Scratch {
  def pageRankNoCkpt(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val e2 = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("cnt")), "src")
      .repartition(col("src")).localCheckpoint(eager = true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .repartition(col("v")).localCheckpoint(eager = true)
    val n = verts.count().toDouble
    var pr = verts.withColumn("pr", round(lit(1.0 / n), 10))
    for (_ <- 1 to iterations) {
      val contrib = e2.join(pr.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(round(sum(col("pr") / col("cnt")), 10).as("s"))
      pr = verts.join(contrib, Seq("v"), "left")
        .select(col("v"),
          round(lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0)), 10).as("pr"))
    }
    pr.select(col("v"), round(col("pr"), 6).as("pagerank"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val hier = graft.store.GraphTables.hierarchy(spark, sfDir)
    hier.count() // materialize cache outside timings
    // warm both variants once
    graft.enrich.Analytics.pageRank(hier, 5).count()
    pageRankNoCkpt(hier, 5).count()
    time("pagerank_ckpt_1")(graft.enrich.Analytics.pageRank(hier, 5).count())
    time("pagerank_nockpt_1")(pageRankNoCkpt(hier, 5).count())
    time("pagerank_ckpt_2")(graft.enrich.Analytics.pageRank(hier, 5).count())
    time("pagerank_nockpt_2")(pageRankNoCkpt(hier, 5).count())
    graft.enrich.Closure.transitiveClosure(hier).count()
    time("closure_1")(graft.enrich.Closure.transitiveClosure(hier).count())
    time("closure_2")(graft.enrich.Closure.transitiveClosure(hier).count())
    spark.stop()
  }
}

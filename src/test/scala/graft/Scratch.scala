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

  // CC variant: one propagation hop + one pointer-jump per materialization
  def ccJump(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).localCheckpoint(eager = true)
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
    def hop(df: DataFrame): DataFrame = {
      val prop = und
        .join(df.select(col("v").as("src"), col("component")), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("component")).as("_nm"))
      df.join(prop, Seq("v"), "left")
        .withColumn("component",
          least(col("component"), coalesce(col("_nm"), col("component"))))
        .drop("_nm")
    }
    def jump(df: DataFrame): DataFrame =
      df.join(df.select(col("v").as("component"), col("component").as("_jc")),
          Seq("component"), "left")
        .withColumn("component", coalesce(col("_jc"), col("component")))
        .drop("_jc")
    var changed = 1L
    var i = 0
    while (i < maxIter && changed > 0) {
      val next = jump(hop(labels.withColumn("_old", col("component"))))
        .localCheckpoint(eager = true)
      changed = next.filter(col("component") =!= col("_old")).count()
      labels = next.drop("_old")
      i += 1
    }
    labels.select(col("v"), col("component"))
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
    // CC: 3-hop loop (shipped) vs hop+pointer-jump
    graft.enrich.Analytics.connectedComponents(hier).count() // warm
    ccJump(hier).count()
    time("cc_3hop_1")(graft.enrich.Analytics.connectedComponents(hier).count())
    time("cc_jump_1")(ccJump(hier).count())
    time("cc_3hop_2")(graft.enrich.Analytics.connectedComponents(hier).count())
    time("cc_jump_2")(ccJump(hier).count())
    // equality of converged state
    val a = graft.enrich.Analytics.connectedComponents(hier)
    val b = ccJump(hier)
    println("SCRATCH cc_equal=" + (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty))
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

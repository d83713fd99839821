package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe for the connected-components loop (Test scope only;
  * run with `Test/runMain graft.CcProbe [sfDir]`). Reports per-round
  * convergence so stride / compression changes can be judged on the
  * actual bench graph instead of guessed. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.store.GraphTables.hierarchy(spark, sfDir)

    // instrumented copy of Analytics.connectedComponents
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).localCheckpoint(eager = true)
    println(s"edges(und)=${und.count()}")
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
    def step(df: DataFrame): DataFrame = {
      val prop = und
        .join(df.select(col("v").as("src"), col("component")), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("component")).as("_nm"))
      df.join(prop, Seq("v"), "left")
        .withColumn("component",
          least(col("component"), coalesce(col("_nm"), col("component"))))
        .drop("_nm")
    }
    // pointer-jumping compression: component := min(component,
    // component-of-component) — doubles the covered distance per round
    def compress(df: DataFrame): DataFrame = {
      val parent = df.select(col("v").as("component"), col("component").as("_pc"))
      df.join(parent, Seq("component"), "left")
        .withColumn("component", least(col("component"), coalesce(col("_pc"), col("component"))))
        .drop("_pc")
    }
    val t0 = System.nanoTime()
    var changed = 1L
    var i = 0
    val mode0 = sys.env.getOrElse("CC_MODE", "plain")
    if (mode0 == "fixed") {
      // oracle-mirror: a FIXED unroll of `CC_HOPS` propagation hops with a
      // mid checkpoint, no convergence counts at all — one (or two) jobs
      // instead of one materialize+count per stride
      val hops = sys.env.getOrElse("CC_HOPS", "10").toInt
      val ckpt = sys.env.getOrElse("CC_CKPT", "5").toInt
      var df = labels
      for (h <- 1 to hops) {
        df = step(df)
        if (h % ckpt == 0 && h < hops) df = df.localCheckpoint(eager = true)
      }
      labels = df.localCheckpoint(eager = true)
      println(f"hops=$hops fixed t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      changed = 0L
    }
    while (i < 20 && changed > 0) {
      val mode = mode0
      val stride = sys.env.getOrElse("CC_STRIDE", "3").toInt
      val stepped = (1 to stride).foldLeft(
        labels.withColumn("_old", col("component")))((df, _) => step(df))
      val next = (if (mode == "jump") compress(stepped) else stepped)
        .localCheckpoint(eager = true)
      changed = next.filter(col("component") =!= col("_old")).count()
      labels = next.drop("_old")
      i += stride
      println(f"hops=$i%2d changed=$changed%7d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2fs")
    // correctness cross-check vs GraphX
    val gx = graft.enrich.Analytics.connectedComponentsGraphX(spark, edges)
    val mismatch = labels.select(col("v"), col("component"))
      .except(gx.select(col("v"), col("component"))).count()
    println(s"mismatch vs GraphX: $mismatch")
  }
}

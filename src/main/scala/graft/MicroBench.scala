package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch microbenchmark for the optimization round: isolates the fixed
  * cost of one job / one AQE stage / one localCheckpoint on this box, so
  * per-query job counts convert to seconds. Not part of the driver
  * contract; safe to delete. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$tag%-52s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms")
    }
    val base32 = spark.range(1000).toDF("id").localCheckpoint(eager = true)
    val base1 = spark.range(1000).toDF("id").coalesce(1)
      .localCheckpoint(eager = true)
    val e32 = spark.range(5000).select(col("id").as("src"),
      (col("id") + 1).as("dst")).repartition(col("src"))
      .localCheckpoint(eager = true)
    val e1 = spark.range(5000).select(col("id").as("src"),
      (col("id") + 1).as("dst")).repartition(2, col("src"))
      .localCheckpoint(eager = true)
    println(s"base32=${base32.rdd.getNumPartitions} base1=${base1.rdd.getNumPartitions} e32=${e32.rdd.getNumPartitions} e1=${e1.rdd.getNumPartitions}")
    def level(e: org.apache.spark.sql.DataFrame,
        f: org.apache.spark.sql.DataFrame, eager: Boolean): Long = {
      val nxt = e.join(f.withColumnRenamed("id", "src"), "src")
        .groupBy("dst").agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = eager)
      nxt.count()
    }
    time("level e32/f32 eager+count", 20) { level(e32, base32, true) }
    time("level e32/f32 lazy+count", 20) { level(e32, base32, false) }
    time("level e2/f1  eager+count", 20) { level(e1, base1, true) }
    time("level e2/f1  lazy+count", 20) { level(e1, base1, false) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("level e2/f1  lazy+count AQEoff", 20) { level(e1, base1, false) }
    time("level e32/f32 lazy+count AQEoff", 20) { level(e32, base32, false) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("count base32 (32 tasks)", 30) { base32.count() }
    time("count base1  (1 task)", 30) { base1.count() }
    time("isEmpty base1", 30) { base1.isEmpty }
    // broadcast-side cost: force broadcast of frontier
    time("level bcast(f1) lazy+count", 20) {
      val nxt = e1.join(broadcast(base1.withColumnRenamed("id", "src")), "src")
        .groupBy("dst").agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = false)
      nxt.count()
    }
    // pure shuffle join, no broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("level e2/f1 lazy+count noBcast", 20) { level(e1, base1, false) }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.stop()
  }
}

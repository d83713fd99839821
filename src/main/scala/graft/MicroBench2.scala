package graft
import org.apache.spark.sql.{SparkSession, DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch A/B for the dsirWeights restructure. Safe to delete. */
object MicroBench2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.store.Tables.documents(spark, sfDir)
    val target = col("source").isin("src0", "src1")
    val buckets = 64

    def feats(d: DataFrame) = d
      .select(col("doc_id"), target.as("is_t"), col("text"))
      .select(col("doc_id"), col("is_t"),
        explode(concat(
          filter(tokens(col("text")), t => length(t) > 0),
          filter(zip_with(tokens(col("text")),
            slice(tokens(col("text")), lit(2),
              greatest(size(tokens(col("text"))) - 1, lit(0))),
            (a, b) => when(b.isNotNull && length(a) > 0 && length(b) > 0,
              concat(a, lit(""), b))), x => x.isNotNull)
        )).as("f"))
      .select(col("doc_id"), col("is_t"),
        pmod(rollingHash(col("f")), lit(buckets.toLong)).as("b"))

    def variantOld(d: DataFrame): DataFrame = {
      val f = feats(d)
      val docB = f.groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).cast("decimal(12,0)").as("n"))
      val srcB = f.groupBy(col("b")).agg(count(lit(1)).as("cs"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      val tots = srcB.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
      val ratio = srcB.crossJoin(broadcast(tots))
        .select(col("b"), round(log((col("ct") + 1).cast("double") /
          (col("tt") + buckets)) - log((col("cs") + 1).cast("double") /
          (col("ts") + buckets)), 6).cast("decimal(18,6)").as("r"))
      docB.join(broadcast(ratio), "b").groupBy(col("doc_id"))
        .agg(round(sum(col("n") * col("r")).cast("double"), 4).as("weight"))
    }

    def variantNew(d: DataFrame): DataFrame = {
      val docTB = feats(d).groupBy(col("doc_id"), col("is_t"), col("b"))
        .agg(count(lit(1)).cast("decimal(12,0)").as("n"))
      val docB = docTB.select(col("doc_id"), col("b"), col("n"))
      val srcB = docTB.groupBy(col("b")).agg(
        sum(col("n").cast("long")).as("cs"),
        sum(when(col("is_t"), col("n").cast("long")).otherwise(0L)).as("ct"))
      val tots = srcB.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
      val ratio = srcB.crossJoin(broadcast(tots))
        .select(col("b"), round(log((col("ct") + 1).cast("double") /
          (col("tt") + buckets)) - log((col("cs") + 1).cast("double") /
          (col("ts") + buckets)), 6).cast("decimal(18,6)").as("r"))
      docB.join(broadcast(ratio), "b").groupBy(col("doc_id"))
        .agg(round(sum(col("n") * col("r")).cast("double"), 4).as("weight"))
    }

    def docTbCkpt(d: DataFrame): DataFrame = {
      val docTB = feats(d).groupBy(col("doc_id"), col("is_t"), col("b"))
        .agg(count(lit(1)).cast("decimal(12,0)").as("n"))
        .localCheckpoint(eager = false)
      val docB = docTB.select(col("doc_id"), col("b"), col("n"))
      val srcB = docTB.groupBy(col("b")).agg(
        sum(col("n").cast("long")).as("cs"),
        sum(when(col("is_t"), col("n").cast("long")).otherwise(0L)).as("ct"))
      val tots = srcB.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
      val ratio = srcB.crossJoin(broadcast(tots))
        .select(col("b"), round(log((col("ct") + 1).cast("double") /
          (col("tt") + buckets)) - log((col("cs") + 1).cast("double") /
          (col("ts") + buckets)), 6).cast("decimal(18,6)").as("r"))
      docB.join(broadcast(ratio), "b").groupBy(col("doc_id"))
        .agg(round(sum(col("n") * col("r")).cast("double"), 4).as("weight"))
    }

    def time(tag: String, n: Int)(f: => Unit): Unit = {
      f
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$tag%-36s min=${ts.min}%6.3f med=${ts.sorted.apply(n / 2)}%6.3f")
    }
    val spreadDocs = graft.ops.Par.spread(
      docs.select(col("doc_id"), col("source"), col("text")))
    time("old shape, no spread", 3) { variantOld(docs).count() }
    time("new docTB, no spread", 3) { variantNew(docs).count() }
    time("old shape, spread", 3) { variantOld(spreadDocs).count() }
    time("new docTB, spread", 3) { variantNew(spreadDocs).count() }
    time("docTB ckpt, spread", 3) { docTbCkpt(spreadDocs).count() }
    time("docTB ckpt, no spread", 3) { docTbCkpt(docs).count() }
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ref(a: Long, b: Long): Long =
    (0 until 8).map(i =>
      (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum

  test("zorderKey matches the reference bit-interleave on random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zorderKey(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) => assert(got((a, b)) === ref(a, b)) }
    assert(ref(0, 0) === 0L && ref(255, 255) === 65535L)
  }

  test("a 2-D box spans a tighter key range under z-order than row-major") {
    // the reason the layout exists: a [0,15]x[0,15] predicate box maps to
    // the contiguous z-range [0, 255] (low nibbles interleave into the
    // low byte), while the row-major key a*256+b spreads the same box
    // across a 15*256+15 span — so min/max row-group stats prune ~15x
    // fewer bytes. This is the clustering guarantee, asserted exactly.
    val box = for (a <- 0L to 15L; b <- 0L to 15L) yield (a, b)
    val zSpan = box.map { case (a, b) => ref(a, b) }.max -
      box.map { case (a, b) => ref(a, b) }.min
    val rowMajorSpan = box.map { case (a, b) => a * 256 + b }.max -
      box.map { case (a, b) => a * 256 + b }.min
    assert(zSpan === 255L)
    assert(rowMajorSpan === 3855L)
    assert(zSpan < rowMajorSpan / 10)
  }

  test("shardAssign: serpentine deal, tight byte balance, deterministic") {
    // sizes 96..1: serpentine over 4 shards — round 0 deals 96..93 to
    // shards 0..3, round 1 deals 92..89 to shards 3..0, and so on
    val docs = (1L to 96L).map(i => (i, (97 - i).toInt))
      .toDF("doc_id", "n_chars")
    val out = Layout.shardAssign(docs, shards = 4)
      .as[(Long, Int)].collect().toMap
    assert(out(1L) === 0 && out(2L) === 1 && out(3L) === 2 && out(4L) === 3)
    assert(out(5L) === 3 && out(6L) === 2 && out(7L) === 1 && out(8L) === 0)
    assert(out(9L) === 0)
    // balance: 96 docs = 12 full up-down rounds, each summing equally
    // per shard — the serpentine deal is EXACTLY balanced
    val bytes = (1L to 96L).map(i => out(i) -> (97 - i))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(bytes.values.toSet.size === 1)
    // ties broken by doc_id: equal sizes deal in id order
    val tied = Seq((10L, 5), (11L, 5), (12L, 5), (13L, 5), (14L, 5))
      .toDF("doc_id", "n_chars")
    val t = Layout.shardAssign(tied, shards = 2)
      .as[(Long, Int)].collect().toMap
    assert(t === Map(10L -> 0, 11L -> 1, 12L -> 1, 13L -> 0, 14L -> 0))
  }

  test("shardManifest: checksum is partitioning/order independent") {
    val docs = (1L to 40L)
      .map(i => (i, s"document body $i", 10 + (i % 7)))
      .toDF("doc_id", "text", "n_chars")
    val m1 = Layout.shardManifest(docs, shards = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // a different physical layout must produce the identical manifest
    val m2 = Layout.shardManifest(docs.repartition(7).sortWithinPartitions(
        org.apache.spark.sql.functions.col("text")), shards = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(m1 === m2)
    assert(m1.map(_._2).sum === 40L)        // every doc in exactly one shard
    // a corrupted doc flips its shard's checksum and no other
    val corrupted = docs.withColumn("text",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") === 17L,
        org.apache.spark.sql.functions.lit("CORRUPTED"))
        .otherwise(org.apache.spark.sql.functions.col("text")))
    val m3 = Layout.shardManifest(corrupted, shards = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(m1.zip(m3).count { case (a, b) => a._4 != b._4 } === 1)
  }
}

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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.pipeline.Similarity

/** The native codegen'd kernels must be value-identical to their portable
  * HOF spellings (which the DuckDB oracle replays). Randomized inputs use
  * a fixed seed — deterministic, but broad coverage. */
class GraftExpressionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def randomTexts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val chars = "abcdefghijklmnopqrstuvwxyzABC0123456789 .,!\t"
    (0 until n).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
  }

  test("RollingHash matches the HOF spec on random strings") {
    val df = randomTexts(42, 300).toDF("s")
      .select(rollingHash(col("s")).as("fast"), rollingHashSpec(col("s")).as("spec"))
    assert(df.filter(col("fast") =!= col("spec")).count() === 0)
  }

  test("RollingHash edge cases: empty, single char, unicode BMP") {
    val rows = Seq("", "a", "Z9", "héllo wörld", "tab\tsep", "  spaces  ")
      .toDF("s")
      .select(col("s"), rollingHash(col("s")).as("fast"), rollingHashSpec(col("s")).as("spec"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), s"for '${r.getString(0)}'"))
  }

  test("ShingleHashes matches the HOF spec for k in 1..6") {
    (1 to 6).foreach { k =>
      val df = randomTexts(k * 100L, 100).toDF("text").select(
        array_sort(shingleHashes(col("text"), k)).as("fast"),
        array_sort(shingleHashesSpec(col("text"), k)).as("spec"))
      assert(df.filter(to_json(col("fast")) =!= to_json(col("spec"))).count() === 0,
        s"k=$k")
    }
  }

  test("ShingleHashes: fewer tokens than k collapses to one whole shingle") {
    val r = Seq("one two").toDF("text")
      .select(shingleHashes(col("text"), 5).as("h"), shingleHashesSpec(col("text"), 5).as("s"))
      .collect()(0)
    assert(r.getSeq[Long](0).length === 1)
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("CdcChunkHashes matches the HOF boundary+slice spelling") {
    import org.apache.spark.sql.graft.{CdcChunkHashes, GraftExpressions}
    // the HOF spelling the kernel replaced (and the DuckDB oracle still
    // replays): positions with trailing-window hash ≡ 0 mod m cut the
    // string; each slice is rolling-hashed
    def spec(window: Int, modulus: Int) = {
      val txt = col("s")
      val len = length(txt)
      val bs = when(len >= window,
          filter(sequence(lit(window), len),
            p => rollingHashSpec(txt.substr(p - window + 1, lit(window)))
              % modulus === 0))
        .otherwise(array().cast("array<int>"))
      val es = when(array_contains(bs, len), bs)
        .otherwise(concat(bs, array(len)))
      transform(sequence(lit(1), size(es)), i => {
        val prev = when(i === 1, 0).otherwise(element_at(es, i - 1))
        rollingHashSpec(txt.substr(prev + 1, element_at(es, i) - prev))
      })
    }
    for ((w, m) <- Seq((8, 64), (4, 16), (1, 2), (16, 8))) {
      val df = (randomTexts(7L * w + m, 150).filter(_.nonEmpty) :+
        "héllo wörld, ünïcode chunks répéat héllo wörld")
        .toDF("s")
        .select(
          GraftExpressions.col(CdcChunkHashes(
            GraftExpressions.expr(col("s")), w, m)).as("fast"),
          spec(w, m).as("spec"))
      assert(df.filter(to_json(col("fast")) =!= to_json(col("spec"))).count() === 0,
        s"window=$w modulus=$m")
    }
  }

  test("CosineSim matches the HOF spec on random float vectors") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 200).map { _ =>
      (Seq.fill(16)(rnd.nextFloat() * 10 - 5), Seq.fill(16)(rnd.nextFloat() * 10 - 5))
    }
    val df = pairs.toDF("a", "b").select(
      Similarity.cosine(col("a"), col("b")).as("fast"),
      Similarity.cosineSpec(col("a"), col("b")).as("spec"))
    assert(df.filter(col("fast") =!= col("spec")).count() === 0)
  }

  test("CosineSim: orthogonal, identical, and zero vectors") {
    val rows = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),   // orthogonal -> 0
      (Seq(1f, 2f), Seq(1f, 2f)),   // identical -> 1
      (Seq(0f, 0f), Seq(1f, 0f)))   // zero norm -> NaN
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(1).getDouble(0) === 1.0)
    assert(rows(2).getDouble(0).isNaN)
  }

  test("codegen and interpreted paths agree (wholestage off)") {
    val data = Seq("the quick brown fox jumps over the lazy dog", "", "a b c")
    val run = (flag: Boolean) => {
      spark.conf.set("spark.sql.codegen.wholeStage", flag)
      try {
        val docs = data.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val sigs = graft.pipeline.Dedup.minhashSignatures(docs, 2, 8)
          .join(graft.pipeline.Dedup.simhashSignatures(docs), "doc_id")
        data.toDF("text")
          .select(rollingHash(col("text")), shingleHashes(col("text"), 2))
          .collect().map(_.toString).toSeq ++
          sigs.orderBy("doc_id").collect().map(_.toString).toSeq
      } finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    assert(run(true) === run(false))
  }

  test("HilbertIndex: bijective and every consecutive key grid-adjacent") {
    import org.apache.spark.sql.graft.HilbertIndex
    val bits = 4
    val n = 1 << bits // full 16×16 grid
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertIndex.index(x, y, bits), (x, y))
    val byD = cells.toMap
    assert(byD.size === n * n)                       // bijection
    assert(cells.map(_._1).min === 0L && cells.map(_._1).max === (n * n - 1))
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"d=$d: ($x1,$y1) -> ($x2,$y2) not adjacent") // the Hilbert property
    }
    // the codegen'd expression evaluates the same walk
    val df = Seq((3L, 5L), (200L, 17L), (0L, 0L)).toDF("a", "b")
      .select(graft.ops.Layout.hilbertKey(col("a"), col("b"), 8).as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(HilbertIndex.index(3, 5, 8), HilbertIndex.index(200, 17, 8),
        HilbertIndex.index(0, 0, 8)))
  }
}

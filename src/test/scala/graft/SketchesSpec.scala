package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.pipeline.{Dedup, Sketches}

class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cmsTopK: every estimate ≥ the exact count (the CM guarantee), " +
    "and the skewed head is found exactly") {
    // "alpha" dominates; long tail of distinct terms forces collisions
    val docs = (
      Seq.fill(40)("alpha beta") ++ Seq.fill(15)("gamma") ++
        (1 to 200).map(i => s"tail$i word$i")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val top = Sketches.cmsTopK(docs, TextFunctions.tokens(col("text")),
      width = 64, k = 250).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CM never underestimates — for every term that made the cut
    top.foreach { case (term, est) => assert(est >= exact(term),
      s"$term: est $est < exact ${exact(term)}") }
    // the heavy hitter's estimate is sane and it ranks first
    val first = Sketches.cmsTopK(docs, TextFunctions.tokens(col("text")),
      width = 64, k = 1).collect().head
    assert(Set("alpha", "beta").contains(first.getString(0))) // both count 40
    assert(first.getLong(1) >= 40L)
  }

  test("incremental dedup: base-seen content drops, batch keeps first-seen") {
    val base = Seq((0L, "shared doc"), (2L, "base only")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "shared doc"),   // already in base -> dropped
      (3L, "new content"), (5L, "new content"), // batch dup -> one keeper
      (7L, "fresh")).toDF("doc_id", "text")
    val out = Dedup.incremental(base, batch)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((3L, 2L), (7L, 1L)))
  }

  test("hllDistinct: within the m=16 error regime; duplicate-invariant") {
    import graft.pipeline.Sketches
    val n = 1000
    val vals = (1 to n).map(i => s"value-$i-${i * 7}")
    val df = vals.toDF("v")
    val est = Sketches.hllDistinct(df, col("v")).collect()(0)
    val e = est.getDouble(3)
    // m=16 raw HLL: relative stddev ~1.04/sqrt(16) = 26%; allow 3 sigma
    assert(math.abs(e - n) / n < 0.8, s"est $e too far from $n")
    // cardinality estimate must ignore duplicates entirely
    val dup = (vals ++ vals ++ vals).toDF("v")
    val est2 = Sketches.hllDistinct(dup, col("v")).collect()(0)
    assert(est2.getDouble(3) === e)
    assert(est2.getLong(1) === est.getLong(1)) // identical registers
  }

  test("hllDistinct: linear-counting correction makes n≈m estimates " +
      "accurate (raw estimator alone is biased high at small n)") {
    import graft.pipeline.Sketches
    // small-n regime: n near m = 16 — the raw estimator's bias zone
    for (n <- Seq(1, 4, 10, 16)) {
      val df = (1 to n).map(i => s"item-$i-${i * 13}").toDF("v")
      val row = Sketches.hllDistinct(df, col("v")).collect()(0)
      val v = row.getInt(2) // zero_regs
      val e = row.getDouble(3)
      // the in-plan estimate must be the linear-counting value
      // (V > 0 is guaranteed at n ≤ m: at most n registers are hit)
      val expected = BigDecimal(16.0 * math.log(16.0 / v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(e === expected, s"n=$n: expected lc $expected, got $e")
      // and it must actually be accurate: |est − n| within ~2·sqrt(m)
      assert(math.abs(e - n) <= 8, s"n=$n: lc estimate $e off by > 8")
      // matches the pure-Scala executable spec (streaming shares it)
      val regs = Array.fill(16)(0)
      (1 to n).map(i => s"item-$i-${i * 13}").foreach { s =>
        val h = Sketches.rollingHashScala(s)
        val w = (h * 1103515245L + 12345L) % Sketches.P
        val rho = if (w == 0) 32 else 32 - java.lang.Long.toBinaryString(w).length
        val b = (h % 16).toInt
        regs(b) = math.max(regs(b), rho)
      }
      val (ss, es) = Sketches.hllEstimateSpec(regs.toSeq)
      assert(ss === row.getLong(1) && es === e,
        s"n=$n: spec ($ss, $es) != plan (${row.getLong(1)}, $e)")
    }
  }

  test("r14 amsF2: counters replay the executable spec, a single-token " +
      "stream estimates F2 exactly, and counters merge by addition") {
    def run(vals: Seq[String]) = Sketches.amsF2(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("i", "term"), col("term"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // arbitrary skewed corpus: engine rows == the pure-Scala fold
    val vals = Seq.fill(30)("alpha") ++ Seq.fill(10)("beta") ++
      (1 to 25).map(i => s"tail$i")
    val out = run(vals)
    val (zs, exact) = Sketches.amsF2Spec(vals)
    assert(out.filter(_._1 > 0).map(r => (r._1, r._2)) === zs.sortBy(_._1))
    // the median row is the 5th-smallest z²
    val med = out.filter(_._1 > 0).map(_._3).sorted.apply(4)
    assert(out.head === ((0, med, med)))
    // single-token stream: every Z = ±n so EVERY estimator reads n² = F2
    val mono = run(Seq.fill(17)("only"))
    assert(mono.forall(_._3 === 17L * 17L))
    assert(exact === vals.groupBy(identity).values
      .map(g => g.size.toLong * g.size).sum) // spec self-check
    // mergeability: Z(front ++ back) = Z(front) + Z(back), per estimator
    val (front, back) = vals.splitAt(13)
    val (zf, _) = Sketches.amsF2Spec(front)
    val (zb, _) = Sketches.amsF2Spec(back)
    assert(zs === zf.zip(zb).map { case ((j, a), (_, b)) => (j, a + b) })
  }
}

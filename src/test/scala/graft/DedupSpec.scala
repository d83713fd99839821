package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cdcChunks: boundaries move with content — an insertion keeps " +
    "downstream chunks shared") {
    // long enough to cut into several chunks at modulus=16
    val a = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight ") * 4
    val b = "INSERTED PREFIX >>> " + a      // shifted by 20 chars
    val c = "totally unrelated content with no shared chunks at all"
    val out = graft.pipeline.Dedup.cdcChunks(
      Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"),
      window = 8, modulus = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // both versions split into several chunks
    assert(out(1L)._1 > 3 && out(2L)._1 > 3)
    // hash-derived boundaries re-align after the insertion: most of the
    // shifted doc's chunks still match the original (fixed-size blocks
    // would share none)
    assert(out(2L)._3 > 0.5, s"expected re-aligned chunks, got ${out(2L)}")
    assert(out(1L)._2 > 0)
    // the unrelated doc shares nothing
    assert(out(3L)._2 === 0L && out(3L)._3 === 0.0)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),     // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "THE QUICK  brown fox, jumps over the lazy dog!")   // normalizes to 1
  ).toDF("doc_id", "text")

  test("exact: normalization-equal docs share a group, keeper is min id") {
    val out = Dedup.exact(docs).collect()
    val big = out.filter(_.getLong(2) == 3L) // group {1,2,5}
    assert(big.length === 1)
    assert(big(0).getLong(1) === 1L) // keeper_id
    assert(out.map(_.getLong(2)).sum === 5L)
  }

  test("minhashSignatures equals the per-row expression spelling") {
    val agg = Dedup.minhashSignatures(docs, k = 2, numHashes = 8)
    val row = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 2, 8).as("sig"))
    assert(agg.as("a").join(row.as("r"), "doc_id")
      .filter(to_json(col("a.sig")) =!= to_json(col("r.sig"))).count() === 0)
  }

  test("identical docs have identical minhash signatures; est_jaccard 1.0") {
    val pairs = Dedup.minhashLshPairs(docs, k = 2, numHashes = 8, bands = 4,
      threshold = 0.0).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined && p12.get.getDouble(2) === 1.0)
    val p15 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 5L)
    assert(p15.isDefined && p15.get.getDouble(2) === 1.0)
  }

  test("simhashSignatures equals the per-row expression spelling") {
    val agg = Dedup.simhashSignatures(docs)
    val row = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    assert(agg.as("a").join(row.as("r"), "doc_id")
      .filter(col("a.sig") =!= col("r.sig")).count() === 0)
  }

  test("simhashPairs: exact dups at hamming 0, near dup within threshold") {
    val out = Dedup.simhashPairs(docs, maxHamming = 16).collect()
    val p12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined && p12.get.getLong(2) === 0L)
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
  }

  test("ngramJaccardPairs: dup pair at 1.0, near pair high, distinct absent") {
    val out = Dedup.ngramJaccardPairs(docs, k = 2, threshold = 0.3).collect()
    val j12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(j12.isDefined && j12.get.getDouble(2) === 1.0)
    val j13 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(j13.isDefined && j13.get.getDouble(2) > 0.5)
    assert(!out.exists(r => r.getLong(1) == 4L || r.getLong(0) == 4L))
  }

  test("containmentPairs: embedded doc at 1.0 where Jaccard misses it") {
    // doc 2 is a strict prefix of the much longer doc 1 — containment 1,
    // Jaccard low; doc 3 shares nothing
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 8).map(i => s"w$i").mkString(" ")
    val cd = Seq((1L, words), (2L, prefix),
      (3L, (1 to 10).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(cd, k = 2, threshold = 0.9).collect()
    assert(out.length === 1)
    val r = out.head
    // (a=1, b=2): containment 1.0, the smaller doc 2 is the contained one
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      === ((1L, 2L, 1.0, 2L)))
    // the same pair under a same-threshold JACCARD rule is invisible:
    // 7 shared 2-shingles / 39-union ≈ 0.18
    val jac = Dedup.ngramJaccardPairs(cd, k = 2, threshold = 0.9).collect()
    assert(jac.isEmpty)
  }

  test("duplicatedSpanStats: partial overlap shows in the span fraction") {
    val docs = Seq(
      (1L, "a b c d e f"),      // shingles(k=2): ab bc cd de ef (5)
      (2L, "a b c x y"),        // ab bc cx xy (4); shares ab, bc with doc 1
      (3L, "p q r s")           // disjoint
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, k = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 5L, 2L, 0.4)))    // ab, bc duplicated
    assert(out(2L) === ((2L, 4L, 2L, 0.5)))
    assert(out(3L) === ((3L, 3L, 0L, 0.0)))
  }

  test("removeDuplicatedSpans cuts later copies, keeps the first, merges overlaps") {
    val docs = Seq(
      (1L, "a b c d e f"),   // first occurrence of every window it has
      (2L, "x a b c d y"),   // copies spans "a b c" and "b c d" (k=3):
                             // overlapping drops must merge to cut a..d
      (3L, "p q r s"),       // untouched
      (4L, "a b c")          // whole doc duplicated -> everything cut
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 holds every first occurrence ((1,pos) < (2,pos), (4,pos))
    assert(out(1L) === ((1L, 6L, 0L, "a b c d e f")))
    // doc 2: windows "a b c"@1 and "b c d"@2 duplicate doc 1's -> tokens
    // 1..4 cut (coverage of two overlapping spans), x and y survive
    assert(out(2L) === ((2L, 6L, 4L, "x y")))
    assert(out(3L) === ((3L, 4L, 0L, "p q r s")))
    assert(out(4L) === ((4L, 3L, 3L, "")))
  }

  test("fuzzyJoin links each query to its best catalog match only") {
    val catalog = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (20L, "an entirely different catalog record about spark engines"),
      (30L, "the quick brown fox jumps over the lazy dog at noon"))
      .toDF("doc_id", "text")
    val queries = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // == 10
      (2L, "completely unrelated text with no shared shingles here now"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyJoin(queries, catalog, k = 3, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // query 1 matches BOTH fox docs but keeps only the better (exact) one
    assert(out(1L)._1 === 10L && out(1L)._2 === 1.0)
    assert(!out.contains(2L)) // below threshold -> no forced match
  }

  test("bloomDedup: no false negatives; positives re-checked exactly") {
    val base = Seq((0L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = (Seq((1L, "alpha beta gamma"),    // true dup
      (3L, "completely novel text here")) ++      // novel
      (5L to 199L by 2).map(i => (i, s"filler document number $i")))
      .toDF("doc_id", "text")
    val out = Dedup.bloomDedup(base, batch, mBits = 64) // tiny m: force FPs
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(out(1L) === ((1, 1)))
    assert(out(3L)._2 === 0)
    // the one-sided invariant: every true dup is Bloom-positive
    out.values.foreach { case (maybe, truth) =>
      if (truth == 1) assert(maybe === 1) }
    // with m=64 bits and 98 novel docs, SOME false positive must exist
    assert(out.values.exists { case (maybe, truth) =>
      maybe == 1 && truth == 0 })
  }

  test("softDedupWeights: 1/cluster-size ppm, singletons keep 1.0") {
    val dup = "the quick brown fox jumps over the lazy dog again today"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),  // one 3-cluster
      (4L, "completely different text with no shared shingles at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, k = 3, numHashes = 16,
        bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    Seq(1L, 2L, 3L).foreach(i =>
      assert(out(i) === ((1L, 3L, 333333L))))
    assert(out(4L) === ((4L, 1L, 1000000L)))
    // cluster mass: 3 docs x 1/3 ≈ one document's worth
  }
}

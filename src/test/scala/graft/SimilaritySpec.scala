package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 4-dim corpus with known geometry
  private val emb = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)),  // closest to 0
    (2L, Seq(0f, 1f, 0f, 0f)),      // orthogonal to 0
    (3L, Seq(-1f, 0f, 0f, 0f)),     // opposite of 0
    (4L, Seq(0.8f, 0.2f, 0f, 0f))   // second closest to 0
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc with vec_id tie-break") {
    val out = Similarity.bruteForceTopK(emb, Seq(0L), 3).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 4L, 2L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2, 3))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("bruteForceTopK excludes the query itself") {
    val out = Similarity.bruteForceTopK(emb, Seq(0L), 10).collect()
    assert(!out.exists(_.getLong(1) == 0L))
  }

  test("lshTopK returns banded-bucket neighbors ranked like brute force") {
    val bf = Similarity.bruteForceTopK(emb, Seq(0L), 10)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val out = Similarity.lshTopK(emb, Seq(0L), 10, numPlanes = 2, bands = 2).collect()
    // every LSH hit must carry the same cosine as brute force; ranks are
    // contiguous from 1
    out.foreach(r => assert(bf(r.getLong(1)) === r.getDouble(2)))
    assert(out.map(_.getInt(3)).sorted.toSeq === (1 to out.length).toSeq)
  }

  test("mmrTopK: the redundant twin loses to the diverse candidate") {
    // 1 and 2 are near-identical twins at cos 0.9 from the query; 3 is a
    // DIVERSE candidate at cos 0.85 but only 0.55 from 1. Plain top-2
    // keeps both twins; MMR's 0.3·max-sim penalty swaps the second twin
    // (0.7·0.9 − 0.3·1 = 0.33) for the diverse 3 (0.7·0.85 − 0.3·0.55 =
    // 0.43).
    val diverse = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.9f, 0.4359f, 0f, 0f)),
      (2L, Seq(0.9f, 0.4359f, 0.001f, 0f)),
      (3L, Seq(0.85f, -0.493f, 0.1857f, 0f)),
      (4L, Seq(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(diverse, Seq(0L), 2)
      .collect().map(_.getLong(1)).toSeq
    assert(brute === Seq(1L, 2L))
    val mmr = Similarity.mmrTopK(diverse, 0L, k = 2, candidates = 10)
      .orderBy("rank").collect()
    assert(mmr.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(mmr.map(_.getInt(2)).toSeq === Seq(1, 2))
    // scores are the rounded MMR objective, strictly ordered here
    assert(mmr(0).getDouble(1) > mmr(1).getDouble(1))
    // deterministic
    val again = Similarity.mmrTopK(diverse, 0L, k = 2, candidates = 10)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(again === Seq(1L, 3L))
  }

  test("lshTopK candidate union over bands never duplicates a pair") {
    val out = Similarity.lshTopK(emb, Seq(0L, 2L), 10, numPlanes = 4, bands = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out.distinct === out)
  }

  test("embeddingNearDupPairs finds the near-identical pair, a<b") {
    val out = Similarity.embeddingNearDupPairs(emb, threshold = 0.95,
      numPlanes = 2, bands = 2).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    // opposite vectors never pass the threshold
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("embeddingNearDupPairs bucket cap drops hub buckets") {
    // with maxBucket=1 every (band,bucket) of size >= 2 is dropped -> no pairs
    val out = Similarity.embeddingNearDupPairs(emb, threshold = 0.0,
      numPlanes = 2, bands = 2, maxBucket = 1).collect()
    assert(out.isEmpty)
  }

  test("semDedup drops the higher id of a tau-close cluster pair, keeps the rest") {
    // nlist=2: the two lowest-rolling-hash seeds partition the corpus;
    // 0/1/4 are mutually ~parallel, 2 orthogonal, 3 antipodal
    val out = Similarity.semDedup(emb, tau = 0.95, nlist = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.size === 5)                       // every vector reported
    assert(out(0L) === 1)                        // lowest id always kept
    // 0 and 1 are 0.9939-similar: if they share a cell, 1 is dropped
    val cells = Similarity.semDedup(emb, tau = 0.95, nlist = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (cells(0L) == cells(1L)) assert(out(1L) === 0)
    // the opposite vector is never anyone's near-dup
    assert(out(3L) === 1)
  }

  test("semDedup maxCell cap: an oversize cell generates no drops") {
    val out = Similarity.semDedup(emb, tau = 0.0, nlist = 1, maxCell = 2)
      .collect().map(_.getInt(2))
    // one cell of 5 > maxCell=2 -> excluded from pair generation, all kept
    assert(out.forall(_ == 1))
  }

  test("ivfTopK: probed-cell candidates ranked like brute force") {
    // nlist=3 -> 3 hash-selected centroids; every vector assigned to one
    // cell; with nprobe covering all cells, results equal brute force
    val bf = Similarity.bruteForceTopK(emb, Seq(0L), 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val ivf = Similarity.ivfTopK(emb, Seq(0L), 10, nlist = 3, nprobe = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(ivf === bf)
    // tighter probe -> subset of brute force, ranks contiguous
    val narrow = Similarity.ivfTopK(emb, Seq(0L), 10, nlist = 3, nprobe = 1)
      .collect()
    assert(narrow.map(r => (r.getLong(1), r.getDouble(2))).toSet.subsetOf(bf.toSet))
    assert(narrow.map(_.getInt(3)).sorted.toSeq === (1 to narrow.length).toSeq)
  }

  test("centroidSeeds: seed count is FIXED regardless of corpus size") {
    // the 100 TB contract: |centroids| = nlist, independent of n — a
    // corpus 4x the size must still yield exactly nlist seeds (the
    // round-9 modulo rule grew the set linearly with n)
    val big = (0L until 200L).map(i => (i, Seq(i.toFloat, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val bigger = (0L until 800L).map(i => (i, Seq(i.toFloat, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.centroidSeeds(big, 16).count() === 16L)
    assert(Similarity.centroidSeeds(bigger, 16).count() === 16L)
    // deterministic: the selection replays identically
    val s1 = Similarity.centroidSeeds(big, 16).select("cid")
      .as[Long].collect().toSet
    val s2 = Similarity.centroidSeeds(big, 16).select("cid")
      .as[Long].collect().toSet
    assert(s1 === s2)
    // a corpus smaller than nlist yields the whole corpus
    assert(Similarity.centroidSeeds(emb, 16).count() === 5L)
  }

  test("lshBucket is deterministic and engine-portable") {
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), 4, 4).as("b"))
      .as[Long].collect().toSeq
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), 4, 4).as("b"))
      .as[Long].collect().toSeq
    assert(b1 === b2)
    assert(b1.forall(b => b >= 0 && b < 16))
  }

  test("knnGraph: mutual rule prunes one-way edges, noise stays isolated") {
    // one cell (nlist=1): the {0,1,4} cluster forms a mutual triangle at
    // k=2; 2 and 4 are NOT mutual (2 ranks 4 first, 4 prefers 0 and 1)
    val g = Similarity.knnGraph(emb, k = 2, nlist = 1)
      .as[(Long, Long, Double)].collect()
    assert(g.map(r => (r._1, r._2)).toSet ===
      Set((0L, 1L), (0L, 4L), (1L, 4L)))
    // canonical orientation and symmetric sims
    assert(g.forall(r => r._1 < r._2))
    assert(g.find(r => (r._1, r._2) == ((0L, 1L))).get._3 === 0.9939)
    // k=1 keeps only the single strongest reciprocal pair
    val g1 = Similarity.knnGraph(emb, k = 1, nlist = 1)
      .as[(Long, Long, Double)].collect()
    assert(g1.map(r => (r._1, r._2)).toSet === Set((0L, 1L)))
  }

  test("graphAnnTopK: beam search clears the recall floor, deterministic") {
    import TestSpark.spark
    val corpus = graft.store.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.bruteForceTopK(corpus, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val gann = Similarity.graphAnnTopK(corpus, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = qs.map(q =>
      gann.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size / 10.0)
    // measured 0.80 mean with cell-local entries (0.18 with a global
    // entry — the regression this floor exists to catch)
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean recall ${recalls.sum / recalls.size} under the 0.6 floor")
    val again = Similarity.graphAnnTopK(corpus, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    val first = Similarity.graphAnnTopK(corpus, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    assert(again === first)
  }

  test("ANN recall@10 vs brute force on sf0.01 embeddings (quality floor)") {
    // The LSH/IVF oracles replay the identical banding in SQL, so
    // CORRECTNESS proves determinism, not retrieval quality. This is the
    // quality gate: recall@10 against the exact scan must clear a floor.
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, qs, 10))
    def recall(approx: Map[Long, Set[Long]]): Double =
      qs.map(q => (approx.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
        .sum / qs.size
    // 16/4/probe-0 is the oracle-equivalence config (cheap, selective);
    // 32/8 with Hamming-1 multiprobe is the recall-oriented config a
    // retrieval deployment would run.
    val lshFast = recall(topSets(Similarity.lshTopK(emb, qs, 10, 16, 4)))
    val lshR = recall(topSets(Similarity.lshTopK(emb, qs, 10, 32, 8, probes = 1)))
    val ivfR = recall(topSets(Similarity.ivfTopK(emb, qs, 10)))
    // r14: the 1-bit shortlist — 64 sign bits stand in for 64 floats
    val bqR = recall(topSets(Similarity.bqTopK(emb, qs, 10, shortlist = 50)))
    info(f"recall@10: lsh(16/4)=$lshFast%.2f lsh(32/8,mp1)=$lshR%.2f " +
      f"ivf=$ivfR%.2f bq(50)=$bqR%.2f")
    assert(lshR >= 0.6, f"LSH(32/8,mp1) recall@10 $lshR%.2f below 0.6 floor")
    assert(ivfR >= 0.6, f"IVF recall@10 $ivfR%.2f below 0.6 floor")
    assert(bqR >= 0.6, f"BQ(shortlist 50) recall@10 $bqR%.2f below 0.6 floor")
  }

  test("r13 incremental refresh: ivfIndexRefresh / pqEncodeRefresh " +
      "provably equal the full re-derivation against the same model") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val prevCorpus = emb.filter(col("vec_id") % 50 =!= 0)
    val cents = Similarity.centroidSeeds(prevCorpus, 16)
    // IVF: prev index + delta assignment == whole-corpus assignment
    val prevIdx = Similarity.assignCellsTo(prevCorpus, cents)
    val refreshed = Similarity.ivfIndexRefresh(prevIdx, emb, cents)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    val full = Similarity.assignCellsTo(emb, cents)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(refreshed === full)
    // PQ: prev codes + delta encode == whole-corpus encode
    val books = Similarity.pqTrain(prevCorpus)
    val prevEnc = Similarity.pqEncode(prevCorpus, books)
    val encRef = Similarity.pqEncodeRefresh(prevEnc, emb, books)
      .select("sub", "vec_id", "code").as[(Int, Long, Long)]
      .collect().toSet
    val encFull = Similarity.pqEncode(emb, books)
      .select("sub", "vec_id", "code").as[(Int, Long, Long)]
      .collect().toSet
    assert(encRef === encFull)
    // the refresh only ever touches the delta: no prev row re-assigned
    assert(refreshed.keySet.count(_ % 50 == 0) > 0)
  }

  test("ivfPqTopK: composed cell-prune + ADC clears the recall floor") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, qs, 10))
    val ivfpq = topSets(Similarity.ivfPqTopK(emb, qs, 10))
    val recall = qs
      .map(q => (ivfpq.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
      .sum / qs.size
    info(f"IVF-PQ recall@10 = $recall%.2f")
    // two stacked prunings (8 probed cells, then coarse 16-dim codes)
    // lose more than either alone — the composition must still recover
    // a meaningful fraction before the exact re-rank
    assert(recall >= 0.4, f"IVF-PQ recall@10 $recall%.2f below 0.4 floor")
  }

  test("pqTopK: ADC shortlist + exact re-rank clears the recall floor") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, qs, 10))
    val pq = topSets(Similarity.pqTopK(emb, qs, 10, shortlist = 100))
    val recall = qs.map(q => (pq.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
      .sum / qs.size
    info(f"PQ recall@10 = $recall%.2f")
    // 16-dim sub-codes with ~20-centroid books are COARSE at toy corpus
    // size (the mechanism is the point); the wide shortlist + exact
    // re-rank must still recover a meaningful fraction
    assert(recall >= 0.4, f"PQ recall@10 $recall%.2f below 0.4 floor")
  }

  test("sqTopK: quantized shortlist + exact re-rank tracks brute force") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, qs, 10))
    val sq = topSets(Similarity.sqTopK(emb, qs, 10, shortlist = 30))
    val recall = qs.map(q => (sq.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
      .sum / qs.size
    info(f"SQ8 recall@10 = $recall%.2f")
    // int8 quantization barely perturbs a 64-dim cosine ranking; with a
    // 3x shortlist the re-rank should recover nearly everything
    assert(recall >= 0.8, f"SQ8 recall@10 $recall%.2f below 0.8 floor")
  }

  test("lshSignature kernel is bit-identical to the HOF spec") {
    val both = emb.select(
      Similarity.lshSignature(col("embedding"), 16).as("k"),
      Similarity.lshBucket(col("embedding"), 16, 4).as("h"))
      .as[(Long, Long)].collect()
    both.foreach { case (k, h) => assert(k === h) }
  }

  test("mrlTopK: prefix-shortlist funnel clears the recall floor") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, qs, 10))
    val mrl = topSets(Similarity.mrlTopK(emb, qs, 10))
    val recall = qs
      .map(q => (mrl.getOrElse(q, Set.empty) & exact(q)).size / 10.0)
      .sum / qs.size
    info(f"MRL recall@10 = $recall%.2f")
    // a 32-of-64-dim coarse pass over a top-100 shortlist keeps most
    // of the exact top-10 on these embeddings (0.88 measured)
    assert(recall >= 0.7, f"MRL recall@10 $recall%.2f below 0.7 floor")
  }

  test("r13 kmeansParInit: oversampled candidates cover, weights " +
      "partition the corpus, exactly k picks, deterministic") {
    val d = "/root/testdata/sf0.01"
    assume(new java.io.File(d).isDirectory)
    val emb = graft.store.Tables.embeddings(TestSpark.spark, d)
    val out = Similarity.kmeansParInit(emb, k = 8, l = 8, rounds = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    // more candidates than k (the oversampling point), exactly k picked
    assert(out.length > 8)
    assert(out.count(_._3 >= 0) === 8)
    assert(out.filter(_._3 >= 0).map(_._3).sorted.toSeq === (0 until 8))
    // cell weights partition the whole corpus
    assert(out.map(_._2).sum === emb.count())
    // pick 0 is the heaviest cell (weighted greedy's start rule)
    val maxW = out.map(_._2).max
    assert(out.find(_._3 == 0).get._2 === maxW)
    // deterministic: bit-identical on re-run
    val again = Similarity.kmeansParInit(emb, k = 8, l = 8, rounds = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(again.toSeq === out.toSeq)
  }

  test("r14 knnGraphRefresh: delta-cell rebuild + untouched-cell splice " +
      "equals the whole-corpus build; an empty delta is the identity") {
    // a spread corpus: two rough directions so the 3 seed centroids
    // split it into multiple cells
    val base = (0L until 40L).map { i =>
      val a = (i % 7).toFloat / 7f
      (i, Seq(1f - a, a, (i % 3).toFloat / 3f, 0.1f))
    }
    val delta = (100L until 106L).map { i =>
      val a = (i % 5).toFloat / 5f
      (i, Seq(a, 1f - a, 0.2f, (i % 2).toFloat))
    }
    val baseDf = base.toDF("vec_id", "embedding")
    val fullDf = (base ++ delta).toDF("vec_id", "embedding")
    val cents = Similarity.centroidSeeds(baseDf, nlist = 3)
      .localCheckpoint(eager = true)
    val prev = Similarity.knnGraphWith(baseDf, cents, k = 3)
      .localCheckpoint(eager = true)
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val refreshed = Similarity.knnGraphRefresh(prev, fullDf, cents,
      col("vec_id") >= 100L, k = 3)
    val full = Similarity.knnGraphWith(fullDf, cents, k = 3)
    assert(edgeSet(refreshed) === edgeSet(full))
    // no delta → the persisted graph comes back verbatim
    val noop = Similarity.knnGraphRefresh(prev, baseDf, cents,
      lit(false), k = 3)
    assert(edgeSet(noop) === edgeSet(prev))
  }

  test("kCenterSelect: farthest-first order and round-4 coverage sims") {
    // 1=(1,0) seeds (min id); 2=(0,1) is orthogonal (sim 0) so picked
    // next; 4=(.7,.7) sits at 0.7071 from both; 3≈(1,0) is near-dup of
    // the seed and must come LAST despite its small id.
    val e = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 0.01f)), (4L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterSelect(e, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)))).sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 4L, 3L))
    assert(out(0)._3 === None)
    assert(out(1)._3 === Some(0.0))
    assert(out(2)._3 === Some(0.7071))
  }
  test("dominantComponent: recovers a planted dominant direction " +
      "(|cosine| with the plant > 0.95) and is deterministic") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // plant: direction d = (1, 1, 0, …, 0)/√2 with ±large coefficients,
    // plus small per-dim noise — the top PC must align with d
    val dim = 64
    val rows = (0 until 200).map { i =>
      val coef = if (i % 2 == 0) 5.0 else -5.0
      val arr = Array.tabulate(dim) { j =>
        val noise = (((i * 31 + j * 17) % 13) - 6) * 0.02
        val planted = if (j < 2) coef / math.sqrt(2) else 0.0
        (planted + noise).toFloat
      }
      Row(i.toLong, arr.toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val w = Similarity.dominantComponent(emb, iterations = 4)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val plant = Array.tabulate(dim)(j =>
      if (j < 2) 1.0 / math.sqrt(2) else 0.0)
    val dot = w.zip(plant).map { case (a, b) => a * b }.sum
    val nw = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(dot / nw) > 0.95,
      s"top PC misaligned: |cos| = ${math.abs(dot / nw)}")
    // deterministic: a second run is bit-identical
    val w2 = Similarity.dominantComponent(emb, iterations = 4)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(w.toSeq === w2.toSeq)
  }

}

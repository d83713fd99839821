package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline, over a
  * documents(doc_id, text, ...) table.
  *
  * Scale posture: every variant avoids the O(n²) cross join —
  *  - exact: one shuffle on the content fingerprint;
  *  - n-gram Jaccard: inverted-index self-join on shingle hash (only
  *    docs sharing a shingle ever meet), with a low-frequency filter to
  *    kill hub shingles;
  *  - MinHash/LSH: candidates only from shared (band, band-signature)
  *    buckets — shuffle is O(n·bands), verification only on candidates;
  *  - SimHash: candidates from shared 16-bit sub-bands of the signature.
  */
object Dedup {

  /** Exact dedup: group by md5(normalized text); keeper = min doc_id.
    * One hash-shuffle; partial aggregation map-side. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Pairs (a,b), a<b, with n-gram Jaccard ≥ threshold, via an inverted
    * index on shingle hashes. `maxDocFreq` drops shingles appearing in
    * more than that many docs (hub/stopword shingles) — bounds the
    * candidate blow-up at scale while keeping recall for near-dups. */
  def ngramJaccardPairs(docs: DataFrame, k: Int, threshold: Double,
      maxDocFreq: Int = 1000): DataFrame = {
    val sh = docs.select(col("doc_id"),
      shingleHashes(col("text"), k).as("hashes"))
    val sizes = sh.select(col("doc_id"), size(col("hashes")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("hashes")).as("h"))
    val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
    val invR = inv.join(rare.select("h"), "h")
    val common = invR.as("x").join(invR.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` permutations i,
    * min over shingle hashes h of (a_i*h + b_i) mod p. The (a_i, b_i)
    * are fixed odd/prime-ish constants so the oracle can replay them. */
  def minhashCoefs(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map(i => (2L * i + 1L, 104729L * i % HashP))

  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val hs = shingleHashes(text, k)
    val sig = minhashCoefs(numHashes).map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % HashP))
    }
    array(sig: _*)
  }

  /** LSH candidate pairs from banded minhash signatures: docs agreeing on
    * all rows of any band collide. Returns (a, b, est_jaccard) where
    * est = fraction of matching signature positions, rounded. */
  def minhashLshPairs(docs: DataFrame, k: Int, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sig = docs.select(col("doc_id"),
      minhashSignature(col("text"), k, numHashes).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(slice(col("sig"), b * rows + 1, lit(rows)), "_"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("siga"), col("y.sig").as("sigb"))
      .dropDuplicates("a", "b")
    cand.withColumn("est_jaccard",
        round(size(filter(zip_with(col("siga"), col("sigb"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= threshold)
      .select("a", "b", "est_jaccard")
  }

  /** 32-bit SimHash over token rolling-hashes: bit j of the signature is
    * set iff sum over tokens of (+1 if bit j of hash(token) else -1) > 0.
    * Bit positions are unrolled at plan-build time (32 codegen'd terms) —
    * stays inside whole-stage codegen, no UDF. */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    val hashes = transform(toks, t =>
      aggregate(split(t, ""), lit(0L), (acc, ch) => (acc * 31L + ascii(ch)) % HashP))
    (0 until 32).map { j =>
      when(
        aggregate(hashes, lit(0L),
          (s, h) => s + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: candidates share one of the four 8-bit
    * sub-bands; verified by Hamming distance ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b => shiftright(col("sig"), b * 8) % 256): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("siga"), col("y.sig").as("sigb"))
      .dropDuplicates("a", "b")
    val xorv = col("siga").bitwiseXOR(col("sigb"))
    val hamming = (0 until 32).map(j => shiftright(xorv, j) % 2).reduce(_ + _)
    cand.withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}

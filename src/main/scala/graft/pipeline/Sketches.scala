package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic cardinality sketching for the training-data pipeline.
  *
  * Why not HyperLogLog: Spark's `approx_count_distinct` and any other
  * engine's HLL use different hash functions and register layouts, so an
  * estimate can never be replayed by the DuckDB oracle. KMV (k-minimum
  * values) over the engine-portable rolling hash IS replayable: both
  * engines hash identically, keep the k smallest distinct hashes, and
  * apply the same estimator — deterministic to the last bit.
  *
  * Scale posture: the sketch is algebraic — per-partition top-k merges
  * associatively (Spark executes orderBy+limit as TakeOrdered: partial
  * per-partition top-k, then a tiny driver merge), so the full column is
  * never collected; state is O(k).
  */
object Sketches {
  val P: Long = 2147483647L // the shared rolling-hash modulus

  /** The k smallest distinct rolling hashes of `c` (the KMV sketch
    * itself, as a k-row DataFrame). Mergeable: union + distinct + top-k. */
  def kmvSketch(df: DataFrame, c: Column, k: Int): DataFrame =
    df.select(TextFunctions.rollingHash(c).as("h"))
      .where(col("h") > 0) // 0 = empty string; KMV needs h in (0, P)
      .distinct()
      .orderBy(col("h"))
      .limit(k)

  /** KMV distinct-count estimate of `c`: exact when fewer than k distinct
    * hashes exist, else `(k-1) * P / kth_min` — the standard KMV
    * estimator over the hash space (0, P). Returns one row
    * (est_distinct: double, rounded 4). */
  def kmvDistinct(df: DataFrame, c: Column, k: Int): DataFrame =
    kmvSketch(df, c, k)
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("kth"), 4))
          .as("est_distinct"))

  /** Per-group KMV distinct-count estimates — the grouped form of
    * [[kmvDistinct]], one row per group. Sketch state is the k smallest
    * distinct hashes PER GROUP: the distinct prunes before the per-group
    * rank, so the window sorts each group's distinct-hash set (bounded
    * by the value cardinality, ≪ raw rows), never the raw column. */
  def kmvDistinctBy(df: DataFrame, group: Column, c: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.select(group.as("grp"), TextFunctions.rollingHash(c).as("h"))
      .where(col("h") > 0).distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    h.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("grp")
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(col("grp"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * P / col("kth"), 4))
          .as("est_distinct"))
  }

  /** Count-min sketch rows: (seed multiplier a, offset b) per hash row.
    * a ≤ 2^17 keeps rh·a < 2^48 — 63-bit-safe in any SQL engine. */
  val CmsSeeds: Seq[(Int, Long, Long)] =
    Seq((1, 1L, 0L), (2, 7919L, 17L), (3, 104729L, 89L))

  /** Count-min sketch heavy hitters over a token column: hash each token
    * occurrence into `width` buckets under `depth` independent rows
    * (h_s(t) = ((rollingHash(t)·a_s + b_s) mod P) mod width), count per
    * (row, bucket) — the sketch is a FIXED `depth × width` table no
    * matter the corpus size, built by one partial-agg groupBy — then
    * estimate each candidate term as the MIN of its `depth` bucket
    * counts (the classic CM upper bound: est ≥ true count, always).
    * Returns the top-`k` terms by (estimate desc, term). The candidate
    * set here is the distinct vocabulary (bounded, ≪ occurrences); at
    * 100 TB a deployment feeds a sampled candidate list instead — the
    * sketch side is already scale-free. */
  /** PORTABLE HyperLogLog distinct-count (Flajolet et al. 2007) — the
    * register walk built from the shared rolling hash instead of an
    * engine-private hash, so unlike `approx_count_distinct` the sketch
    * is REPLAYABLE by any engine (the q14 KMV argument, applied to the
    * other classic cardinality sketch). Register selector = h mod m; ρ =
    * leading zeros of a decorrelated second 31-bit stream + 1 (spelled
    * as 32 − len(bin(w)) — pure integer, no log2 float hazard).
    * Registers max-merge, so the groupBy is partial-agg friendly and
    * sketches union by register max — O(m) state. The estimate keeps
    * Σ2^(32−ρ_j) as an EXACT integer (common denominator 2³²) so the
    * only float ops are the final α·m²·2³²/S division and — in the
    * small-n regime (raw ≤ 2.5m with empty registers, Flajolet §4) —
    * the LINEAR-COUNTING correction m·ln(m/V): identical IEEE op
    * sequences in both engines, round-4. The raw/corrected switch
    * compares the UNROUNDED raw estimate against 2.5m, so both engines
    * branch on the same double. */
  def hllDistinct(df: DataFrame, c: Column, m: Int = 16): DataFrame = {
    require(m == 16, "alpha is pinned for m = 16 (0.673)")
    val h0 = TextFunctions.rollingHash(c)
    val regs = df.select(h0.as("h0"))
      .select((col("h0") % m).as("bucket"),
        ((col("h0") * 1103515245L + 12345L) % P).as("w"))
      .select(col("bucket"),
        when(col("w") === 0, 32)
          .otherwise(lit(32) - length(bin(col("w")))).cast("int").as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho_max"))
    val all = df.sparkSession.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left").na.fill(0, Seq("rho_max"))
    val raw = lit(673L * m * m * 4294967296L).cast("double") /
      (lit(1000L) * col("s_scaled"))
    all.agg(
        expr("sum(shiftleft(CAST(1 AS BIGINT), 32 - rho_max))").as("s_scaled"),
        expr("sum(CASE WHEN rho_max = 0 THEN 1 ELSE 0 END)")
          .cast("int").as("zero_regs"))
      .select(lit(m).as("m"), col("s_scaled").cast("long").as("s_scaled"),
        col("zero_regs"),
        round(when(col("zero_regs") > 0 && raw <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("zero_regs")))
          .otherwise(raw), 4).as("est_hll"))
  }

  /** Per-group [[hllDistinct]] — one register SET per group key. The
    * missing-register densification is algebraic, not a join: absent
    * buckets contribute 2³² each, so S = Σ_present 2^(32−ρ) +
    * (m − present)·2³² — the per-group aggregate never fans out. Same
    * linear-counting small-n correction as the ungrouped form (V =
    * m − present, since a present bucket always has ρ ≥ 1). */
  def hllDistinctBy(df: DataFrame, group: Column, c: Column,
      m: Int = 16): DataFrame = {
    require(m == 16, "alpha is pinned for m = 16 (0.673)")
    val rho = df.select(group.as("g"), TextFunctions.rollingHash(c).as("h0"))
      .select(col("g"), (col("h0") % m).as("bucket"),
        ((col("h0") * 1103515245L + 12345L) % P).as("w"))
      .select(col("g"), col("bucket"),
        when(col("w") === 0, 32)
          .otherwise(lit(32) - length(bin(col("w")))).cast("int").as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("rho_max"))
    val raw = lit(673L * m * m * 4294967296L).cast("double") /
      (lit(1000L) * col("s_scaled"))
    rho.groupBy("g").agg(
        expr("sum(shiftleft(CAST(1 AS BIGINT), 32 - rho_max))").as("sp"),
        count(lit(1)).as("nb"))
      .select(col("g"),
        (col("sp") + (lit(m.toLong) - col("nb")) * lit(4294967296L))
          .cast("long").as("s_scaled"),
        (lit(m) - col("nb")).cast("int").as("zero_regs"))
      .select(col("g"), col("s_scaled"),
        round(when(col("zero_regs") > 0 && raw <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("zero_regs")))
          .otherwise(raw), 4).as("est_hll"))
  }

  /** Pure-Scala estimate from an m-register HLL vector — the executable
    * spec of [[hllDistinct]]'s final arithmetic (raw estimator +
    * linear-counting small-n correction), shared by the streaming sketch
    * so stream emits hash-match the batch oracle: identical IEEE op
    * sequence + BigDecimal HALF_UP round-4 (= Spark's `round`). */
  def hllEstimateSpec(regs: Seq[Int]): (Long, Double) = {
    val m = regs.length
    val s = regs.map(r => 1L << (32 - r)).sum
    val raw = (673L * m * m * 4294967296L).toDouble / (1000L * s)
    val v = regs.count(_ == 0)
    val e0 = if (v > 0 && raw <= 2.5 * m) m * math.log(m.toDouble / v) else raw
    (s, BigDecimal(e0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  def cmsTopK(df: DataFrame, c: Column, width: Int, k: Int): DataFrame = {
    val occ = df.select(explode(c).as("term"))
      .filter(col("term") =!= "")
      .select(col("term"), TextFunctions.rollingHash(col("term")).as("rh"))
    val seedArr = array(CmsSeeds.map { case (s, a, b) =>
      struct(lit(s).as("seed"), lit(a).as("a"), lit(b).as("b")) }: _*)
    val occ3 = occ.select(col("term"), col("rh"), explode(seedArr).as("sd"))
      .select(col("term"), col("sd.seed").as("seed"),
        ((col("rh") * col("sd.a") + col("sd.b")) % lit(P) % lit(width.toLong))
          .as("bucket"))
    val sketch = occ3.groupBy("seed", "bucket").agg(count(lit(1)).as("cnt"))
    val cand = occ3.distinct()
    cand.join(sketch, Seq("seed", "bucket"))
      .groupBy("term").agg(min(col("cnt")).cast("long").as("est"))
      .orderBy(col("est").desc, col("term"))
      .limit(k)
  }

  /** Pure-Scala rolling hash — the same h=(h·31+c) mod P both engines
    * compute; shared by the CMS specs below and the streaming sketch. */
  def rollingHashScala(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31 + cp) % P)
    h
  }

  /** Pure-Scala CMS cell table of a token multiset — the executable spec
    * of [[cmsTopK]]'s sketch stage, and the per-batch increment of the
    * streaming sketch (CMS cells merge by ADDITION, so batch order can
    * never change the result). */
  def cmsCellsSpec(terms: Seq[String], width: Int): Map[(Int, Long), Long] =
    terms.filter(_.nonEmpty).flatMap { t =>
      val rh = rollingHashScala(t)
      CmsSeeds.map { case (s, a, b) => (s, ((rh * a + b) % P) % width) }
    }.groupBy(identity).map { case (cell, hits) => cell -> hits.size.toLong }

  /** Point estimate for one term from a CMS cell table: min over the
    * depth rows — the CM upper bound (≥ the true count, always). */
  def cmsEstimateSpec(cells: Map[(Int, Long), Long], term: String,
      width: Int): Long = {
    val rh = rollingHashScala(term)
    CmsSeeds.map { case (s, a, b) =>
      cells.getOrElse((s, ((rh * a + b) % P) % width), 0L)
    }.min
  }

  /** The AMS estimator bank: (sketch_id, a, b) affine remixes of the
    * shared rolling hash; the LOW BIT of the remix is the ±1 sign. */
  val AmsSeeds: Seq[(Int, Long, Long)] = Seq(
    (1, 3L, 7L), (2, 7919L, 17L), (3, 104729L, 89L), (4, 130363L, 5L),
    (5, 49157L, 101L), (6, 196613L, 31L), (7, 786433L, 3L),
    (8, 26849L, 57L), (9, 65537L, 11L))

  /** AMS "tug-of-war" SECOND-MOMENT sketch (r14 — Alon, Matias &
    * Szegedy 1996): F₂ = Σ_t count(t)² is the SELF-JOIN SIZE of a
    * column — the number a dedup or join planner wants BEFORE paying
    * the groupBy that computes it exactly (a corpus's token F₂/F₁
    * ratio is its repetitiveness; the exact-dedup shuffle's output
    * size is F₀ but its skew is F₂). Each estimator keeps ONE counter
    * Z_j = Σ_occurrences s_j(x), s_j ∈ {−1,+1}: matched pairs
    * reinforce, unmatched cross-terms cancel in expectation, so
    * E[Z²] = F₂ and the median of the 9 Z² readouts concentrates.
    * ONE narrow pass — no per-value state, no shuffle beyond the
    * 1-row partial-agg fold — and the counters merge by ADDITION, so
    * the sketch is mergeable across partitions, files, and
    * micro-batches by construction. The sign is the low bit of the
    * CMS-style affine remix of the shared rolling hash (the
    * engineering spelling of AMS's 4-wise family — exactly replayable
    * cross-engine, which a seeded xxhash sign could never be; the
    * estimator stays unbiased under the family's mixing). Returns 9
    * rows (sketch_id, z, z2) plus the row sketch_id = 0 carrying the
    * MEDIAN-of-z² estimate — all exact BIGINTs. */
  def amsF2(df: DataFrame, c: Column): DataFrame = {
    val one = amsF2Counters(df, c)
    val rows = one.select(expr("stack(9, " +
        AmsSeeds.map { case (j, _, _) => s"$j, z$j" }.mkString(", ") +
        ") as (sketch_id, z)"))
      .select(col("sketch_id").cast("int").as("sketch_id"), col("z"),
        (col("z") * col("z")).as("z2"))
    val est = rows.agg(expr("array_sort(collect_list(z2))[4]").as("m"))
      .select(lit(0).as("sketch_id"), col("m").as("z"), col("m").as("z2"))
    rows.unionByName(est)
  }

  /** The 1-row (z1..z9) counter bank of [[amsF2]] — the partial a
    * micro-batch contributes; banks MERGE BY ADDITION. */
  def amsF2Counters(df: DataFrame, c: Column): DataFrame = {
    val rh = TextFunctions.rollingHash(c)
    val zs = AmsSeeds.map { case (j, a, b) =>
      sum(when(((rh * a + b) % P) % 2 === 0, 1L).otherwise(-1L))
        .cast("long").as(s"z$j") }
    df.agg(zs.head, zs.tail: _*)
  }

  /** [[amsF2]]'s output rows from a counter bank — the pure readout
    * the streaming maintainer shares with the batch plan: 9
    * (sketch_id, z, z²) rows plus the median-estimate row 0. */
  def amsF2Readout(counters: Seq[(Int, Long)]): Seq[(Int, Long, Long)] = {
    val rows = counters.sortBy(_._1).map { case (j, z) => (j, z, z * z) }
    val med = rows.map(_._3).sorted.apply(4)
    (0, med, med) +: rows
  }

  /** Pure-Scala executable spec of [[amsF2]] — the exact fold the
    * engine must reproduce, plus the exact F₂ for accuracy checks. */
  def amsF2Spec(values: Seq[String]): (Seq[(Int, Long)], Long) = {
    val zs = AmsSeeds.map { case (j, a, b) =>
      j -> values.map { v =>
        if (((rollingHashScala(v) * a + b) % P) % 2 == 0) 1L else -1L
      }.sum }
    val exact = values.groupBy(identity).values
      .map(g => g.size.toLong * g.size).sum
    (zs, exact)
  }

  /** Pure-Scala executable spec (PropertySpec: mergeability + estimator). */
  def kmvSpec(hashes: Seq[Long], k: Int): Double = {
    val ks = hashes.filter(_ > 0).distinct.sorted.take(k)
    if (ks.length < k) ks.length.toDouble
    else {
      val raw = (k - 1).toDouble * P / ks.last
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream, batch flavor — the
  * batch-mode twin of [[graft.streaming.Streams]]' stateful session
  * windows, and the standard shape for user-behavior rollups over an
  * events table.
  *
  * Scale shape: ONE shuffle on `user_id`; the lag window, the running
  * session counter, and the per-session aggregation all run inside that
  * partitioning (the groupBy keys are (user_id, session_idx), a superset
  * of the window's partition key, so no second exchange of the full
  * stream is needed — partial aggregation handles the rest). Timestamps
  * compare as epoch MICROSECONDS (integers) so the session boundaries
  * are bit-identical across engines.
  */
object Sessions {

  /** Split each user's events into sessions whenever the gap between
    * consecutive events exceeds `gapSeconds`; aggregate per session.
    * Deterministic: ordering ties on `ts` break by `event_id`. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_sess").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("end_ts"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Strict-order conversion funnel: for each user, the FIRST occurrence
    * of step 1, then the first occurrence of step 2 strictly AFTER it,
    * and so on — each step must follow the user's completion of the
    * previous one (the standard product-analytics funnel, not mere
    * set-intersection of event types). Output: one row per step with
    * the surviving user count and the conversion ratio vs step 1.
    *
    * Scale shape: one filtered user-keyed aggregation per step (steps
    * are a handful, data passes are bounded); each step's survivors are
    * localCheckpoint'd so step i+1 and the count row reuse them rather
    * than re-deriving the chain. Per-user state is ONE timestamp —
    * never a per-user event sort or collect. Timestamps compare as
    * epoch MICROSECONDS (integers), bit-identical across engines.
    *
    * `maxGapSeconds` is the CONVERSION WINDOW: each step must land
    * within that many seconds of the previous step's completion (the
    * product-analytics "converted within N hours" reading); None means
    * unbounded. */
  def funnel(events: DataFrame, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val gapPred = maxGapSeconds
      .map(g => col("e.us") <= col("p.t") + g * 1000000L)
      .getOrElse(lit(true))
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    var reached: DataFrame = null
    val rows = steps.zipWithIndex.map { case (st, i) =>
      reached = (
        if (i == 0)
          ev.filter(col("event_type") === st)
            .groupBy("user_id").agg(min(col("us")).as("t"))
        else
          ev.filter(col("event_type") === st).as("e")
            .join(reached.as("p"), col("e.user_id") === col("p.user_id"))
            .filter(col("e.us") > col("p.t") && gapPred)
            .groupBy(col("e.user_id").as("user_id"))
            .agg(min(col("e.us")).as("t"))
        ).localCheckpoint(eager = true)
      reached.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"),
          col("users"))
    }
    val all = rows.reduce(_ unionByName _)
    val base = all.filter(col("step") === 1).select(col("users").as("base"))
    all.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("users"),
        round(col("users").cast("double") / col("base"), 6).as("conversion"))
  }

  /** Weekly COHORT RETENTION — the other product-analytics staple next
    * to [[funnel]]: users are cohorted by the week of their first
    * qualifying activity, and each later active week counts them at
    * `week_offset = (week − cohort)/7`; the rate divides by the
    * cohort's own week-0 size. Weeks are Monday-truncated in the
    * session timezone, offsets are exact integer day arithmetic, so the
    * table replays identically in any engine.
    *
    * Scale shape: one (user, week) dedup, one per-user min, two
    * user-keyed joins + one small-key groupBy — the (cohort, offset)
    * result is O(weeks²) rows regardless of user count. */
  def retention(events: DataFrame, activity: Column): DataFrame = {
    val ew = events.filter(activity)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = ew.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val act = ew.join(cohorts, "user_id")
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort", "week_offset").agg(count(lit(1)).as("users"))
    val sizes = act.filter(col("week_offset") === 0)
      .select(col("cohort"), col("users").as("cohort_size"))
    act.join(sizes, "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"), col("users"),
        round(col("users").cast("double") / col("cohort_size"), 6).as("rate"))
  }

  /** Cohort LIFETIME-VALUE curve — [[retention]]'s revenue twin: per
    * (signup-cohort week, week offset), the purchase revenue that week
    * and the CUMULATIVE revenue per cohort user (the LTV curve a
    * payback model reads). Cohort = first purchase week (the retention
    * convention). Revenue sums route through DECIMAL(18,6) so the sum
    * is order-independent — a double sum would be partitioning-
    * dependent; the only float ops are the final round-4/round-6
    * display casts. The cumulative window runs over the tiny
    * (cohort × offsets) aggregate, never the raw stream. */
  def cohortLtv(events: DataFrame, isPurchase: Column): DataFrame = {
    val p = events.filter(isPurchase)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        col("value").cast("decimal(18,6)").as("v"))
    val cohorts = p.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val agg = p.join(cohorts, "user_id")
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"),
        col("v"))
      .groupBy("cohort", "week_offset")
      .agg(sum("v").as("rev"))
    val sizes = p.join(cohorts, "user_id")
      .filter(col("wk") === col("cohort"))
      .groupBy("cohort").agg(count_distinct(col("user_id")).as("cohort_size"))
    val wCum = Window.partitionBy("cohort").orderBy("week_offset")
    agg.withColumn("cum", sum("rev").over(wCum))
      .join(sizes, "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_offset"),
        round(col("rev").cast("double"), 4).as("revenue"),
        round(col("cum").cast("double") / col("cohort_size"), 6)
          .as("ltv_per_user"))
  }

  /** Top event SEQUENCES (k-step paths) — the user-flow / Sankey input
    * of product analytics: per user, every run of k CONSECUTIVE events
    * in (ts, event_id) order forms a path string; paths count
    * corpus-wide and the top-n emerge. One shuffle on user_id for the
    * lead window (same partitioning as every per-user shape here); the
    * path groupBy keys on a bounded-cardinality string (≤ |event
    * types|^k), and top-n is TakeOrderedAndProject — never a global
    * sort of the event stream. */
  def topPaths(events: DataFrame, k: Int = 3, n: Int = 10): DataFrame = {
    require(k >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = (0 until k).map(i => lead(col("event_type"), i).over(w))
    events
      .select(concat_ws(" > ", steps: _*).as("path"),
        steps.last.isNotNull.as("_full"))
      .filter(col("_full"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(n)
      .select(col("path"), col("n"),
        row_number().over(Window.orderBy(col("n").desc, col("path")))
          .cast("int").as("rank"))
  }

  /** Daily volume spikes per event type — trailing-baseline anomaly
    * flagging, the monitoring staple over an events table: each (type,
    * day) count against the mean of its previous `baselineDays` full
    * days (a ROWS frame: one shuffle on event_type, the frame scan
    * rides the sort). Days with an incomplete baseline drop. The spike
    * decision is INTEGER arithmetic (`thresholdPct·trail > 100·n·days`
    * inverted), so the flag can never 1-ulp-flip; the ratio column is a
    * rounded display stat. */
  /** Two-proportion z-test on a deterministic user split — the A/B
    * readout every product-analytics stack ships: variant = a hash rule
    * on user_id (given as `variantB`), conversion = the user emitted a
    * qualifying event at least once, z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a
    * + 1/n_b)) with p̂ the pooled rate. All counts are exact integers
    * from one distinct-user aggregate; the z statistic is a single
    * IEEE expression over those integers (identical in any engine) and
    * rounds to 6; the significance flag compares the ROUNDED z against
    * the two-sided 5% critical value so both engines decide on the
    * same bytes. Returns one row (n_a, n_b, conv_a, conv_b, rate_a,
    * rate_b, z, significant). */
  /** CUPED variance reduction (r13 — Deng et al. WSDM 2013, the
    * industry-standard power amplifier for [[abTest]]-style experiments):
    * each user's PRE-period metric X (activity before the experiment)
    * explains away part of the experiment-period metric Y's variance —
    * Y* = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) preserves every
    * treatment effect (θ uses pre-period data only) while shrinking
    * variance by exactly cov²/(var X·var Y), the fraction reported.
    *
    * Determinism: the period cutoff is the integer MIDPOINT of the
    * corpus's µs timestamp span (a 1-row broadcast aggregate — replay-
    * stable, no wall clock, the e_power discipline); per-user X/Y are
    * DECIMAL-routed sums rounded 4; all cross-user moments route
    * through DECIMAL(38,10) casts of identical IEEE products; adjusted
    * means use the CLOSED FORM Σy*_v = Σy_v − θ(Σx_v − n_v·X̄), so no
    * second corpus pass and no per-user float fold exists to drift.
    * Scale: one user_id groupBy + one global aggregate. Returns one
    * row (n_a, n_b, theta, mean_y_a/b, mean_adj_a/b, var_reduction). */
  def cupedAdjust(events: DataFrame, variantB: Column): DataFrame = {
    val span = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
    def dec(c: Column) = c.cast("decimal(38,10)")
    val users = events.crossJoin(broadcast(span))
      .withColumn("cut", expr("(lo + hi) div 2"))
      .groupBy(col("user_id"))
      .agg(
        round(sum(dec(when(unix_micros(col("ts")) < col("cut"),
          col("value")).otherwise(lit(0.0)))).cast("double"), 4).as("x"),
        round(sum(dec(when(unix_micros(col("ts")) >= col("cut"),
          col("value")).otherwise(lit(0.0)))).cast("double"), 4).as("y"))
      .select(col("user_id"), col("x"), col("y"),
        when(variantB, 1L).otherwise(0L).as("vb"))
    val g = users.agg(
      count(lit(1)).as("n"),
      sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(dec(col("x"))).cast("double").as("sx"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
      sum(dec(col("y") * col("y"))).cast("double").as("syy"),
      sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
      sum(dec(when(col("vb") === 0, col("x")).otherwise(lit(0.0))))
        .cast("double").as("sxa"),
      sum(dec(when(col("vb") === 1, col("x")).otherwise(lit(0.0))))
        .cast("double").as("sxb"),
      sum(dec(when(col("vb") === 0, col("y")).otherwise(lit(0.0))))
        .cast("double").as("sya"),
      sum(dec(when(col("vb") === 1, col("y")).otherwise(lit(0.0))))
        .cast("double").as("syb"))
    val n = col("n").cast("double")
    val covXy = col("sxy") - col("sx") * col("sy") / n
    val varX = col("sxx") - col("sx") * col("sx") / n
    val varY = col("syy") - col("sy") * col("sy") / n
    // r14 degenerate-input guard (advisor): a constant pre-period X
    // (varX = 0 — e.g. every event lands after the midpoint cutoff)
    // has nothing to explain away, so θ = 0 and the adjustment is the
    // identity (var_reduction 0) instead of a silent NaN cascade; the
    // strict > 0 also absorbs a tiny negative varX from float
    // cancellation on constant columns
    val theta = when(varX > 0.0, round(covXy / varX, 6)).otherwise(0.0)
    val meanX = col("sx") / n
    g.select(col("n_a"), col("n_b"),
      (theta + 0.0).as("theta"),
      (round(col("sya") / col("n_a"), 6) + 0.0).as("mean_y_a"),
      (round(col("syb") / col("n_b"), 6) + 0.0).as("mean_y_b"),
      (round((col("sya") - theta * (col("sxa") - col("n_a") * meanX))
        / col("n_a"), 6) + 0.0).as("mean_adj_a"),
      (round((col("syb") - theta * (col("sxb") - col("n_b") * meanX))
        / col("n_b"), 6) + 0.0).as("mean_adj_b"),
      (when(varX > 0.0 && varY > 0.0,
        round(covXy * covXy / (varX * varY), 6))
        .otherwise(0.0) + 0.0).as("var_reduction"))
  }

  def abTest(events: DataFrame, variantB: Column,
      converted: Column): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("conv"))
      .select(col("user_id"), col("conv"),
        when(variantB, 1L).otherwise(0L).as("vb"))
    val agg = users.agg(
      sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("vb") === 0, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("vb") === 1, col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = round((pa - pb) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      (z + 0.0).as("z"),
      when(abs(z) > 1.959964, 1).otherwise(0).cast("int").as("significant"))
  }

  /** ALWAYS-VALID sequential test (r14 — Johari, Koomen, Pekelis &
    * Walsh, KDD 2017 "Peeking at A/B Tests": the mixture sequential
    * probability ratio test behind every modern experimentation
    * platform's "you may peek" guarantee — a fixed-horizon z-test's
    * p-value is invalid the moment anyone looks early, while the mSPRT
    * p-process is valid at EVERY stopping time): for the two-proportion
    * effect θ̂ = rate_b − rate_a with pooled variance V, the mixture
    * likelihood ratio against a N(0, τ²) effect prior is
    * Λ = sqrt(V/(V+τ²)) · exp(θ̂²τ²/(2V(V+τ²))); reject at level α when
    * Λ ≥ 1/α, always-valid p = min(1, 1/Λ).
    *
    * Emitted as LOG Λ (a strong effect at tiny V overflows exp — the
    * log form cannot), rounded 6, with the decision on the ROUNDED
    * statistic against ln(1/α) (the [[abTest]] discipline); the
    * always-valid p rounds from the unrounded exp(−logΛ) (underflows to
    * an exact 0, never overflows). A degenerate pooled rate (all or no
    * users converted → V = 0) carries no usable normal approximation:
    * logΛ = 0, p = 1, not significant — loud-zero rather than NaN.
    * Scale: one distinct-user aggregate → one 1-row fold, identical
    * IEEE expressions in any engine. Returns one row (n_a, n_b, conv_a,
    * conv_b, effect, log_lambda, p_always, significant). */
  def msprt(events: DataFrame, variantB: Column, converted: Column,
      tau: Double = 0.01, alpha: Double = 0.05): DataFrame = {
    require(tau > 0 && alpha > 0 && alpha < 1, "msprt: bad tau/alpha")
    val users = events.groupBy(col("user_id"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("conv"))
      .select(col("user_id"), col("conv"),
        when(variantB, 1L).otherwise(0L).as("vb"))
    val agg = users.agg(
      sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("vb") === 0, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("vb") === 1, col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val v = pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))
    val eff = pb - pa
    val t2 = lit(tau * tau)
    val logLamRaw = lit(0.5) * log(v / (v + t2)) +
      eff * eff * t2 / (lit(2.0) * v * (v + t2))
    val logLam = when(v > 0.0, round(logLamRaw, 6)).otherwise(0.0)
    val pAlways = when(v > 0.0,
      round(least(lit(1.0), exp(-logLamRaw)), 6)).otherwise(1.0)
    val crit = math.log(1.0 / alpha)
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      (round(eff, 6) + 0.0).as("effect"),
      (logLam + 0.0).as("log_lambda"),
      (pAlways + 0.0).as("p_always"),
      when(logLam >= crit, 1).otherwise(0).cast("int").as("significant"))
  }

  /** QUANTILE TREATMENT EFFECT (r14 — the distributional readout mean
    * tests miss: an experiment can leave the mean flat while moving the
    * median down and the p90 up, i.e. helping light users and hurting
    * heavy ones; comparing per-variant quantiles is the standard
    * heterogeneity check): per-variant p-quantiles of the per-user
    * metric, estimated on the integer LOG-BUCKET kernel (the
    * st_ddsketch spelling — values to milli-units, bucket by (MSB
    * octave, top-6 mantissa bits), ≤3% relative error, every boundary
    * a pure integer op), QTE_q = est_b − est_a in exact integer
    * milli-units.
    *
    * Scale: one user_id groupBy collapses the corpus; everything after
    * runs on the BOUNDED per-variant bucket table (≤ 64·octaves rows —
    * the kaplanMeier tiny-table rule for its one window). Quantile
    * pick (smallest bucket with 100·cum ≥ q·n) and midpoint decode are
    * all-integer — the oracle replays them bucket-for-bucket. Returns
    * one row per q (q, est_a_milli, est_b_milli, qte_milli). */
  def quantileTreatmentEffect(events: DataFrame, variantB: Column,
      qs: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100), "bad qs")
    def dec(c: Column) = c.cast("decimal(38,10)")
    val users = events.groupBy(col("user_id"))
      .agg(round(sum(dec(col("value"))).cast("double"), 4).as("y"))
      .select(col("y"), when(variantB, 1L).otherwise(0L).as("vb"))
    val lv = greatest(floor(col("y") * 1000).cast("long"), lit(0L))
    val bucketed = users.select(col("vb"), lv.as("lv"))
      .select(col("vb"),
        when(col("lv") <= 63L, col("lv"))
          .otherwise((length(bin(col("lv"))) - 6).cast("long") * 64L +
            expr("shiftright(lv, length(bin(lv)) - 6)")).as("b"))
    val counts = bucketed.groupBy("vb", "b").agg(count(lit(1)).as("c"))
    val n = counts.groupBy("vb").agg(sum(col("c")).as("n"))
    val cum = counts.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("vb").orderBy("b")))
    val qDf = events.sparkSession.createDataFrame(
      qs.map(Tuple1(_))).toDF("q")
    val sel = cum.join(n, "vb").crossJoin(broadcast(qDf))
      .filter(lit(100L) * col("cum") >= col("q").cast("long") * col("n"))
      .groupBy("vb", "q").agg(min(col("b")).as("b"))
    // midpoint decode — the logBucketEstMilli integer spelling, all
    // integer ops (div, never float division)
    val est = expr("CASE WHEN b <= 63 THEN b ELSE " +
      "((b % 64) * shiftleft(CAST(1 AS BIGINT), CAST(b div 64 AS INT)) " +
      "+ ((b % 64 + 1) * shiftleft(CAST(1 AS BIGINT), " +
      "CAST(b div 64 AS INT)) - 1)) div 2 END")
    sel.select(col("vb"), col("q"), est.cast("long").as("est"))
      .groupBy("q")
      .agg(max(when(col("vb") === 0, col("est"))).as("est_a_milli"),
        max(when(col("vb") === 1, col("est"))).as("est_b_milli"))
      .select(col("q"),
        col("est_a_milli"), col("est_b_milli"),
        (col("est_b_milli") - col("est_a_milli")).as("qte_milli"))
  }

  /** Multi-touch ATTRIBUTION — the marketing-analytics staple: for each
    * conversion, credit the user's touch events inside the lookback
    * window under the three classic models at once — FIRST-touch (the
    * earliest touch gets 1), LAST-touch (the latest pre-conversion
    * touch gets 1), and LINEAR (1/n each, carried as integer
    * MICRO-credits `1000000 div n` — the t_lm_score ppm discipline:
    * order-independent, bit-portable, no decimal-scale or float-sum
    * divergence between engines; the ≤(n−1)µ floor loss per conversion
    * is deterministic). Ties inside a model break on (ts, event_id),
    * the corpus-wide ordering convention. Returns per-channel credit
    * totals plus the touch count.
    *
    * Shape: one user-keyed equi-join of conversions × touches with the
    * window predicate as a residual filter (per-user fan-out is
    * bounded by the user's own activity — never a corpus range join),
    * two windowed firsts over that bounded join, one groupBy on the
    * tiny channel key. */
  def attribution(events: DataFrame, isConversion: Column,
      isTouch: Column, lookbackSeconds: Long = 7L * 86400): DataFrame = {
    val us = unix_micros(col("ts"))
    val conv = events.filter(isConversion).select(col("user_id"),
      us.as("cus"), col("event_id").as("cid"))
    val touch = events.filter(isTouch).select(col("user_id"),
      col("event_type").as("channel"), us.as("tus"),
      col("event_id").as("tid"))
    val joined = conv.join(touch, "user_id")
      .filter(col("tus") < col("cus") &&
        col("tus") >= col("cus") - lookbackSeconds * 1000000L)
    val w = Window.partitionBy("user_id", "cid")
    val flagged = joined
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_first",
        min(struct(col("tus"), col("tid"))).over(w))
      .withColumn("_last",
        max(struct(col("tus"), col("tid"))).over(w))
    flagged.groupBy(col("channel")).agg(
      count(lit(1)).as("n_touches"),
      sum(when(struct(col("tus"), col("tid")) === col("_first"), 1L)
        .otherwise(0L)).as("first_touch"),
      sum(when(struct(col("tus"), col("tid")) === col("_last"), 1L)
        .otherwise(0L)).as("last_touch"),
      sum(expr("CAST(1000000 DIV _n AS BIGINT)")).as("linear_ppm"))
  }

  /** RFM segmentation — the classic recency/frequency/monetary customer
    * scoring: per user over qualifying events, days since last purchase
    * (relative to the corpus's last purchase — a 1-row broadcast, no
    * wall clock), purchase count, and whole-dollar spend (summed through
    * DECIMAL cents — order-independent, bit-exact). Each metric maps to
    * a 1–5 quintile score by the INTEGER rule `score = (5·c_lt) div n +
    * 1` with `c_lt` = users with a strictly smaller metric (recency
    * negated so recent = high) — a tie group shares `c_lt`, so it can
    * NEVER split across scores (the ccnetBuckets discipline, quintile
    * form), and the div is exact integer arithmetic in any engine. The
    * segment label is a fixed CASE over the three scores.
    *
    * Shape: one user groupBy (the only corpus shuffle), then per-metric
    * distinct-value counting + a cumulative window over the DISTINCT
    * metric values — bounded by the metric codomains (days, counts,
    * whole dollars; the t_auc argument), never a corpus-wide rank. */
  def rfm(events: DataFrame, isPurchase: Column): DataFrame = {
    val per = events.filter(isPurchase).groupBy("user_id").agg(
      max(unix_micros(col("ts"))).as("last_us"),
      count(lit(1)).as("freq"),
      (sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
    val mx = per.agg(max("last_us").as("max_us"))
    val base = per.crossJoin(broadcast(mx))
      .withColumn("rec_days",
        expr("CAST((max_us - last_us) DIV 86400000000 AS BIGINT)"))
      .withColumn("money", expr("CAST(cents DIV 100 AS BIGINT)"))
      .select(col("user_id"), col("rec_days"), col("freq"), col("money"),
        (-col("rec_days")).as("_rmetric"))
    def quintile(df: DataFrame, m: String, out: String): DataFrame = {
      val vc = df.groupBy(col(m)).agg(count(lit(1)).as("_c"))
      val w = Window.orderBy(col(m))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cl = vc
        .withColumn("_clt", coalesce(sum(col("_c")).over(w), lit(0L)))
      val tot = vc.agg(sum(col("_c")).as("_n"))
      df.join(cl.select(col(m), col("_clt")), m)
        .crossJoin(broadcast(tot))
        .withColumn(out, expr(s"CAST((5 * _clt) DIV _n AS INT) + 1"))
        .drop("_clt", "_n")
    }
    val scored = quintile(quintile(quintile(base,
      "_rmetric", "r_score"), "freq", "f_score"), "money", "m_score")
    scored.select(col("user_id"), col("rec_days"), col("freq"),
      col("money"),
      col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4 &&
        col("m_score") >= 4, "champion")
        .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
        .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
        .when(col("r_score") <= 2 && col("m_score") <= 2, "hibernating")
        .otherwise("regular").as("segment"))
  }

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition behind every growth dashboard (the accounting
    * identity: Δ active = new + resurrected − churned): weeks are
    * Monday-truncated (the [[retention]] convention) and indexed as
    * integer epoch-weeks; a user's active week is `new` on their first,
    * `retained` when they were active the immediately previous week,
    * `resurrected` otherwise; `churned` counts at week w the users
    * active in w−1 but absent in w, bounded at the corpus's last active
    * week (beyond it everyone would trivially "churn").
    *
    * Shape: ONE corpus shuffle to the deduped (user, week) table;
    * the first-week aggregate, per-user lag window, churn anti-join and
    * per-week counts all run on that already-tiny activity table, and
    * the max-week bound is a broadcast 1-row aggregate — nothing
    * corpus-sized is touched twice. */
  def lifecycle(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
        (datediff(date_trunc("week", col("ts")),
          lit(java.sql.Date.valueOf("1970-01-05"))) / 7).cast("int").as("wk"))
      .distinct()
    val firstW = uw.groupBy("user_id").agg(min("wk").as("first_wk"))
    val lw = Window.partitionBy("user_id").orderBy("wk")
    val flagged = uw
      .withColumn("prev_wk", lag(col("wk"), 1).over(lw))
      .join(firstW, "user_id")
      .withColumn("status",
        when(col("wk") === col("first_wk"), "new")
          .when(col("prev_wk") === col("wk") - 1, "retained")
          .otherwise("resurrected"))
    val counts = flagged.groupBy("wk").agg(
      sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("status") === "retained", 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("status") === "resurrected", 1L).otherwise(0L))
        .as("n_resurrected"))
    val maxW = uw.agg(max("wk").as("max_wk"))
    val churn = uw.as("a")
      .join(uw.as("b"), col("a.user_id") === col("b.user_id") &&
        col("b.wk") === col("a.wk") + 1, "left_anti")
      .crossJoin(broadcast(maxW))
      .filter(col("wk") + 1 <= col("max_wk"))
      .groupBy((col("wk") + 1).as("wk")).agg(count(lit(1)).as("n_churned"))
    counts.join(churn, Seq("wk"), "full_outer")
      .select(col("wk"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** First-order Markov transition matrix between event types — the
    * "what happens next" model behind every product-flow diagram (and
    * the generative counterpart of [[topPaths]]' top-k readout): for
    * every ordered pair of CONSECUTIVE same-user events, the transition
    * count and the row-normalized probability P(next | prev). Each
    * user's final event transitions into the synthetic `endState`, so
    * every matrix row sums to exactly 1 and session-terminal behavior
    * is first-class.
    *
    * Shape: one shuffle on user_id for the lag window (the only
    * corpus-sized exchange), then a groupBy on the ≤|types|²-row pair
    * table; the probability denominator is a window sum over that tiny
    * aggregate. Counts are exact BIGINTs; the probability is a single
    * IEEE division rounded to 6. */
  def markovTransitions(events: DataFrame,
      endState: String = "(end)"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events.select(col("event_type").as("prev_type"),
      coalesce(lead(col("event_type"), 1).over(w), lit(endState))
        .as("next_type"))
    val counts = pairs.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    counts.select(col("prev_type"), col("next_type"), col("n"),
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("prev_type")), 6).as("p"))
  }

  /** DAU/WAU stickiness — the "what share of this week's users came
    * back today" engagement curve: per active day, distinct users that
    * day (DAU) over distinct users in the trailing `windowDays` window
    * (WAU), as a ratio in (0, 1].
    *
    * A distinct-count over a SLIDING window has no direct windowed
    * form; the scale-correct shape is coverage explosion: dedup the
    * stream to (user, day) FIRST (the only corpus-sized shuffle), then
    * explode each activity day onto the ≤`windowDays` future days it
    * covers and re-distinct — a bounded ×window fan-out of the
    * already-tiny per-day activity table, never of the raw events.
    * Days with zero activity emit no row (their DAU is 0 by
    * definition); partial leading windows report the users seen so far,
    * the standard product-analytics convention. */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Holt double-exponential FORECAST of daily event volume (Holt 1957,
    * the level+trend step up from [[ewmaSpikes]]' flat EWMA): with
    * α = β = 1/2, `l_t = n_t/2 + (l_{t-1}+b_{t-1})/2`,
    * `b_t = (l_t−l_{t-1})/2 + b_{t-1}/2`; the one-step-ahead forecast
    * is `l_T + b_T` — the capacity-planning number a daily pipeline
    * publishes.
    *
    * Determinism: the recurrence folds SEQUENTIALLY in day order over
    * one collected per-type day list (bounded: days × types is an
    * AGGREGATE, the ewmaSpikes argument) with the identical arithmetic
    * spelled on both engines — inputs are exact integer counts, every
    * op is the same IEEE double op in the same order, rounding only on
    * output. */
  def holtForecast(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("ds"))
      .select(col("event_type"), expr("""
        aggregate(ds,
          named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE), 'i', 0),
          (a, e) -> IF(a.i = 0,
            named_struct('l', CAST(e.n AS DOUBLE), 'b', CAST(0.0 AS DOUBLE), 'i', 1),
            named_struct(
              'l', 0.5D * CAST(e.n AS DOUBLE) + 0.5D * (a.l + a.b),
              'b', 0.5D * ((0.5D * CAST(e.n AS DOUBLE) + 0.5D * (a.l + a.b)) - a.l)
                   + 0.5D * a.b,
              'i', a.i + 1)),
          a -> named_struct('days', CAST(a.i AS BIGINT),
            'level', round(a.l, 6), 'trend', round(a.b, 6),
            'forecast', round(a.l + a.b, 6))) AS h"""))
      .select(col("event_type"), col("h.days").as("days"),
        col("h.level").as("level"), col("h.trend").as("trend"),
        col("h.forecast").as("forecast"))
  }

  /** Market-basket ASSOCIATION RULES (Agrawal et al. 1993's 2-itemset
    * core): for co-purchased item pairs, both directed rules a→b with
    * `support = n_ab/N`, `confidence = n_ab/n_a`,
    * `lift = n_ab·N/(n_a·n_b)` — the recommender / cross-sell table.
    * Counts stay exact BIGINTs (support as integer ppm); confidence and
    * lift are single IEEE divisions of exact integers rounded to 6, and
    * the top-k orders on the ROUNDED lift with a rule tie-break — fully
    * engine-portable.
    *
    * Shape: one distinct (basket, item) pass, a per-basket pair
    * self-join (fan-out quadratic in BASKET size — baskets are small and
    * bounded, the co-purchase argument; the min-support filter prunes
    * the tail), item counts broadcast back, TakeOrderedAndProject. */
  /** Day-of-week SEASONALITY index per event type: each weekday's share
    * of the type's volume versus a uniform week, as exact integer ppm
    * (1 000 000 = exactly uniform, 7 000 000 = everything on one day).
    * The weekday is derived from the EPOCH-DAY number ((days+3) mod 7,
    * 0 = Monday) — pure integer arithmetic, immune to the Sunday-first /
    * Monday-first convention split between engines. Scale shape: one
    * partial-agg-friendly groupBy to a ≤7-rows-per-type table, then a
    * per-type total join on that tiny aggregate — the corpus is scanned
    * once. */
  def weekdaySeasonality(events: DataFrame): DataFrame = {
    val dow = pmod(
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 3,
      lit(7))
    val daily = events.select(col("event_type"), dow.cast("int").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
    val tot = daily.groupBy("event_type").agg(sum("n").as("total"))
    daily.join(tot, "event_type")
      .select(col("event_type"), col("dow"), col("n").cast("long").as("n"),
        expr("1000000 * 7 * n div total").cast("long").as("index_ppm"))
  }

  /** CONVERSION-LAG distribution: for every user whose first `fromType`
    * event is followed (at or after it) by a `toType` event, the lag to
    * the FIRST such event, bucketed into whole days — plus the running
    * cumulative conversion rate over all `fromType` users as integer
    * ppm ("x% convert within N days", the funnel-latency curve).
    * Timestamps compare as epoch MICROSECONDS (integers); day buckets
    * and the cumulative ppm are integer div, so no boundary can flip
    * cross-engine. Scale shape: two per-user aggregations and one
    * user-keyed join (all on the user_id shuffle), collapsing to a
    * ≤few-hundred-row day histogram; the cumulative window runs on that
    * tiny aggregate with a broadcast 1-row total. */
  def conversionLag(events: DataFrame, fromType: String,
      toType: String): DataFrame = {
    val f = events.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t0"))
    val t = events.filter(col("event_type") === toType)
      .select(col("user_id"), unix_micros(col("ts")).as("t1"))
    val lag = f.join(t, "user_id").filter(col("t1") >= col("t0"))
      .groupBy("user_id").agg(min(col("t1") - col("t0")).as("lag_us"))
    val histo = lag.select(expr("lag_us div 86400000000").as("lag_days"))
      .groupBy("lag_days").agg(count(lit(1)).as("users"))
    val total = f.agg(count(lit(1)).as("n"))
    histo.crossJoin(broadcast(total))
      .withColumn("cum",
        sum("users").over(Window.orderBy("lag_days")))
      .select(col("lag_days").cast("long").as("lag_days"),
        col("users").cast("long").as("users"),
        expr("1000000 * cum div n").cast("long").as("cum_ppm"))
  }

  def basketRules(baskets: DataFrame, minPairCount: Int = 2,
      topK: Int = 25): DataFrame = {
    val b = baskets.select(col("basket_id"), col("item")).distinct()
    val n = b.agg(count_distinct(col("basket_id")).as("n_baskets"))
    val ia = b.groupBy("item").agg(count(lit(1)).as("ni"))
    val pairs = b.select(col("basket_id"), col("item").as("a"))
      .join(b.select(col("basket_id"), col("item").as("b_")), "basket_id")
      .filter(col("a") < col("b_"))
      .groupBy(col("a"), col("b_")).agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minPairCount)
    pairs.select(col("a").as("antecedent"), col("b_").as("consequent"),
        col("nab"))
      .unionByName(pairs.select(col("b_").as("antecedent"),
        col("a").as("consequent"), col("nab")))
      .join(broadcast(ia.select(col("item").as("antecedent"),
        col("ni").as("na"))), "antecedent")
      .join(broadcast(ia.select(col("item").as("consequent"),
        col("ni").as("nc"))), "consequent")
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"),
        col("nab").cast("long").as("n_ab"),
        expr("CAST((1000000 * nab) DIV n_baskets AS BIGINT)")
          .as("support_ppm"),
        round(col("nab").cast("double") / col("na").cast("double"), 6)
          .as("confidence"),
        round((col("nab") * col("n_baskets")).cast("double") /
          (col("na") * col("nc")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** Power-user / engagement-frequency histogram (the L28 chart): users
    * bucketed by how many DISTINCT days they were active in the trailing
    * `windowDays` ending at the corpus's LAST active day — the anchor is
    * a broadcast 1-row max, never the wall clock (the [[rfm]] recency
    * discipline), so the result is replay-stable. Share is integer ppm.
    *
    * Shape: one dedup shuffle to (user, day), the window filter, a
    * per-user count, then a ≤`windowDays`-row histogram — bounded output,
    * no corpus-wide window. */
  def powerHistogram(events: DataFrame, windowDays: Int = 28): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val anchor = ud.agg(max(col("day")).as("anchor"))
    val act = ud.crossJoin(broadcast(anchor))
      .filter(datediff(col("anchor"), col("day")) < windowDays)
      .groupBy("user_id").agg(count(lit(1)).as("days_active"))
    val tot = act.agg(count(lit(1)).as("n_total"))
    act.groupBy("days_active")
      .agg(count(lit(1)).cast("long").as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("days_active"), col("n_users"),
        expr("CAST((1000000 * n_users) DIV n_total AS BIGINT)")
          .as("share_ppm"))
  }

  /** Exponentially-weighted daily volume anomalies — [[dailySpikes]]'
    * EWMA twin, reacting faster to level shifts than the flat trailing
    * mean: baseline_t = Σ_{j=1..w} 2^(w−j)·n_{t−j} / (2^w − 1), i.e.
    * α = 1/2 decay with weights as EXACT dyadic integers — the weighted
    * trail is a plain BIGINT sum, bit-portable across engines, where a
    * float pow() chain could drift in the last ulp. Spike when
    * n > (thresholdPct/100) × baseline, decided in integers
    * (100·n·denom > pct·trail). Emits only days with a FULL trailing
    * window, like [[dailySpikes]].
    *
    * Scale: the per-(event_type, day) aggregate (tiny — days × types)
    * fans out ×`windowDays` onto the days it influences, then one
    * groupBy reassembles the weighted trail — a bounded explosion of an
    * AGGREGATE, never a second pass over raw events. */
  def ewmaSpikes(events: DataFrame, windowDays: Int = 7,
      thresholdPct: Int = 150): DataFrame = {
    require(windowDays > 0 && windowDays < 62, "windowDays out of range")
    val denom = (1L << windowDays) - 1
    val daily = events.groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val offs = (1 to windowDays).map(j =>
      struct(lit(j).as("j"), lit(1L << (windowDays - j)).as("w")))
    val trail = daily
      .select(col("event_type"), col("day"), col("n"),
        explode(array(offs: _*)).as("o"))
      .select(col("event_type"),
        date_add(col("day"), col("o.j")).as("day"),
        (col("n") * col("o.w")).as("wn"))
      .groupBy("event_type", "day")
      .agg(sum(col("wn")).as("trail"), count(lit(1)).as("trail_days"))
      .filter(col("trail_days") === windowDays)
    daily.join(trail, Seq("event_type", "day"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        round(col("trail").cast("double") / denom, 6).as("baseline"),
        round(col("n").cast("double") * denom / col("trail"), 6)
          .as("ratio"),
        when(lit(100L) * col("n") * denom >
          lit(thresholdPct.toLong) * col("trail"), 1).otherwise(0)
          .cast("int").as("spike"))
  }

  def dailySpikes(events: DataFrame, baselineDays: Int = 7,
      thresholdPct: Int = 120): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-baselineDays, -1)
    daily
      .withColumn("trail", sum(col("n")).over(w))
      .withColumn("trail_days", count(col("n")).over(w))
      .filter(col("trail_days") === baselineDays)
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"),
        round(col("n").cast("double") * col("trail_days") / col("trail"), 6)
          .as("ratio"),
        when(lit(100L) * col("n") * col("trail_days") >
          lit(thresholdPct.toLong) * col("trail"), 1).otherwise(0)
          .cast("int").as("spike"))
  }
  /** KAPLAN-MEIER time-to-event table — survival analysis over
    * TIME-TO-CONVERSION (days from a user's first event to their first
    * `eventType`), the funnel-latency primitive survival analysis does
    * right where a naive mean does not: users who never converted are
    * CENSORED at the corpus horizon (they were at risk the whole
    * observed window — dropping them biases the estimate optimistic).
    * For each observed duration t the table gives the at-risk count
    * (duration ≥ t), the conversions at exactly t, and the integer-ppm
    * hazard — the (n_i, d_i) ingredients of S(t) = Π (1 − d_i/n_i);
    * every gated number is exact integer arithmetic (the cumulative
    * PRODUCT is the consumer's one float fold, deliberately outside
    * the gate). Scale shape: one per-user groupBy, then everything
    * runs on the BOUNDED distinct-duration-days table — the lone
    * unpartitioned window (the cumulative at-risk count) orders
    * ≤ horizon-days rows, the p_shard tiny-table rule. */
  /** SAMPLE-RATIO-MISMATCH guardrail (r14 — Fabijan et al. KDD 2019,
    * "Diagnosing Sample Ratio Mismatch": the single most important
    * trust check an experimentation platform runs BEFORE reading any
    * metric — if the observed variant split deviates from the design
    * ratio, the assignment itself is broken (redirect loss, bot
    * filtering skew, triggered-analysis bugs) and every downstream
    * readout is invalid): a one-df chi-square over distinct-user
    * variant counts against the designed B share (`expectedBppm`,
    * integer parts-per-million — the default 500000 is the 50/50
    * split).
    *
    * Determinism: counts are exact integers from one distinct-user
    * aggregate; expected counts and the chi-square are a single IEEE
    * expression over those integers (identical in any engine), rounded
    * 6; the mismatch flag compares the ROUNDED statistic to the 5%
    * one-df critical value 3.841459 (the [[abTest]] rounded-decision
    * discipline). Scale: one user_id groupBy → one 1-row aggregate.
    * Returns one row (n_a, n_b, expected_b, chi2, srm). */
  def srmCheck(events: DataFrame, variantB: Column,
      expectedBppm: Long = 500000L): DataFrame = {
    require(expectedBppm > 0L && expectedBppm < 1000000L,
      s"srmCheck: expectedBppm must be in (0, 1e6), got $expectedBppm")
    val agg = events.groupBy(col("user_id"))
      .agg(max(when(variantB, 1L).otherwise(0L)).as("vb"))
      .agg(
        sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"))
    val total = (col("n_a") + col("n_b")).cast("double")
    val eb = total * lit(expectedBppm.toDouble / 1e6)
    val ea = total - eb
    val chi2 = round(
      (col("n_a").cast("double") - ea) * (col("n_a").cast("double") - ea)
        / ea +
      (col("n_b").cast("double") - eb) * (col("n_b").cast("double") - eb)
        / eb, 6)
    agg.select(col("n_a"), col("n_b"),
      (round(eb, 6) + 0.0).as("expected_b"),
      (chi2 + 0.0).as("chi2"),
      when(chi2 > 3.841459, 1).otherwise(0).cast("int").as("srm"))
  }

  /** DIFFERENCE-IN-DIFFERENCES (r14 — the quasi-experimental workhorse
    * when randomization is impossible: launches, pricing changes,
    * market-level rollouts. Card & Krueger 1994's two-period two-group
    * form): the treatment effect is the TREATED group's pre→post mean
    * change minus the CONTROL group's — the control differencing
    * removes the shared time trend the naive pre/post compare absorbs
    * as lift).
    *
    * Period cutoff and per-user metric follow [[cupedAdjust]] exactly:
    * the integer MIDPOINT of the corpus's µs timestamp span splits
    * pre/post, each user contributes a DECIMAL-routed value sum per
    * period rounded 4 (users span both periods with 0 where inactive —
    * the balanced-panel convention, so composition can't shift between
    * periods). Group means route through DECIMAL(38,10) sums of the
    * rounded per-user values; the DiD estimate is computed from the
    * UNROUNDED group means and rounded 6 once (rounding the four means
    * first would compound to ±2e-6). Scale: one user_id groupBy + one
    * 1-row aggregate. Returns one row (n_a, n_b, mean_pre_a,
    * mean_post_a, mean_pre_b, mean_post_b, did). */
  def diffInDiff(events: DataFrame, variantB: Column): DataFrame = {
    val span = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
    def dec(c: Column) = c.cast("decimal(38,10)")
    val users = events.crossJoin(broadcast(span))
      .withColumn("cut", expr("(lo + hi) div 2"))
      .groupBy(col("user_id"))
      .agg(
        round(sum(dec(when(unix_micros(col("ts")) < col("cut"),
          col("value")).otherwise(lit(0.0)))).cast("double"), 4).as("x"),
        round(sum(dec(when(unix_micros(col("ts")) >= col("cut"),
          col("value")).otherwise(lit(0.0)))).cast("double"), 4).as("y"))
      .select(col("x"), col("y"),
        when(variantB, 1L).otherwise(0L).as("vb"))
    val g = users.agg(
      sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(dec(when(col("vb") === 0, col("x")).otherwise(lit(0.0))))
        .cast("double").as("sxa"),
      sum(dec(when(col("vb") === 1, col("x")).otherwise(lit(0.0))))
        .cast("double").as("sxb"),
      sum(dec(when(col("vb") === 0, col("y")).otherwise(lit(0.0))))
        .cast("double").as("sya"),
      sum(dec(when(col("vb") === 1, col("y")).otherwise(lit(0.0))))
        .cast("double").as("syb"))
    val preA = col("sxa") / col("n_a")
    val postA = col("sya") / col("n_a")
    val preB = col("sxb") / col("n_b")
    val postB = col("syb") / col("n_b")
    g.select(col("n_a"), col("n_b"),
      (round(preA, 6) + 0.0).as("mean_pre_a"),
      (round(postA, 6) + 0.0).as("mean_post_a"),
      (round(preB, 6) + 0.0).as("mean_pre_b"),
      (round(postB, 6) + 0.0).as("mean_post_b"),
      (round((postB - preB) - (postA - preA), 6) + 0.0).as("did"))
  }

  def kaplanMeier(events: DataFrame,
      eventType: String = "purchase"): DataFrame = {
    val per = events.groupBy("user_id").agg(
      expr("min(unix_micros(ts)) div 86400000000").as("first_day"),
      expr(s"min(CASE WHEN event_type = '$eventType' THEN " +
        "unix_micros(ts) div 86400000000 END)").as("conv_day"))
    val mx = events.agg(
      expr("max(unix_micros(ts)) div 86400000000").as("hz"))
    val lt = per.crossJoin(broadcast(mx))
      .select(
        (coalesce(col("conv_day"), col("hz")) - col("first_day")).as("t"),
        col("conv_day").isNotNull.cast("int").as("churned"))
    val byT = lt.groupBy("t")
      .agg(count(lit(1)).as("n_t"), sum("churned").as("d_t"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.withColumn("n_risk", sum(col("n_t")).over(wDesc))
      .filter(col("d_t") > 0)
      .select(col("t").cast("long").as("t_days"),
        col("n_risk").cast("long").as("n_risk"),
        col("d_t").cast("long").as("d_conv"),
        expr("(1000000 * d_t) div n_risk").cast("long").as("hazard_ppm"))
  }

  /** CUSUM drift monitor (r14 — Page 1954, the classic sequential
    * change-point chart; the DRIFT sibling of [[dailySpikes]]'s
    * trailing-ratio spike and [[ewmaSpikes]]'s smoothed-level alarm:
    * CUSUM accumulates small persistent excesses that neither catches)
    * over the per-(event_type, day) volume series. The one-sided upper
    * chart is S_d = max(0, S_{d-1} + (x_d − ref − k)); an alarm fires
    * when S_d exceeds h. The reference ref is CALIBRATED from the
    * series itself in exact integers (milli-units:
    * `ref = (1000·Σn) div days` per type — in production this is the
    * control chart's pre-computed calibration artifact, which is why
    * the streaming twin [[graft.streaming.Streams.streamingCusum]]
    * takes it as a parameter); slack k = ref div 20 (5%) and threshold
    * h = ref (one average day's full volume in accumulated excess).
    *
    * Determinism: the max(0,·) recurrence is NOT a window primitive,
    * but its closed form is — with P_d = Σ_{j≤d} inc_j and P_0 = 0,
    * S_d = P_d − min(0, min_{j≤d} P_j) — so the whole chart is two
    * window passes (running sum + running min) over exact BIGINT
    * milli-units; no float enters any gated value. Scale shape: one
    * (type, day) count shuffle, a 5-row broadcast calibration join,
    * then windows over the BOUNDED per-type day series (≤ horizon
    * days each — the tiny-table rule). */
  def cusum(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val cal = daily.groupBy("event_type")
      .agg(expr("(1000 * sum(n)) div count(*)").as("ref"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(cal), "event_type")
      .withColumn("inc",
        col("n") * 1000L - col("ref") - expr("ref div 20"))
      .withColumn("p", sum(col("inc")).over(w))
      .withColumn("mp", least(lit(0L), min(col("p")).over(w)))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"),
        (col("p") - col("mp")).cast("long").as("s_milli"),
        when(col("p") - col("mp") > col("ref"), 1).otherwise(0)
          .cast("int").as("alarm"))
  }

}

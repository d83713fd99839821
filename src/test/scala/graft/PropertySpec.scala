package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CosineSim, MinhashSig, RollingHash, ShingleHashes, SignLshSig, SimhashSig}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite
import graft.merge.Merge
import graft.model._

/** The ScalaCheck property suite promised by SURVEY §5 item 4.
  *
  * Kernel laws: every codegen'd Catalyst kernel must equal an INDEPENDENT
  * higher-order spelling of the same published formula (the spelling the
  * DuckDB oracle replays in SQL) on arbitrary inputs — not just the fixed
  * + seeded cases in GraftExpressionsSpec.
  *
  * Operator laws (Spark-backed, fewer samples): A1 merge idempotence and
  * upsert idempotence (re-playing a batch is a no-op — the reference's
  * add_node is an upsert, graphDB.py:121-131), and transitive closure ≡
  * the naive O(n³) closure on random DAGs.
  */
class PropertySpec extends AnyFunSuite {
  private val P = RollingHash.P

  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ---- independent executable specs (the oracle SQL's formulation) ----
  private def rollSpec(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31 + cp) % P)
    h
  }
  private def shingleSpec(toks: Seq[String], k: Int): Seq[Long] = {
    val ws = if (toks.length < k) Seq(toks) else toks.sliding(k).toSeq
    ws.map(w => rollSpec(w.mkString(" "))).distinct
  }
  private def minhashSpec(toks: Seq[String], k: Int,
      a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val hs = shingleSpec(toks, k) // min is insensitive to the dedup
    a.indices.map(p => hs.map(h => (h * a(p) + b(p)) % P).min)
  }
  private def simhashSpec(toks: Seq[String], a2: Long, b2: Long): Long = {
    val counts = new Array[Int](62)
    toks.foreach { t =>
      val h1 = rollSpec(t)
      val h2 = (h1 * a2 + b2) % P
      (0 until 31).foreach { j =>
        counts(j) += (if (((h1 >> j) & 1L) == 1L) 1 else -1)
        counts(j + 31) += (if (((h2 >> j) & 1L) == 1L) 1 else -1)
      }
    }
    (0 until 62).foldLeft(0L)((s, j) => if (counts(j) > 0) s | (1L << j) else s)
  }
  private def signLshSpec(v: Seq[Float], numPlanes: Int): Long =
    (0 until numPlanes).foldLeft(0L) { (sig, i) =>
      val dot = v.indices.foldLeft(0.0)((a, j) =>
        a + v(j).toDouble * SignLshSig.planeComponent(i, j))
      if (dot > 0) sig | (1L << i) else sig
    }
  private def cosineSpec(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private def strArr(toks: Seq[String]) =
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])

  private val genToken: Gen[String] =
    Gen.oneOf(Gen.asciiPrintableStr.map(_.take(12)),
      // "𝒳" is a supplementary codepoint (surrogate pair) — exercises the
      // codePointAt iteration in the kernels
      Gen.listOf(Gen.oneOf("λ", "ü", "中", "𝒳", "a", " ", "\t")).map(_.mkString))
  private val genToks: Gen[List[String]] = Gen.listOf(genToken)

  test("property: RollingHash kernel ≡ fold spec on arbitrary strings") {
    check("rollingHash", Prop.forAll(Gen.listOf(genToken).map(_.mkString(" "))) {
      s => RollingHash.hash(s) == rollSpec(s)
    })
  }

  test("property: ShingleHashes kernel ≡ sliding-window spec, any k") {
    check("shingleHashes", Prop.forAll(genToks, Gen.choose(1, 7)) { (toks, k) =>
      ShingleHashes.hashes(strArr(toks), k).toLongArray.toSeq ==
        shingleSpec(toks, k)
    })
  }

  test("property: MinhashSig kernel ≡ per-permutation min spec") {
    val genCoefs = Gen.listOfN(8, Gen.zip(
      Gen.choose(1L, P - 1), Gen.choose(0L, P - 1)))
    check("minhashSig", Prop.forAll(genToks, Gen.choose(1, 5), genCoefs) {
      (toks, k, coefs) =>
        val (a, b) = coefs.unzip
        MinhashSig.sig(strArr(toks), k, a.toArray, b.toArray)
          .toLongArray.toSeq == minhashSpec(toks, k, a, b)
    })
  }

  test("property: SimhashSig kernel ≡ bit-counter spec") {
    check("simhashSig", Prop.forAll(genToks,
      Gen.choose(1L, P - 1), Gen.choose(0L, P - 1)) { (toks, a2, b2) =>
      SimhashSig.sig(strArr(toks), a2, b2) == simhashSpec(toks, a2, b2)
    })
  }

  test("property: SignLshSig kernel ≡ hyperplane-sign spec (dim invariant)") {
    val genVec = Gen.listOfN(SignLshSig.Dim,
      Gen.chooseNum(-5.0f, 5.0f, 0.0f, 1.0f, -1.0f))
    check("signLshSig", Prop.forAll(genVec, Gen.choose(1, 62)) { (v, planes) =>
      SignLshSig.sig(new GenericArrayData(v.toArray), planes) ==
        signLshSpec(v, planes)
    })
  }

  test("property: CosineSim kernel ≡ dot/norm spec (incl. NaN on zero norm)") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f, 0.0f))
    check("cosineSim", Prop.forAll(genVec, genVec) { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val fast = CosineSim(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null)
      val spec = cosineSpec(a, b)
      (fast, spec) match {
        case (f: Double, s) => (f.isNaN && s.isNaN) || f == s
        case _ => false
      }
    })
  }

  test("property: KMV sketch merges associatively (sketch(a∪b) ≡ merge)") {
    import graft.pipeline.Sketches
    val genHashes = Gen.listOf(Gen.choose(1L, Sketches.P - 1))
    check("kmvMerge", Prop.forAll(genHashes, genHashes, Gen.choose(2, 32)) {
      (a, b, k) =>
        val ta = a.filter(_ > 0).distinct.sorted.take(k)
        val tb = b.filter(_ > 0).distinct.sorted.take(k)
        // merging per-partition sketches ≡ sketching the full union
        Sketches.kmvSpec(ta ++ tb, k) == Sketches.kmvSpec(a ++ b, k)
    })
  }

  test("property: CMS estimate ≥ exact count, and cells merge additively") {
    import graft.pipeline.Sketches
    val genTerm = Gen.oneOf("a", "bb", "ccc", "dddd", "hot", "t1", "t2", "zz9")
    val genTerms = Gen.listOf(genTerm)
    check("cmsUpperBound", Prop.forAll(genTerms, Gen.oneOf(4, 16, 64)) {
      (terms, width) =>
        val cells = Sketches.cmsCellsSpec(terms, width)
        terms.distinct.forall { t =>
          Sketches.cmsEstimateSpec(cells, t, width) >= terms.count(_ == t)
        }
    })
    check("cmsAdditiveMerge", Prop.forAll(genTerms, genTerms, Gen.oneOf(8, 32)) {
      (a, b, width) =>
        val merged = {
          val ca = Sketches.cmsCellsSpec(a, width)
          val cb = Sketches.cmsCellsSpec(b, width)
          (ca.keySet ++ cb.keySet).map(k =>
            k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
        }
        // merging per-batch cell tables ≡ sketching the concatenation —
        // the law the streaming CMS state relies on
        merged == Sketches.cmsCellsSpec(a ++ b, width)
    })
  }

  // ---------------- Spark-backed operator laws (fewer samples) ----------

  import TestSpark.spark
  import spark.implicits._

  private val genEvents: Gen[List[SymbolEvent]] = {
    val names = Gen.oneOf("m.A", "m.B", "m.C", "m.A.f", "m.B.g")
    val kinds = Gen.oneOf(Kind.None_, Kind.Class, Kind.Method)
    val tasks = Gen.oneOf("t1", "t2")
    val ev = for {
      n <- names; k <- kinds; t <- tasks
      code <- Gen.option(Gen.oneOf("c1", "c2"))
      props <- Gen.mapOf(Gen.zip(Gen.oneOf("p", "q"), Gen.oneOf("1", "2")))
    } yield SymbolEvent(0L, t, k, n, n.split("\\.").last,
      None, None, None, code, props)
    Gen.nonEmptyListOf(ev)
      .map(_.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) })
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("full_name").toJSON.collect().toSeq.sorted

  test("property: A1 merge idempotence — replaying a batch is a no-op") {
    check("mergeIdempotent", Prop.forAll(genEvents) { events =>
      val fresh = Merge.mergeNodes(events.toDF())
      val once = Merge.upsertInto(fresh.limit(0), fresh)
      canon(Merge.upsertInto(once, fresh)) == canon(once)
    }, min = 8)
  }

  test("property: sessionize partitions events exactly (counts and sums)") {
    // every event lands in exactly one session: per-user session counts
    // sum to the user's event count, and values sum to the user's total
    val genEv = for {
      uid <- Gen.choose(1L, 3L)
      minute <- Gen.choose(0, 300)
      value <- Gen.choose(0, 50)
    } yield (uid, minute, value.toDouble)
    check("sessionizeTotal", Prop.forAll(Gen.nonEmptyListOf(genEv)) { evs =>
      val df = evs.zipWithIndex.map { case ((u, m, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 ${m / 60}%02d:${m % 60}%02d:00"), u, v)
      }.toDF("event_id", "ts", "user_id", "value")
      val out = graft.pipeline.Sessions.sessionize(df, gapSeconds = 600)
        .groupBy("user_id")
        .agg(sum("n_events").as("n"), round(sum("sum_value"), 2).as("s"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = evs.groupBy(_._1).map { case (u, es) =>
        u -> (es.size.toLong,
          BigDecimal(es.map(_._3).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      out == want
    }, min = 8)
  }

  test("property: stratifiedSample monotone in rate; 0% empty, 100% total") {
    import graft.pipeline.Corpus
    val genDocs = Gen.nonEmptyListOf(Gen.choose(0L, 5000L)).map(_.distinct)
    check("sampleMonotone", Prop.forAll(genDocs, Gen.choose(0, 100)) { (ids, r) =>
      val docs = ids.map(i => (i, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
      def sample(p: Int) = Corpus.stratifiedSample(docs, col("doc_id"),
        col("lang"), Map("en" -> p, "zh" -> p), p)
        .select("doc_id").as[Long].collect().toSet
      val atR = sample(r)
      sample(0).isEmpty && sample(100) == ids.toSet && atR.subsetOf(sample(100)) &&
        // monotone: raising the rate only ever adds rows
        atR.subsetOf(sample(math.min(100, r + 10)))
    }, min = 6)
  }

  test("property: transitiveClosure ≡ naive O(n³) closure on random DAGs") {
    val genDag = for {
      n <- Gen.choose(3, 8)
      pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i, j)
      picked <- Gen.someOf(pairs)
    } yield picked.toList
    check("closureNaive", Prop.forAll(genDag) { edges =>
      if (edges.isEmpty) true
      else {
        val reach = scala.collection.mutable.Set[(Int, Int)](edges: _*)
        var grew = true
        while (grew) {
          grew = false
          for ((a, b) <- reach.toSeq; (c, d) <- reach.toSeq if b == c)
            if (reach.add((a, d))) grew = true
        }
        val df = edges.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst")
        val got = graft.enrich.Closure.transitiveClosure(df)
          .as[(String, String)].collect()
          .map { case (s, d) => (s.drop(1).toInt, d.drop(1).toInt) }.toSet
        got == reach.toSet
      }
    }, min = 8)
  }

  test("property: piiRedact is idempotent (placeholders contain no PII)") {
    import graft.pipeline.Corpus
    val word = Gen.oneOf("lorem", "ipsum", "x1", "Data", "..", "a-b")
    val email = Gen.oneOf("bob@x.io", "a.b+c@corp.example.org")
    val ip = Gen.oneOf("10.0.0.1", "192.168.255.3")
    val phone = Gen.oneOf("555-123-4567", "800.555.1234")
    val frag = Gen.frequency(5 -> word, 2 -> email, 2 -> ip, 2 -> phone)
    val genText = Gen.listOf(frag).map(_.mkString(" "))
    check("piiIdempotent", Prop.forAll(Gen.nonEmptyListOf(genText)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Corpus.piiRedact(docs, col("text"))
        .select(col("doc_id"), col("redacted").as("text"))
      val onceMap = once.as[(Long, String)].collect().toMap
      val twice = Corpus.piiRedact(once, col("text"))
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
        .as[(Long, Long, Long, Long, String)].collect()
      twice.forall(r =>
        r._2 == 0 && r._3 == 0 && r._4 == 0 && r._5 == onceMap(r._1))
    }, min = 6)
  }

  test("property: stripBoilerplate ≡ plain-Scala model (lines, order, counts)") {
    import graft.pipeline.Corpus
    val genLine = Gen.oneOf("common", "COMMON2", "u1", "u2", "u3", "", " ")
    val genDoc = Gen.listOf(genLine).map(_.mkString("\n"))
    check("boilerModel", Prop.forAll(Gen.nonEmptyListOf(genDoc)) { docsRaw =>
      val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Corpus.stripBoilerplate(docs, minDocs = 2)
        .select("doc_id", "n_kept", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      // reference model in plain Scala: split(-1) keeps trailing empties,
      // per-doc distinct before the >=2-docs threshold
      val lines = docsRaw.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\n", -1).toSeq }
      val boiler = lines
        .flatMap { case (id, ls) => ls.filter(_.trim.nonEmpty).distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      lines.forall { case (id, ls) =>
        val kept = ls.filterNot(boiler)
        if (kept.isEmpty) !out.contains(id)
        else out.get(id).exists(r => r._2 == kept.size &&
          r._3 == (ls.size - kept.size) && r._4 == kept.mkString("\n"))
      }
    }, min = 6)
  }

  test("property: kmvDistinctBy ≡ per-group kmvSpec on random data") {
    import graft.pipeline.Sketches
    val genRow = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 40)
    } yield (g, s"val$v")
    check("kmvGrouped", Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val k = 8
      val df = rows.toDF("grp", "v")
      val got = Sketches.kmvDistinctBy(df, col("grp"), col("v"), k)
        .as[(String, Double)].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> Sketches.kmvSpec(rs.map(r => rollSpec(r._2)), k)
      }
      got == want
    }, min = 8)
  }

  test("property: triangleCounts ≡ naive enumeration on random graphs") {
    import graft.enrich.Analytics
    val genEdges = for {
      n <- Gen.choose(3, 9)
      pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i.toLong, j.toLong)
      picked <- Gen.someOf(pairs)
    } yield picked.toList
    check("triModel", Prop.forAll(genEdges) { edges =>
      if (edges.isEmpty) true
      else {
        val es = edges.toSet
        val verts = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        // naive model: every vertex triple with all three canonical edges
        val tris = for {
          a <- verts; b <- verts if a < b; c <- verts if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield Seq(a, b, c)
        val want = tris.flatten.groupBy(identity)
          .map { case (v, o) => v -> o.size.toLong }
        val got = Analytics.triangleCounts(edges.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        got == want
      }
    }, min = 8)
  }

  test("property: dedupLines is idempotent and its model holds") {
    import graft.pipeline.Corpus
    // lines of both classes: >= minLen (dedup-eligible) and short
    val longLine = Gen.oneOf("aaaaaaaaaa", "bbbbbbbbbb", "cccccccccc")
    val shortLine = Gen.oneOf("x", "y", "", "zz")
    val genDoc = Gen.listOf(Gen.frequency(2 -> longLine, 3 -> shortLine))
      .map(_.mkString("\n"))
    check("dedupLinesModel", Prop.forAll(Gen.nonEmptyListOf(genDoc)) { docsRaw =>
      val minLen = 10
      val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Corpus.dedupLines(docs, minLen)
        .select("doc_id", "n_kept", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      // model: global first occurrence of each eligible line wins
      val lines = docsRaw.zipWithIndex.flatMap { case (t, i) =>
        t.split("\n", -1).zipWithIndex.map { case (l, p) => (i.toLong, p, l) } }
      val firstOcc = lines.filter(_._3.length >= minLen)
        .groupBy(_._3).map { case (l, occ) => l -> occ.map(o => (o._1, o._2)).min }
      val modelOk = docsRaw.indices.forall { i =>
        val mine = lines.filter(_._1 == i.toLong)
        val kept = mine.filter { case (d, p, l) =>
          l.length < minLen || firstOcc(l) == ((d, p)) }
        out(i.toLong) == ((i.toLong, kept.size.toLong,
          (mine.size - kept.size).toLong, kept.map(_._3).mkString("\n")))
      }
      // idempotence: a second pass removes nothing
      val again = Corpus.dedupLines(
        Corpus.dedupLines(docs, minLen)
          .select(col("doc_id"), col("clean_text").as("text")), minLen)
        .select("doc_id", "n_removed").as[(Long, Long)].collect()
      modelOk && again.forall(_._2 == 0L)
    }, min = 6)
  }

  test("property: duplicatedSpanStats ≡ plain-Scala shingle model") {
    import graft.pipeline.Dedup
    val genDoc = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.mkString(" "))
    check("spanModel", Prop.forAll(Gen.nonEmptyListOf(genDoc)) { docsRaw =>
      val k = 2
      val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // model: per-doc distinct k-shingles; a shingle is duplicated if it
      // appears in >= 2 docs (shingleSpec mirrors the kernel's short-doc
      // whole-text fallback)
      def shingles(t: String): Set[String] = {
        val toks = t.split(" ").toSeq
        (if (toks.length < k) Seq(toks) else toks.sliding(k).toSeq)
          .map(_.mkString(" ")).toSet
      }
      val perDoc = docsRaw.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }
      val dupSet = perDoc.flatMap { case (id, ss) => ss.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val out = Dedup.duplicatedSpanStats(docs, k)
        .select("doc_id", "n_shingles", "n_dup")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      perDoc.forall { case (id, ss) =>
        out(id) == ((id, ss.size.toLong, ss.count(dupSet).toLong))
      }
    }, min = 6)
  }

  test("property: canonicalUrl is idempotent and variant-insensitive") {
    import TestSpark.spark.implicits._
    val gen = for {
      scheme <- Gen.oneOf("http://", "HTTPS://", "ftp://", "")
      www <- Gen.oneOf("www.", "WWW.", "", "www.www.", "WWW.www.")
      host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
      seg <- Gen.listOfN(2, Gen.alphaNumStr.map(_.take(5)))
      q <- Gen.oneOf("", "?a=1&b=2", "#frag")
      slash <- Gen.oneOf("", "/")
    } yield s"$scheme$www$host.com${seg.mkString("/", "/", "")}$q$slash"
    val urls = Gen.listOfN(300, gen).sample.get
    val canon = graft.pipeline.Corpus.canonicalUrl _
    val df = urls.toDF("u")
      .select(col("u"), canon(col("u")).as("c1"))
      .withColumn("c2", canon(col("c1")))
    // idempotence: a canonical URL re-canonicalizes to itself
    assert(df.filter(col("c1") =!= col("c2")).count() === 0L)
    // variant-insensitivity: scheme/www/query/slash variants of one
    // base URL all land on one canonical key
    val variants = Seq("http://", "HTTPS://", "").flatMap(sc =>
      Seq("www.", "", "www.www.").flatMap(w => Seq("", "?x=1").flatMap(q =>
        Seq("", "/").map(t => s"$sc${w}base.com/A/b$q$t"))))
    val keys = variants.toDF("u").select(canon(col("u")))
      .distinct().as[String].collect()
    assert(keys.toSeq === Seq("base.com/A/b"))
  }

  test("property: budgetFill never over-allocates a stratum or the budget") {
    import TestSpark.spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L)).map(_.take(8))
    (1 to 5).foreach { _ =>
      val avails = gen.sample.get
      val df = avails.zipWithIndex.map { case (a, i) => (s"s$i", a) }
        .toDF("stratum", "avail")
      val out = graft.pipeline.Corpus.budgetFill(df, rounds = 8).collect()
      val b = avails.sum * 8 / 10
      out.foreach { r =>
        val (avail, alloc, capped) =
          (r.getLong(1), r.getLong(2), r.getInt(3))
        assert(alloc <= avail, s"over-allocated: $alloc > $avail")
        if (capped == 1) assert(alloc === avail)
        else assert(alloc < avail)
      }
      assert(out.map(_.getLong(2)).sum <= b)
    }
  }

  /** The catalog's zero-sign invariant (QueryCatalog header): Spark's
    * round never emits IEEE `-0.0`, and the oracle-side `round(…) + 0.0`
    * normalization is exact — it flips `-0.0` to `+0.0` and is a bitwise
    * no-op on every other double. DuckDB's round DOES preserve the sign
    * of a tiny negative (the r10 `s_kmeans` hash failure), so both halves
    * of this law are what keep the two engines byte-identical. */
  test("property: Spark round never emits -0.0; `+ 0.0` normalization is exact") {
    import TestSpark.spark.implicits._
    def rawBits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    val negZeroBits = rawBits(-0.0)

    // tiny negatives (round → zero) plus ordinary magnitudes, both signs
    val tiny = Gen.chooseNum(1e-12, 4.9e-5).map(-_)
    val anyD = Gen.oneOf(tiny, Gen.chooseNum(-1e6, 1e6), Gen.const(-0.0))
    val samples = (1 to 400).flatMap(_ => anyD.sample) :+ -0.0 :+ -1e-9
    val rounded = samples.toDF("x")
      .select(round(col("x"), 4).as("r"), round(col("x"), 6).as("r6"))
      .collect()
    rounded.foreach { row =>
      Seq(row.getDouble(0), row.getDouble(1)).foreach { r =>
        assert(rawBits(r) != negZeroBits, s"Spark round emitted -0.0")
      }
    }
    // + 0.0 law: kills the sign of zero, exact no-op elsewhere
    samples.foreach { x =>
      val n = x + 0.0
      if (x == 0.0) assert(rawBits(n) == rawBits(0.0))
      else assert(rawBits(n) == rawBits(x))
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExpressions, RollingHash, ShingleHashes}

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * quality scoring, language-ID heuristic, fingerprinting, shingling, and
  * the portable hash used by MinHash/SimHash.
  *
  * Everything here is built from codegen'd Spark SQL builtins (no UDFs) and
  * is chosen to be bit-for-bit reproducible in ANSI SQL (the DuckDB
  * oracle): integer arithmetic stays within 63 bits, regexes use the
  * portable subset common to Java regex and RE2.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Luhn checksum validity of a digit string — the mod-10 rule every
    * payment-card number satisfies (and the reason card-shaped PII can
    * be VALIDATED, not just pattern-matched): from the RIGHT, every
    * second digit doubles (minus 9 past 4), and the total must divide
    * by 10. Pure integer arithmetic over `sequence`/`aggregate` —
    * engine-portable, no float anywhere. Non-digit input is the
    * caller's contract (candidates come from a digits-only regex). */
  def luhnValid(s: Column): Column = {
    val n = length(s)
    val total = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      // i counts 1..n from the left; right-position n−i doubles when odd
      val d = s.substr(i, lit(1)).cast("long")
      val dbl = d * 2 - when(d > 4, 9L).otherwise(0L)
      acc + when((n - i) % 2 === 1, dbl).otherwise(d)
    })
    total % 10 === 0
  }

  /** Token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column =
    when(length(normalize(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** The Gopher rules' stop-word list (Rae et al. 2021, App. A1.1): a
    * document must contain ≥ 2 of these to pass the screen. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Flesch reading-ease heuristic, engine-portable: sentences =
    * `[.!?]+` runs in the RAW text (min 1), words = [[tokenCount]]
    * (min 1), syllables = `[aeiouy]+` vowel groups in the normalized
    * text with a one-per-word aggregate floor (true Flesch counts ≥1
    * syllable per word; vowel-less tokens — numbers — would otherwise
    * undercount). 206.835 − 1.015·(w/s) − 84.6·(syl/w), rounded to 4.
    * Pure narrow regexp arithmetic — codegen'd, no shuffle. */
  def fleschEase(text: Column): Column = {
    val w = greatest(tokenCount(text).cast("double"), lit(1.0))
    val s = greatest(regexp_count(text, lit("[.!?]+")).cast("double"),
      lit(1.0))
    val syl = greatest(
      regexp_count(normalize(text), lit("[aeiouy]+")).cast("double"), w)
    round(lit(206.835) - lit(1.015) * w / s - lit(84.6) * syl / w, 4)
  }

  /** Stopword ratio over tokens, rounded for cross-engine comparability. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = size(filter(toks, t => t.isInCollection(stopwords)))
    round(stops.cast("double") / greatest(size(toks), lit(1)), 4)
  }

  /** Mean token length — a crude fluency signal. */
  def meanTokenLen(text: Column): Column =
    round(
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double")
        / greatest(tokenCount(text), lit(1)), 4)

  /** Alphabetic-character ratio of the raw text. */
  def alphaRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double")
        / greatest(length(text), lit(1)), 4)

  /** Composite quality score ∈ [0,1]: 0.5·alphaRatio + 0.3·lengthBand +
    * 0.2·(1 − stopwordRatio). Computed as ONE exact integer fraction with a
    * single final double division — summing three independently-rounded
    * doubles lands on .00005 rounding boundaries where engines disagree by
    * 1 ulp; a rational numerator/denominator never does. */
  def qualityScore(text: Column): Column = {
    val a = (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("long")
    val l = greatest(length(text), lit(1)).cast("long")
    val t = greatest(tokenCount(text), lit(1)).cast("long")
    val stops = size(filter(tokens(text), tk => tk.isInCollection(stopwords))).cast("long")
    // length band lbNum/lbDen: 1 inside [100,5000], len/100 below, 1/2 above
    val lbNum = when(length(text).between(100, 5000), lit(1L))
      .when(length(text) < 100, length(text).cast("long"))
      .otherwise(lit(1L))
    val lbDen = when(length(text).between(100, 5000), lit(1L))
      .when(length(text) < 100, lit(100L))
      .otherwise(lit(2L))
    val num = lit(5L) * a * t * lbDen + lit(3L) * lbNum * l * t + lit(2L) * (t - stops) * l * lbDen
    val den = lit(10L) * l * t * lbDen
    round(num.cast("double") / den.cast("double"), 4)
  }

  /** Language-ID heuristic: score each candidate language by counting hits
    * of its marker-token set, argmax with a fixed preference order on
    * ties. On this corpus (shared vocabulary) it is a structural stand-in
    * for a real n-gram model: the scoring/argmax plumbing is what matters
    * at scale, and it is fully deterministic/SQL-portable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "la"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("de5", "shi4", "le5")) // pinyin-ish placeholders

  def langIdGuess(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isInCollection(markers))).as("score"),
        lit(langMarkers.size - langMarkers.indexWhere(_._1 == lang)).as("prio"),
        lit(lang).as("lang"))
    }
    when(size(filter(toks, t => t.isInCollection(langMarkers.flatMap(_._2)))) === 0,
      lit("unknown"))
      .otherwise(greatest(scored: _*).getField("lang"))
  }

  /** Content-defined fingerprint: md5 of the normalized text. Identical
    * builtin exists in DuckDB → exact-dup grouping is oracle-checkable. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** 63-bit-safe polynomial rolling hash of a string, mod p = 2^31-1.
    * h = (h*31 + ascii(c)) % p per char. Reproducible in any SQL engine
    * with 64-bit ints (intermediates < 2^36). Used as the base hash for
    * MinHash / SimHash / n-gram fingerprints. */
  val HashP = 2147483647L // 2^31 - 1

  def rollingHash(s: Column): Column =
    GraftExpressions.col(RollingHash(GraftExpressions.expr(s)))

  /** The portable HOF spelling of [[rollingHash]] — kept as the executable
    * spec the native expression is property-tested against. */
  def rollingHashSpec(s: Column): Column =
    aggregate(
      split(s, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % HashP)

  /** Word shingles: k-token windows of the normalized text, joined by a
    * single space; distinct. Documents shorter than k tokens get their
    * whole token string as the single shingle. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " "))))
  }

  /** Hash every shingle with the rolling hash → distinct Long set.
    * One codegen'd pass over the token array (no per-shingle string
    * build); value-identical to [[shingleHashesSpec]]. */
  def shingleHashes(text: Column, k: Int): Column =
    GraftExpressions.col(
      ShingleHashes(GraftExpressions.expr(tokens(text)), k))

  /** Portable HOF spelling of [[shingleHashes]] — the executable spec the
    * native expression is property-tested against. */
  def shingleHashesSpec(text: Column, k: Int): Column =
    array_distinct(transform(shingles(text, k), s => rollingHashSpec(s)))
}

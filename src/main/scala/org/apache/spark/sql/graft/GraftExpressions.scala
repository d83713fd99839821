package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels of the
  * text/dedup/similarity pipeline.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * evaluated interpreted — a char-by-char rolling hash written as
  * `aggregate(split(s,""), ...)` costs ~50µs/shingle in tree-walk overhead
  * and is re-evaluated once per signature slot. These expressions compute
  * the identical values (bit-for-bit, so the DuckDB oracle SQL is
  * unchanged) in a tight loop, with `doGenCode` so they stay inside
  * whole-stage codegen.
  */
object GraftExpressions {
  /** Wrap a raw Catalyst expression as a user-facing Column (Spark 4
    * classic backend). */
  def col(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}

/** h = (h*31 + codepoint(c)) % (2^31-1) over the string's characters —
  * identical to `aggregate(split(s,""), 0L, (h,c) -> (h*31+ascii(c)) % p)`
  * (TextFunctions.rollingHash's portable definition, replayed by the
  * DuckDB oracle) but evaluated in one codegen'd loop. */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_hash"
}

object RollingHash {
  val P: Long = 2147483647L // 2^31 - 1

  /** Iterates code points (not UTF-16 units) to match Spark's
    * `split(s, "")` + `ascii` on supplementary characters. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Distinct rolling hashes of the k-token shingles of a token array —
  * identical values to hashing `array_join(slice(toks, i, k), " ")` per
  * window with [[RollingHash]] then `array_distinct` (first-occurrence
  * order), but in one codegen'd pass with no per-shingle string
  * allocation: the joining space (codepoint 32) is folded into the hash
  * between tokens. Arrays shorter than k collapse to one whole-array
  * shingle (TextFunctions.shingles semantics). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def hashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val kk = if (n < k) n else k
    val windows = if (n < k) 1 else n - k + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i < windows) {
      var h = 0L
      var j = 0
      while (j < kk) {
        if (j > 0) h = (h * 31L + 32L) % RollingHash.P // ' ' between tokens
        val s = arr.getUTF8String(i + j).toString
        var c = 0
        val len = s.length
        while (c < len) {
          val cp = s.codePointAt(c)
          h = (h * 31L + cp) % RollingHash.P
          c += Character.charCount(cp)
        }
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** Full MinHash signature in ONE pass over the token array: shingle
  * hashes (as [[ShingleHashes]]) folded directly into the per-permutation
  * minima — no intermediate array, no explode/groupBy shuffle. `coefs`
  * are the (a,b) permutation constants; value-identical to
  * `min((h*a+b) % p)` per slot over the distinct shingle hashes (min is
  * insensitive to the distinctness, so dedup is skipped). */
case class MinhashSig(child: Expression, k: Int, coefsA: Seq[Long],
    coefsB: Seq[Long]) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = coefsA.toArray
  @transient private lazy val bArr = coefsB.toArray

  override def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[ArrayData], k, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.MinhashSig.sig($c, $k, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSig {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def sig(toks: ArrayData, k: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = toks.numElements()
    val kk = if (n < k) n else k
    val windows = if (n < k) 1 else n - k + 1
    val m = a.length
    val mins = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < windows) {
      var h = 0L
      var j = 0
      while (j < kk) {
        if (j > 0) h = (h * 31L + 32L) % RollingHash.P
        val s = toks.getUTF8String(i + j).toString
        var c = 0
        val len = s.length
        while (c < len) {
          val cp = s.codePointAt(c)
          h = (h * 31L + cp) % RollingHash.P
          c += Character.charCount(cp)
        }
        j += 1
      }
      var p = 0
      while (p < m) {
        val v = (h * a(p) + b(p)) % RollingHash.P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Full 62-bit SimHash in ONE pass over the token array: per-token rolling
  * hash h1 and remapped h2, 62 +1/−1 bit counters, final sign fold —
  * value-identical to the explode + 62-sum aggregate spelling with no
  * shuffle. */
case class SimhashSig(child: Expression, a2: Long, b2: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimhashSig.sig(input.asInstanceOf[ArrayData], a2, b2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.SimhashSig.sig($c, ${a2}L, ${b2}L)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash_sig"
}

object SimhashSig {
  def sig(toks: ArrayData, a2: Long, b2: Long): Long = {
    val counts = new Array[Int](62)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i).toString
      var h = 0L
      var c = 0
      val len = s.length
      while (c < len) {
        val cp = s.codePointAt(c)
        h = (h * 31L + cp) % RollingHash.P
        c += Character.charCount(cp)
      }
      val h2 = (h * a2 + b2) % RollingHash.P
      var j = 0
      while (j < 31) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        if (((h2 >> j) & 1L) == 1L) counts(j + 31) += 1 else counts(j + 31) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 62) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Multi-plane sign-LSH signature of a float-array column in ONE pass:
  * bit i of the result is sign(dot(v, plane_i)) where plane_i's component
  * j is the deterministic pseudo-random value
  * `((i*64+j)*2654435761 % 1000003) / 1000003.0 - 0.5` (the engine-portable
  * stand-in for a seeded Gaussian — replayed verbatim by the DuckDB
  * oracle). Value-identical to the `aggregate(zip_with(...))` HOF
  * spelling (graft.pipeline.Similarity.lshBucket): per-plane sequential
  * double accumulation over j, so the sign can never diverge between
  * engines. */
case class SignLshSig(child: Expression, numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPlanes >= 1 && numPlanes <= 62)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SignLshSig.sig(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.SignLshSig.sig($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): SignLshSig =
    copy(child = newChild)
  override def prettyName: String = "graft_sign_lsh_sig"
}

object SignLshSig {
  /** The per-plane component stride AND the maximum supported embedding
    * dimensionality — a HARD invariant shared with the oracle SQL
    * (QueryCatalog.lshSigSql interpolates it): `planeComponent`'s
    * `i*Dim+j` indexing would alias plane i's tail onto plane i+1 for
    * vectors longer than Dim, so `sig` rejects those outright (shorter
    * vectors are fine — planes can't overlap below the stride). */
  val Dim = 64

  /** Component j of hyperplane i — must stay identical to
    * graft.pipeline.Similarity.planeComponent and the oracle SQL. */
  def planeComponent(i: Int, j: Int): Double =
    (((i.toLong * Dim + j) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  def sig(v: ArrayData, numPlanes: Int): Long = {
    val n = v.numElements()
    if (n > Dim) throw new IllegalArgumentException(
      s"graft_sign_lsh_sig: embedding dim $n exceeds plane stride $Dim " +
        "(planes would alias)")
    var out = 0L
    var i = 0
    while (i < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += v.getFloat(j).toDouble * planeComponent(i, j)
        j += 1
      }
      if (dot > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** Cosine similarity of two float-array columns, computed in double with
  * sequential accumulation — the same operation order as the
  * `aggregate(zip_with(...))` formulation (and the oracle's SQL), so the
  * value is bit-identical; results are rounded by callers before any
  * ranking. Null if either side is null or lengths differ. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = (double) $a.getFloat($i);
         |    final double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** 64-bit DIFFERENCE HASH (dHash) of a raw 8-bit grayscale 9×8 pixel
  * grid — the classic perceptual image fingerprint (Krawetz's dHash):
  * bit `r*8+c` is set when `pixel[r*9+c] < pixel[r*9+c+1]` (each row of
  * 9 pixels yields 8 left-vs-right comparisons). The DECODE step (codec
  * bytes → grayscale grid) is the multimodal pillar's deterministic
  * stub — no image libs in-container — and this kernel is the REAL
  * Spark-side plumbing it feeds: a codegen'd one-pass scan of the
  * binary column. Bytes compare UNSIGNED (0..255, the oracle's get-byte
  * arithmetic); payloads shorter than the 72-byte grid yield NULL (the
  * m_corrupt degradation contract: never throw, never fabricate). */
case class DHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < DHash64.GridBytes) null else DHash64.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.length < ${DHash64.GridBytes}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.graft.DHash64.hash($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_dhash64"
}

object DHash64 {
  /** 9 columns × 8 rows of 8-bit gray — the canonical dHash grid. */
  val GridBytes = 72

  def hash(b: Array[Byte]): Long = {
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = b(r * 9 + c) & 0xff
        val rt = b(r * 9 + c + 1) & 0xff
        if (l < rt) out |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    out
  }
}

/** CONTENT-DEFINED chunk fingerprints of a string in ONE pass: cut
  * wherever the [[RollingHash]] of the trailing `window` code points is
  * ≡ 0 mod `modulus` (maintained incrementally — h' = h·31 + c_in −
  * c_out·31^window, all mod 2^31−1), emitting the [[RollingHash]] of
  * each chunk as it closes (running hash, reset at every boundary).
  * Value-identical to the HOF spelling — `filter(sequence(w, len), p ->
  * rollingHash(substr(p−w+1, w)) % m = 0)` boundaries, then per-slice
  * rollingHash — which costs O(len·window) substring allocations and
  * falls out of codegen; this is O(len) with zero allocation per
  * position, inside whole-stage codegen. The final partial chunk closes
  * at end-of-string (not emitted separately when the last position was
  * already a boundary). */
case class CdcChunkHashes(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1 && modulus >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunkHashes.hashes(input.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.CdcChunkHashes.hashes($c, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_cdc_chunk_hashes"
}

object CdcChunkHashes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def hashes(s: UTF8String, window: Int, modulus: Int): ArrayData = {
    val str = s.toString
    val P = RollingHash.P
    var pw = 1L // 31^window mod P
    var t = 0
    while (t < window) { pw = (pw * 31L) % P; t += 1 }
    val ring = new Array[Long](window)
    var wh = 0L       // rolling trailing-window hash
    var ch = 0L       // running current-chunk hash
    var chunkLen = 0
    var cpCount = 0   // code-point position (1-based)
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      cpCount += 1
      ch = (ch * 31L + cp) % P
      chunkLen += 1
      val slot = (cpCount - 1) % window
      if (cpCount <= window) {
        ring(slot) = cp
        wh = (wh * 31L + cp) % P
      } else {
        val outCp = ring(slot)
        ring(slot) = cp
        wh = ((wh * 31L + cp - (outCp * pw) % P) % P + P) % P
      }
      if (cpCount >= window && wh % modulus == 0) {
        out += ch
        ch = 0L
        chunkLen = 0
      }
    }
    if (chunkLen > 0) out += ch
    new GenericArrayData(out.toArray)
  }
}

/** Hilbert-curve index of a 2-D bucket pair (Hilbert 1891; the xy→d
  * walk as given by Warren, Hacker's Delight / the public-domain
  * Wikipedia spelling): unlike the Morton/Z-order interleave, every
  * consecutive pair of Hilbert keys is GRID-ADJACENT, so a range of
  * keys covers a compact 2-D region — tighter parquet row-group
  * min/max pruning for 2-D predicates at the cost of this
  * data-dependent rotate/reflect walk (which is why Z-order is the
  * cheap default and Hilbert the quality upgrade; Delta/Iceberg
  * expose both). One codegen'd integer loop per row, `bits` levels. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.HilbertIndex.index($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_hilbert_index"
}

object HilbertIndex {
  /** xy→d for a 2^bits × 2^bits grid. Coordinates are masked into
    * range (the caller buckets them; masking keeps the kernel total). */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

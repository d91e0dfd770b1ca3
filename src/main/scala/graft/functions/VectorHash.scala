package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash/vector hot paths.
  *
  * The composable versions of these ops (k× `transform` + `aggregate` /
  * `zip_with` higher-order functions) are interpreted per element per
  * closure: a 64-hash MinHash signature over an n-shingle document costs
  * n·k generic expression evaluations. These expressions do the same work
  * as one `eval` per row of tight primitive-typed Scala — measured ~10×
  * on the sf0.1 dedup benchmarks — and use double hashing
  * (h_i = h1 + i·h2, the standard MinHash trick) so each element is hashed
  * twice, not k times.
  *
  * `CodegenFallback` is deliberate: the expression is one virtual call per
  * ROW (not per element), so staying outside whole-stage codegen costs a
  * rounding error while keeping the implementation simple and reviewable.
  * Inputs arrive as Catalyst `ArrayData` — no conversion to Scala
  * collections anywhere on the hot path.
  */
object VectorHash {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col(e: Expression): Column = Bridge.column(e)

  /** MinHash signature of a string array: array of `k` 64-bit minima. */
  def minhashSignature(shingles: Column, k: Int): Column =
    col(MinHashSignatureExpr(expr(shingles), k))

  /** LSH band keys over a signature: array of `bands` longs; element b
    * hashes signature[b·r .. b·r+r) with seed b (band-distinct keyspace).
    * Pair with `posexplode` to get (band, key) join keys.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    col(LshBandKeysExpr(expr(signature), bands, rowsPerBand))

  /** 64-bit SimHash over a token array. */
  def simhash64(tokens: Column): Column = col(SimHash64Expr(expr(tokens)))

  /** Cosine similarity of two float-array embeddings (double accumulate). */
  def cosine(a: Column, b: Column): Column = col(CosineSimExpr(expr(a), expr(b)))

  /** Random-hyperplane LSH bucket: `planes` Rademacher-projection sign bits
    * packed into an int (deterministic seeded component hashes). `seed`
    * selects an independent hyperplane family — the per-table seed of
    * multi-table (OR-amplified) LSH; seed 0 is bit-identical to the
    * historical single-table behavior.
    */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Long = 0L): Column =
    col(HyperplaneBucketExpr(expr(vec), planes, seed))

  /** Distinct word n-gram shingles of a text, one pass: whitespace
    * tokenization (Java regex `\s` class), lowercase, n-grams joined with a
    * single space, first-occurrence order. Semantics identical to the
    * composable `TextOps.shingles(TextOps.tokens(text), n)` (asserted in
    * OperatorsSpec) — but one eval per row instead of a regexp plus three
    * interpreted higher-order functions plus array_distinct.
    */
  def wordShingles(text: Column, n: Int): Column = col(WordShinglesExpr(expr(text), n))

  /** Product-quantization code assignment: array of `m` sub-centroid
    * indices (L2-argmin per contiguous subspace, first-minimum tie-break).
    * Semantics identical to the composable per-subspace
    * `transform`+`zip_with` argmin in `Similarity` (pinned in
    * OperatorsSpec) — but one eval per row of primitive loops instead of
    * m·ksub interpreted lambda folds per vector on the encode hot path.
    */
  def pqCodes(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    col(PqCodesExpr(expr(vec), codebooks.map(_.map(_.toArray).toArray).toArray))

  /** Content-defined chunk boundaries of a text: the (1-based, code-point)
    * positions `i ≥ window` where the polynomial hash of the last `window`
    * code points (base 31, plain long arithmetic — engine-replayable, no
    * overflow: 8 × 0x10FFFF × 31⁷ < 2⁶³) is ≡ 0 mod `divisor`. Boundaries
    * depend only on a local window, so they SURVIVE insertions/deletions
    * elsewhere in the document — the property that makes chunk-level dedup
    * stable under edits where fixed-span chunking shifts every boundary
    * downstream (FastCDC's core idea, rolling-hash gear simplified to an
    * explicit window polynomial both engines can state).
    */
  def contentBoundaries(text: Column, window: Int, divisor: Int): Column =
    col(ContentBoundariesExpr(expr(text), window, divisor))

  private val Seed1 = 42L
  private val Seed2 = -7046029254386353131L

  private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  // ------------------------------------------------------------------ exprs

  case class WordShinglesExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_shingles"

    // Java-regex \s class, to match the composable regexp form exactly
    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    protected override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val tokens = new java.util.ArrayList[String]()
      var i = 0
      val len = s.length
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) tokens.add(s.substring(start, i).toLowerCase(java.util.Locale.ROOT))
      }
      val m = tokens.size - n + 1
      val seen = new java.util.LinkedHashSet[String]()
      var t = 0
      while (t < m) {
        val sb = new java.lang.StringBuilder(tokens.get(t))
        var j = 1
        while (j < n) { sb.append(' ').append(tokens.get(t + j)); j += 1 }
        seen.add(sb.toString)
        t += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k2 = 0
      while (it.hasNext) { out(k2) = UTF8String.fromString(it.next()); k2 += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
  }

  case class MinHashSignatureExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = hashUtf8(s, Seed1)
          val h2 = hashUtf8(s, Seed2) | 1L // odd so strides cover the ring
          var j = 0
          var h = h1
          while (j < k) {
            if (h < mins(j)) mins(j) = h
            h += h2
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr = copy(child = c)
  }

  case class LshBandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with CodegenFallback {
    require(bands > 0 && rowsPerBand > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_lsh_bands"

    protected override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val keys = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = b.toLong // band-distinct seed
        var j = b * rowsPerBand
        val end = math.min(j + rowsPerBand, sig.numElements())
        while (j < end) {
          acc = XXH64.hashLong(sig.getLong(j), acc)
          j += 1
        }
        keys(b) = acc
        b += 1
      }
      new GenericArrayData(keys)
    }
    override protected def withNewChildInternal(c: Expression): LshBandKeysExpr = copy(child = c)
  }

  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counters = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = hashUtf8(arr.getUTF8String(i), Seed1)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counters(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  }

  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"
    // the eval reads 4-byte floats positionally; without a declared input
    // type an array<double> column would be reinterpreted as garbage — the
    // implicit cast coerces array<double> (and errors on non-arrays) at
    // analysis time instead
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))

    protected override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom > 0) dot / denom else 0.0
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
      copy(left = l, right = r)
  }

  case class PqCodesExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    private val m = codebooks.length
    private val dsub = codebooks(0)(0).length
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_codes"
    override def inputTypes = Seq(ArrayType(FloatType))

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val out = new Array[Any](m)
      var s = 0
      while (s < m) {
        val book = codebooks(s)
        val base = s * dsub
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cent = book(c)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = v.getFloat(base + i).toDouble - cent(i).toDouble
            d += diff * diff
            i += 1
          }
          // strict less-than keeps the FIRST minimum — same tie-break as
          // the composable array_position form
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): PqCodesExpr = copy(child = c)
  }

  case class ContentBoundariesExpr(child: Expression, window: Int, divisor: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(window >= 1 && divisor >= 1)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_content_boundaries"
    override def inputTypes = Seq(StringType)

    protected override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // code-point walk (DuckDB's split('')/ascii() are code-point-based;
      // UTF-16 charAt would diverge on supplementary characters)
      val ring = new Array[Long](window)
      val out = new java.util.ArrayList[Any]()
      var cpIdx = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        ring(cpIdx % window) = cp.toLong
        cpIdx += 1
        if (cpIdx >= window) {
          var h = 0L
          var k = 0
          while (k < window) {
            h = h * 31L + ring((cpIdx - window + k) % window)
            k += 1
          }
          if (h % divisor == 0) out.add(cpIdx)
        }
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): ContentBoundariesExpr =
      copy(child = c)
  }

  case class HyperplaneBucketExpr(child: Expression, planes: Int, seed: Long = 0L)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(planes > 0 && planes <= 30)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_hyperplane_bucket"
    override def inputTypes = Seq(ArrayType(FloatType))

    // the (plane, dim) → ±1 Rademacher matrix is a pure function of the
    // hash — materialize it once per expression instance (growing to the
    // largest dimension seen) instead of paying planes×dim XXH64 calls per
    // ROW: for 12 planes × 768 dims that is 9,216 hashes/row on the hot
    // bucketing path of lshTopK/embeddingDuplicatePairs.
    // `seed` folds in as seed·1000003 + plane, so seed 0 reproduces the
    // historical per-plane hash stream bit-exactly (stored bucket keys
    // stay valid) while each seed ≥ 1 draws an independent family — the
    // per-table seed of multi-table (OR-amplified) LSH
    @transient private var signs: Array[Array[Float]] = _
    private def signsFor(n: Int): Array[Array[Float]] = {
      if (signs == null || signs(0).length < n)
        signs = Array.tabulate(planes)(p => Array.tabulate(n)(i =>
          if ((XXH64.hashLong(i.toLong, seed * 1000003L + p.toLong) & 1L) == 1L) 1.0f else -1.0f))
      signs
    }

    protected override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val s = signsFor(n)
      var bucket = 0
      var p = 0
      while (p < planes) {
        val row = s(p)
        var proj = 0.0
        var i = 0
        while (i < n) {
          proj += v.getFloat(i) * row(i)
          i += 1
        }
        bucket = (bucket << 1) | (if (proj >= 0) 1 else 0)
        p += 1
      }
      bucket
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr = copy(child = c)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions for record linkage.
  *
  * Jaro-Winkler is the standard comparator for fuzzy entity resolution
  * (the reference's pipeline dedups survey metadata by exact keys only —
  * `SurveyMetadataHelper` joins on surveyid/fileid — but a training-data
  * curation engine needs fuzzy linkage for name/title fields at scale).
  *
  * Semantics pinned to the textbook definition that DuckDB's
  * `jaro_winkler_similarity` also implements (probed empirically, see
  * LinkageSpec): matching window `max(|a|,|b|)/2 - 1`, transpositions =
  * half the out-of-order matches, Winkler boost `+ l·p·(1-J)` with prefix
  * cap l ≤ 4, scale p = 0.1, applied only when J > 0.7, and EITHER side
  * empty → 0.0 (including both empty — the DuckDB convention, not 1.0).
  * This makes the expression directly oracle-checkable: the engine column
  * and the DuckDB column agree to the last double bit on ASCII data
  * because both run the same integer count / double divide sequence.
  *
  * One eval per row of primitive char loops; `CodegenFallback` for the
  * same reason as [[VectorHash]] — one virtual call per row is noise, and
  * the O(|a|·w) inner loop dominates regardless of codegen.
  */
object StringSim {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col(e: Expression): Column = Bridge.column(e)

  /** Jaro-Winkler similarity of two strings in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    col(JaroWinklerExpr(expr(a), expr(b)))

  /** Plain Jaro similarity (no prefix boost). */
  def jaro(a: Column, b: Column): Column =
    col(JaroExpr(expr(a), expr(b)))

  /** Shared primitive: Jaro similarity over char sequences. */
  private[graft] def jaroSim(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both sides in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  private[graft] def jaroWinklerSim(a: String, b: String): Double = {
    val j = jaroSim(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  case class JaroExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro"
    override def inputTypes = Seq(StringType, StringType)
    protected override def nullSafeEval(l: Any, r: Any): Any =
      jaroSim(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroExpr =
      copy(left = l, right = r)
  }

  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override def inputTypes = Seq(StringType, StringType)
    protected override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinklerSim(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
      copy(left = l, right = r)
  }
}

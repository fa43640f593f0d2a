package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for [[JaroWinkler]] — called from both interpreted
  * eval and generated code (a top-level object gets static forwarders, so
  * the generated Java calls `JaroWinklerImpl.jw(a, b)` directly; the
  * algorithm is too branchy to inline into the generated source and a
  * static call keeps the whole-stage pipeline intact).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (rapidfuzz):
  *  - textbook Jaro with match window max(⌊max(|a|,|b|)/2⌋−1, 0),
  *    transpositions = ⌊raw mismatches/2⌋;
  *  - 0.0 when either string is empty (INCLUDING empty-vs-empty — rapidfuzz
  *    convention, not the textbook 1.0) or no characters match;
  *  - Winkler prefix boost ℓ·0.1·(1−jaro), ℓ = common prefix capped at 4,
  *    applied only when jaro > 0.7 (strict);
  *  - accumulation order mirrors rapidfuzz exactly
  *    (((m/|a| + m/|b|) + (m−t)/m) / 3, then sim + (ℓ·0.1)·(1−sim)) so the
  *    doubles are bit-identical, not just close.
  */
object JaroWinklerImpl {
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val jaro = jaroSim(a, b)
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l.toDouble * 0.1 * (1.0 - jaro)
    } else jaro
  }

  private def jaroSim(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && b.charAt(j) == a.charAt(i)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var raw = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) raw += 1
        j += 1
      }
      i += 1
    }
    val t = raw / 2
    var sim = 0.0
    sim += m.toDouble / la
    sim += m.toDouble / lb
    sim += (m.toDouble - t) / m
    sim / 3.0
  }
}

/** Codegen'd Jaro-Winkler similarity (see [[JaroWinklerImpl]] for the pinned
  * semantics). The reference has only exact-match string ops
  * (reference: jobs/ingest_xlsx_to_parquet.py:27-29); fuzzy name matching is
  * part of the record-linkage surface a large-scale curation pipeline needs
  * alongside levenshtein (q91) and the FastSS fuzzy join (q113).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two strings, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

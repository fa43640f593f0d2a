package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays, summed in index order from a
  * 0.0 accumulator — the codegen'd replacement for
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, which Spark evaluates
  * INTERPRETED (higher-order functions are CodegenFallback and allocate an
  * intermediate array per row).
  *
  * Fold order is identical to the declarative form and to DuckDB's
  * `list_reduce` mirror (0.0 + x₁ is IEEE-exact), so swapping this in
  * changes nothing bit-wise — only removes interpretation overhead from
  * every cosine in the ANN/near-dup operators.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two float/double arrays, got ${left.dataType} / ${right.dataType}")

  private def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  // result is null on null input, length mismatch, or a null element —
  // exactly like the declarative reference (zip_with pads the shorter
  // array with nulls; null * x and acc + null are null-propagating)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val lt = elemType(left).get
    val rt = elemType(right).get
    val n = la.numElements()
    if (n != ra.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, lt, i) * get(ra, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      def getter(t: DataType, arr: String, i: String) = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $l.numElements();
         |double $acc = 0.0;
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (${getter(elemType(left).get, l, i)}) * (${getter(elemType(right).get, r, i)});
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_grams(text, k)` — a table-generating function (UDTF surface,
  * SURVEY §2.7): one output row per character k-gram of the input, with its
  * 0-based position. The Catalyst-native counterpart of a Python UDTF: a
  * `Generator` expression executes inside `GenerateExec` exactly like
  * `explode`, so the fan-out streams row-by-row — no intermediate array is
  * ever materialized per row (the `split`+`posexplode` formulation builds
  * the whole array first; for a 1 MB document at k=4 that is ~4 MB of
  * transient array per row, which this avoids).
  *
  * k must be a foldable positive integer. Null/short inputs generate
  * nothing (explode semantics, not explode_outer). Positions count Java
  * chars (UTF-16 code units) — the fixture corpus is ASCII; documented
  * rather than hidden.
  */
case class CharGrams(child: Expression, kExpr: Expression)
  extends Generator with CodegenFallback with BinaryLike[Expression] {

  require(kExpr.foldable, "char_grams k must be a literal")
  private val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"char_grams k: got $other")
  }
  require(k >= 1, s"char_grams k must be >= 1, got $k")

  override def left: Expression = child
  override def right: Expression = kExpr

  override def elementSchema: StructType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < k) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= s.length - k
        override def next(): InternalRow = {
          val row = InternalRow(
            UTF8String.fromString(s.substring(i, i + k)), i)
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGrams =
    copy(child = newLeft, kExpr = newRight)

  override def prettyName: String = "char_grams"

  // unused for generators, but Generator extends Expression
  override def dataType: DataType = ArrayType(elementSchema)
  private[functions] def unusedArray: GenericArrayData =
    new GenericArrayData(Array.empty[Any])
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd position-weighted modular fingerprint:
  * fp = Σ_i byte(c_i) · ((A·(i+1) + B) mod P) mod P over the string's bytes
  * (== TextAnalysis.fingerprint for ASCII text, single pass, no intermediate
  * `sequence`/`transform` array materialization).
  *
  * Demonstrates the custom-`Expression` preference order (SURVEY.md / build
  * brief): whole-stage-codegen arithmetic beats the declarative
  * transform-array formulation by avoiding one array allocation per row, and
  * beats any UDF by staying inside the generated loop.
  */
case class AsciiFingerprint(child: Expression) extends UnaryExpression {
  val A: Long = 8191L
  val B: Long = 524287L
  val P: Long = 1000003L

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ascii_fingerprint needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (s.getByte(i) & 0xffL) * ((A * (i + 1) + B) % P)
      i += 1
    }
    acc % P
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $c.numBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (($c.getByte($i)) & 0xffL) * ((${A}L * ($i + 1) + ${B}L) % ${P}L);
         |}
         |${ev.value} = $acc % ${P}L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiFingerprint =
    copy(child = newChild)
  override def prettyName: String = "ascii_fingerprint"
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word statistics over a text column:
  * struct(n_tokens, sum_token_len, n_unique, n_stop).
  *
  * Replaces FOUR interpreted higher-order traversals
  * (`size(split)`, `aggregate(transform(split, length))`,
  * `size(array_distinct(split))`, `size(filter(split, isin(...)))`) —
  * Spark evaluates lambda built-ins as CodegenFallback with one
  * materialized array each — with one compiled pass. Tokenization is
  * EXACTLY Spark's `split(text, " ")` (Java regex semantics, limit -1:
  * consecutive separators yield empty tokens, trailing empties kept), so
  * swapping this in changes no value anywhere.
  */
case class WordStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = WordStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_stats needs a string column, got $t")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    WordStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword set rides along as a compile-time reference; the loop
    // itself lives in the compiled static helper (no expression-tree
    // interpretation per row)
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordStats.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordStats =
    copy(child = newChild)
  override def prettyName: String = "graft_word_stats"
}

object WordStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** One pass over Spark's split(text, " ") token stream. */
  def compute(text: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val tokens = text.toString.split(" ", -1)
    var sumLen = 0L
    var nStop = 0L
    val uniq = new java.util.HashSet[String]()
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      // Spark's length() on strings counts CODEPOINTS (UTF8String
      // numChars); String.codePointCount matches it exactly
      sumLen += t.codePointCount(0, t.length)
      if (stop.contains(t)) nStop += 1
      uniq.add(t)
      i += 1
    }
    InternalRow(tokens.length.toLong, sumLen, uniq.size.toLong, nStop)
  }
}

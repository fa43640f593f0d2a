package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.7) — the
  * Dataset-native UDAF API, complementing the engine's Catalyst
  * `TypedImperativeAggregate`s (bitmap/CMS/exact-distinct). Use this tier
  * when the caller is a typed `Dataset[T]` pipeline and the state is a
  * simple product; drop to TypedImperativeAggregate when the state needs a
  * custom codec or map-side object reuse.
  *
  * [[WelfordStats]] keeps EXACT integer sufficient statistics
  * (n, Σx, Σx²) — mergeable in any order, no float drift — and finishes to
  * the same (n, sum, m2_numerator) triple the engine's correlation/stddev
  * ops cross-multiply from: m2_num = n·Σx² − (Σx)².
  */
object TypedAggs {

  case class Moments(n: Long, sum: Long, sumSq: Long)
  case class MomentsOut(n: Long, sum: Long, m2Num: Long)

  class WelfordStats extends Aggregator[Long, Moments, MomentsOut] {
    override def zero: Moments = Moments(0L, 0L, 0L)
    override def reduce(b: Moments, x: Long): Moments =
      Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
    override def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
    override def finish(r: Moments): MomentsOut =
      MomentsOut(r.n, r.sum, r.n * r.sumSq - r.sum * r.sum)
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[MomentsOut] =
      Encoders.product[MomentsOut]
  }
}

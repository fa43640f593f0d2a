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
  * [[ExactMoments]] keeps naive integer sufficient statistics
  * (n, Σx, Σx²) — NOT Welford's streaming recurrence; these are mergeable
  * in any order with no float drift — and finishes to the same
  * (n, sum, m2_numerator) triple the engine's correlation/stddev ops
  * cross-multiply from: m2_num = n·Σx² − (Σx)².
  *
  * DOMAIN: the cross-multiplied numerator n·Σx² − (Σx)² is exact only
  * while it fits a signed 64-bit long, i.e. n·Σx² < 2⁶³ — roughly
  * n·(n·max|x|²) < 9.2e18, e.g. |x| ≤ 10⁴ up to n ≈ 9×10¹⁰, or
  * |x| ≤ 10⁶ up to n ≈ 9×10⁶. Beyond that the Long arithmetic wraps
  * silently; callers outside the domain should rescale x or switch to a
  * Decimal/BigInt buffer. The engine's oracle-checked lanes (cents-scale
  * values, ≤10⁸ rows per group at tested SFs) sit inside it.
  */
object TypedAggs {

  case class Moments(n: Long, sum: Long, sumSq: Long)
  case class MomentsOut(n: Long, sum: Long, m2Num: Long)

  class ExactMoments extends Aggregator[Long, Moments, MomentsOut] {
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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the q309 pattern promoted to a shared
  * primitive.
  *
  * A handful of operators are DEFINED by a total order over fact-sized
  * input (the reference's T3 ordered split, quantile/calibration bins,
  * quantile normalization, time-fold cuts). Their naive form —
  * `row_number()/ntile() OVER (ORDER BY ...)` with no partition — routes
  * every row through ONE task: the single worst plan shape at 100 TB, and
  * the one the census `windows` column now pins at zero for fact-sized
  * input.
  *
  * This helper computes the SAME 1-based global rank with no unpartitioned
  * fact-sized window: rows get a deterministic value-derived bucket that is
  * MONOTONE in the leading sort key (so bucket order refines to row order),
  * per-bucket counts make a bucket-domain relation, running offsets over
  * that small domain (the only unpartitioned window — over buckets, never
  * facts) broadcast back, and the in-bucket rank is a bucket-partitioned
  * window. rank = offset(bucket) + rank_within(bucket). Exact, layout-free
  * (pure function of the data), and bit-identical to the single-window
  * form — the DuckDB oracles keep `OVER (ORDER BY ...)` and the hash match
  * proves it.
  *
  * Cost model: one extra column-pruned pass over the input to build the
  * bucket counts (persisted — it also supplies the total row count), vs.
  * total serialization of the dataset through one task. Bucket width is
  * the caller's knob: wide enough that the bucket domain stays ≪ rows,
  * narrow enough that no bucket holds a skewed share.
  */
object Ranks {

  /** Exact integer division for NON-NEGATIVE operands (no Column DIV in
    * the DataFrame API): (a − a mod b) is an exact multiple of b, and the
    * division runs in decimal(38,0) — EXACT over the full BIGINT range.
    * (The first cut divided in double, which rounds the numerator above
    * 2^53; quantileNormalize feeds (rn−1)·(nt−1), which crosses that at
    * ~9.5e7 rows — a silent off-by-one join key at the 100 TB posture.
    * Decimal (38,0)/(38,0) yields (38,6); an integral quotient of ≤19
    * digits is exact there, and the cast back to long truncates .000000.) */
  def idiv(a: Column, b: Column): Column =
    ((a.cast("decimal(38,0)") - pmod(a, b).cast("decimal(38,0)")) /
      b.cast("decimal(38,0)")).cast("long")

  /** Adds `rnCol` (1-based global rank over `order`, BIGINT) and `nCol`
    * (total row count) to `df`. `bucket` MUST be monotone non-decreasing
    * in the leading `order` column. The bucket-counts relation is
    * materialized once by construction (it feeds offsets AND the total);
    * it is bucket-domain-sized, so the materialization is bounded at any
    * SF. It is an eager localCheckpoint rather than a persist: this
    * helper runs once per CALL (several queries invoke it, some twice),
    * and a persist would pin one cache-manager relation per call for the
    * session lifetime — checkpoint blocks are freed by the ContextCleaner
    * once the returned frame is unreachable. The checkpoint registers its
    * build provenance so Explain.windowAudit still sees the aggregate
    * below the offsets window. */
  def withGlobalRank(df: DataFrame, bucket: Column, order: Seq[Column],
                     rnCol: String, nCol: String): DataFrame = {
    val b = df.withColumn("__gr_bucket", bucket)
    val counts = graft.Explain.localCheckpointWithProvenance(
      b.groupBy(col("__gr_bucket"))
        .agg(count(lit(1)).as("__gr_n")))
    val offsets = counts
      .withColumn("__gr_off",
        coalesce(sum(col("__gr_n")).over(Window.orderBy(col("__gr_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_bucket"), col("__gr_off"))
    val tot = counts.agg(sum(col("__gr_n")).as(nCol))
    b.join(broadcast(offsets), Seq("__gr_bucket"))
      .crossJoin(broadcast(tot))
      .withColumn(rnCol,
        (col("__gr_off") + row_number().over(
          Window.partitionBy(col("__gr_bucket")).orderBy(order: _*)))
          .cast("long"))
      .drop("__gr_bucket", "__gr_off")
  }

  /** Standard SQL `ntile(k)` reconstructed from a 1-based global rank of
    * n rows: the first n mod k tiles hold ⌊n/k⌋+1 rows, the rest ⌊n/k⌋ —
    * exactly the Spark/DuckDB ntile contract, so swapping the window for
    * this formula cannot move a row across a bin boundary. */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong))
    val r = pmod(n, lit(k.toLong))
    when(rn <= (q + lit(1L)) * r, idiv(rn - lit(1L), q + lit(1L)) + lit(1L))
      // greatest() guards the q=0 (n<k) case, where the first branch
      // always fires (rn <= n = (q+1)*r) and this one is dead
      .otherwise(r + idiv(rn - r * (q + lit(1L)) - lit(1L),
        greatest(q, lit(1L))) + lit(1L))
  }
}

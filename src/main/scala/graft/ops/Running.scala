package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped running aggregates — stateful-looking scans expressed as pure
  * window algebra, so they distribute (SURVEY.md §2.4 family; the reference
  * has no stateful scan at all, but any inventory/balance feature needs
  * one).
  *
  * The naive form `S_i = max(0, S_{i-1} + Δ_i)` is a sequential recurrence —
  * un-shardable as written, and the trap that pushes engines to
  * single-threaded UDF loops. It has an exact closed form over prefix
  * sums: with `P_i = Σ_{j≤i} Δ_j`,
  *
  *   S_i = P_i − min(0, min_{j≤i} P_j)
  *
  * (the floor only ever "absorbs" the deepest prefix valley so far). Both
  * terms are running-frame window functions Spark evaluates incrementally
  * in ONE partition-sort — the recurrence disappears, the operator shards
  * by key like any other window.
  */
object Running {

  /** Per-key running balance with a floor at zero, plus per-key summary.
    *
    * `deltaCol` is a signed integer flow; ordering is (tsCol, tieCols…)
    * within each key — a pinned total order (SURVEY §7.6 determinism
    * contract). Output: one row per key with line count, final balance,
    * peak balance, and the number of rows that hit the floor (stockouts).
    *
    * Scale shape: one exchange on the key; the two running frames and the
    * row_number share the same Sort; the final per-key collapse is a
    * partial-aggregable groupBy. Window state is O(1) per row (incremental
    * frames — never a re-scan frame).
    */
  def clampedBalance(df: DataFrame, keyCol: String, deltaCol: String,
                     orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col(_).asc): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBal = df
      .withColumn("__p", sum(col(deltaCol)).over(run))
      .withColumn("__floor", least(min(col("__p")).over(run), lit(0L)))
      .withColumn("__s", col("__p") - col("__floor"))
      .withColumn("__rn", row_number().over(w).cast("long"))
    withBal.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_lines"),
        max_by(col("__s"), col("__rn")).as("final_balance"),
        max(col("__s")).as("peak_balance"),
        sum(when(col("__s") === 0L, 1L).otherwise(0L)).as("floor_hits"))
  }
}

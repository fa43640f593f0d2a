package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M3 — labeling, training-set assembly, encoding and splitting
  * (SURVEY.md §2.3 J1/J2, §2.4 A8, §2.5 T3, §2.6 E1).
  */
object Labels {
  /** J2 — point-in-time interval existence label
    * (reference: jobs/make_training_and_train.py:26-46).
    *
    * For each reference row (user, t): label = 1 iff NO qualifying event in
    * `(t, t + horizon]` — STRICTLY after t (an event AT t does not count,
    * searchsorted side="right", :41), INCLUSIVE upper bound (:42).
    *
    * Window formulation: `min(event_ts) OVER (range (1 following, h following))`
    * is null iff no event in the interval. One shuffle on the customer key,
    * no join — this is the scale path (the reference does a per-customer
    * driver-side binary-search loop, :33-43).
    */
  def churnLabelsWindow(purchases: DataFrame, horizonUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(1L, horizonUs)
    purchases.select(
      col("user_id"), col("event_id"), col("ts_us"),
      when(min(col("ts_us")).over(w).isNull, lit(1)).otherwise(lit(0))
        .cast("int").as("churn"))
  }

  /** J2 — equivalent range-join formulation (left-anti on the interval).
    * Kept for parity testing and because on a cluster the anti-join lets AQE
    * broadcast a small event side; semantics identical to churnLabelsWindow.
    */
  def churnLabelsJoin(purchases: DataFrame, horizonUs: Long): DataFrame = {
    val refs = purchases.select(col("user_id"), col("event_id"), col("ts_us"))
    val ev = purchases.select(col("user_id").as("e_user"), col("ts_us").as("e_ts"))
    refs.join(ev,
        col("user_id") === col("e_user") &&
        col("e_ts") > col("ts_us") &&
        col("e_ts") <= col("ts_us") + lit(horizonUs), "left")
      .groupBy(col("user_id"), col("event_id"), col("ts_us"))
      .agg(max(when(col("e_ts").isNotNull, lit(0)).otherwise(lit(1)))
        .cast("int").as("churn"))
  }

  /** A8 — deterministic top-K by frequency (reference:
    * jobs/make_training_and_train.py:50). Tie-break: count desc, value asc —
    * pandas' tie order is insertion-unstable, so we pin it (SURVEY §7.4). */
  def topKByFreq(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(valueCol).asc)
      .limit(k)

  /** E1 — fixed-vocabulary one-hot encoding as NAMED columns (the reference's
    * contract is named `country__<C>` columns, make_training_and_train.py:50-52,
    * frozen into feature_names.txt — not a vector type). */
  def oneHot(df: DataFrame, valueCol: String, vocab: Seq[String],
             prefix: String): DataFrame =
    vocab.foldLeft(df) { (acc, v) =>
      acc.withColumn(s"$prefix$v",
        when(col(valueCol) === lit(v), lit(1)).otherwise(lit(0)).cast("int"))
    }

  /** T3 — ordered sequential 80/20 prefix split (reference:
    * jobs/make_training_and_train.py:57-58 — despite the comment it is an
    * ordered prefix split, not a time split). Integer math (5·rn ≤ 4·n)
    * avoids float boundary surprises. The global rank runs through
    * [[Ranks.withGlobalRank]] (bucket offsets + partitioned in-bucket
    * ranks) rather than a single-partition window, so the split survives
    * raw-event scale; `bucket` must be monotone in `orderCols.head`
    * (default: the leading key DIV 1024 — both call sites lead with an
    * integral entity id). The row count rides the same bucket-counts
    * relation (no driver-side count()). */
  def orderedSplit(df: DataFrame, orderCols: Seq[String],
                   bucket: Column = null): DataFrame = {
    val bk = Option(bucket)
      .getOrElse(expr(s"CAST(${orderCols.head} AS BIGINT) DIV 1024"))
    Ranks.withGlobalRank(df, bk, orderCols.map(col), "__rn", "__n")
      .withColumn("split",
        when(col("__rn") * 5 <= col("__n") * 4, lit("train"))
          .otherwise(lit("test")))
      .drop("__rn", "__n")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-history operators the feature store needs around its
  * point-in-time core: SCD Type-2 dimension builds (the validity-interval
  * twin of the as-of join in ops/Snapshots.scala), multi-touch revenue
  * attribution, linear-interpolation gap fill, and the compaction
  * bin-packing planner that keeps the partitioned gold table
  * (store/FeatureStore.scala, reference: jobs/build_feature_views.py:75-82)
  * from accumulating small files. All integer-exact (epoch micros + cents).
  */
object History {

  /** SCD TYPE-2 dimension build from a change log: per key, collapse
    * consecutive equal values (change detection via lag), then assign each
    * surviving change row a validity interval `[valid_from, valid_to)` via
    * lead(), a 1-based version number, and an `is_current` flag (open
    * interval → valid_to NULL). This is the write-side complement of the
    * backward as-of join: `asOfJoin(facts, scd2)` at ts t picks exactly the
    * row with `valid_from <= t < valid_to` (pinned in Round6Spec).
    *
    * The reference keeps only latest-per-key state (reference:
    * jobs/materialize_online.py:19); SCD2 is what makes historical
    * training-data reconstruction possible without replaying the log.
    *
    * Scale shape: ONE exchange on the key feeds a single in-partition sort
    * shared by the lag (change detect), lead (interval close), and
    * row_number (version) windows — Catalyst collapses same-spec windows
    * into one WindowExec. No joins, no second shuffle.
    *
    * log: (key, ts_us, cents) — cents is the tracked attribute. */
  def scd2Build(log: DataFrame, keyCol: String, tsCol: String,
                valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val changes = log
      .withColumn("__prev", lag(col(valCol), 1).over(w))
      // first row per key (prev NULL) always opens a version; equal-value
      // rows extend the open version (standard SCD2 change suppression)
      .filter(col("__prev").isNull || col(valCol) =!= col("__prev"))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(valCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
  }

  /** DuckDB mirror of [[scd2Build]] over purchase events (value → cents). */
  val scd2Sql: String =
    """WITH log AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |chg AS (
      |  SELECT * FROM (
      |    SELECT user_id, ts_us, cents,
      |      lag(cents) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
      |    FROM log)
      |  WHERE prev IS NULL OR cents <> prev)
      |SELECT user_id, cents, ts_us AS valid_from,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us)
      |    AS BIGINT) AS version,
      |  (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL)
      |    AS is_current
      |FROM chg""".stripMargin

  // deterministic small channel codes for the attribution encoding
  private val channelCode: Map[String, Int] =
    Map("click" -> 1, "view" -> 2, "signup" -> 3, "error" -> 4)

  /** MULTI-TOUCH REVENUE ATTRIBUTION: for every purchase, find the FIRST and
    * LAST non-purchase touch inside the lookback window `[t - lookback, t]`
    * (event-time range frame), then roll purchase revenue up per
    * (first_channel, last_channel) pair — the marketing-science view of the
    * reference's event stream (reference models only the purchase side:
    * jobs/build_feature_views.py:41-54).
    *
    * The arg-min/arg-max over the range frame is ONE integer min/max: each
    * touch is encoded as `ts_us * 8 + code` (codes 1..4, ts < 2^60 so no
    * overflow) — min of the encoding = earliest touch with deterministic
    * channel tie-break at equal ts, no struct comparison, stays inside
    * whole-stage codegen. Purchase rows carry NULL so they never attribute
    * to themselves.
    *
    * Scale shape: one exchange on user_id + one sort feeds both range-frame
    * windows; the final rollup is a pre-combined two-level aggregate over
    * ≤ |channels|² groups.
    */
  def attribution(events: DataFrame, lookbackUs: Long): DataFrame = {
    val codeExpr = channelCode.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) =>
        when(col("event_type") === name, lit(code)).otherwise(acc)
    }
    val encoded = events.select(
      col("user_id"), col("ts_us"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"),
      (col("ts_us") * 8 + codeExpr.cast("long")).as("__touch"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc)
      .rangeBetween(-lookbackUs, 0)
    val decode = (enc: org.apache.spark.sql.Column) =>
      channelCode.foldLeft(lit(null).cast("string")) {
        case (acc, (name, code)) =>
          when(enc % 8 === code, lit(name)).otherwise(acc)
      }
    encoded
      .withColumn("__first", min(col("__touch")).over(w))
      .withColumn("__last", max(col("__touch")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("cents"),
        coalesce(decode(col("__first")), lit("none")).as("first_channel"),
        coalesce(decode(col("__last")), lit("none")).as("last_channel"))
      .groupBy(col("first_channel"), col("last_channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
  }

  /** DuckDB mirror of [[attribution]] (7-day lookback hardcoded by caller). */
  def attributionSql(lookbackUs: Long): String =
    s"""WITH enc AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    epoch_us(ts) * 8 + CASE event_type
       |      WHEN 'click' THEN 1 WHEN 'view' THEN 2
       |      WHEN 'signup' THEN 3 WHEN 'error' THEN 4 END AS touch
       |  FROM events),
       |fl AS (
       |  SELECT *,
       |    min(touch) OVER (PARTITION BY user_id ORDER BY ts_us
       |      RANGE BETWEEN $lookbackUs PRECEDING AND CURRENT ROW) AS f,
       |    max(touch) OVER (PARTITION BY user_id ORDER BY ts_us
       |      RANGE BETWEEN $lookbackUs PRECEDING AND CURRENT ROW) AS l
       |  FROM enc)
       |SELECT
       |  coalesce(CASE f % 8 WHEN 1 THEN 'click' WHEN 2 THEN 'view'
       |    WHEN 3 THEN 'signup' WHEN 4 THEN 'error' END, 'none')
       |    AS first_channel,
       |  coalesce(CASE l % 8 WHEN 1 THEN 'click' WHEN 2 THEN 'view'
       |    WHEN 3 THEN 'signup' WHEN 4 THEN 'error' END, 'none')
       |    AS last_channel,
       |  CAST(count(*) AS BIGINT) AS n_purchases,
       |  CAST(sum(cents) AS BIGINT) AS revenue_cents
       |FROM fl WHERE event_type = 'purchase'
       |GROUP BY 1, 2""".stripMargin

  /** LINEAR-INTERPOLATION GAP FILL: for each key's irregular integer time
    * series, attach to every point the straight-line estimate from its
    * neighbors — the previous and next observation by time — as the EXACT
    * RATIONAL `(interp_num, interp_den)`:
    *
    *   value(t) ≈ (prev_c·(t_next − t) + next_c·(t − t_prev)) / (t_next − t_prev)
    *
    * Emitting numerator/denominator instead of dividing keeps the result
    * BIGINT-exact — no float rounding and no engine-specific integer
    * division semantics (Spark `DIV` truncates toward zero, so a negative
    * numerator would floor differently than an oracle that floors).
    * Boundary rows (no prev or no next) get NULLs: interpolation, not
    * extrapolation. The anomaly-detection use reads `|cents·den − num|`
    * as the deviation-from-trend (q52's forward fill is the step-function
    * sibling of this operator).
    *
    * Scale shape: one exchange on the key, one sort, two lag/lead windows
    * collapsed into a single WindowExec, then a narrow Project.
    */
  def interpolate(series: DataFrame, keyCol: String, tsCol: String,
                  valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    series
      .withColumn("__pt", lag(col(tsCol), 1).over(w))
      .withColumn("__pv", lag(col(valCol), 1).over(w))
      .withColumn("__nt", lead(col(tsCol), 1).over(w))
      .withColumn("__nv", lead(col(valCol), 1).over(w))
      .select(col(keyCol), col(tsCol), col(valCol),
        (col("__pv") * (col("__nt") - col(tsCol)) +
          col("__nv") * (col(tsCol) - col("__pt"))).as("interp_num"),
        (col("__nt") - col("__pt")).as("interp_den"))
  }

  /** DuckDB mirror of [[interpolate]] over per-user purchase cents. */
  val interpolateSql: String =
    """WITH s AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |n AS (
      |  SELECT user_id, ts_us, cents,
      |    lag(ts_us)  OVER (PARTITION BY user_id ORDER BY ts_us) AS pt,
      |    lag(cents)  OVER (PARTITION BY user_id ORDER BY ts_us) AS pv,
      |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS nt,
      |    lead(cents) OVER (PARTITION BY user_id ORDER BY ts_us) AS nv
      |  FROM s)
      |SELECT user_id, ts_us, cents,
      |  pv * (nt - ts_us) + nv * (ts_us - pt) AS interp_num,
      |  nt - pt AS interp_den
      |FROM n""".stripMargin

  /** ACTIVITY STREAKS — longest run of CONSECUTIVE active days per user
    * (gaps-and-islands over the integer epoch-day domain): distinct active
    * days, island id = `day − dense-position` (constant exactly while days
    * are consecutive), then per-island lengths → per-user max/count. The
    * engagement feature family the reference's window counts (SURVEY §2.4
    * A1) can't express: streaks need ordering, not a time frame.
    *
    * Scale shape: raw events collapse to distinct (user, day) FIRST (one
    * partial-agg exchange); the row_number + two aggregates all run
    * key-partitioned on the reduced table. Epoch day is integer `DIV`
    * (never a date function — oracle parity on the exact bucket).
    */
  def streaks(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
    events
      .select(col(keyCol), expr(s"$tsCol DIV 86400000000").as("day"))
      .groupBy(col(keyCol), col("day")).agg(count(lit(1)).as("__n"))
      .withColumn("__isl", col("day") - row_number().over(w))
      .groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("len"), max(col("day")).as("isl_end"))
      .groupBy(col(keyCol))
      .agg(max(col("len")).as("longest_streak_days"),
        count(lit(1)).as("n_streaks"),
        max(col("isl_end")).as("last_active_day"))
  }

  /** DuckDB mirror of [[streaks]] over all events. */
  val streaksSql: String =
    """WITH days AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events GROUP BY 1, 2),
      |isl AS (
      |  SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
      |  FROM days),
      |runs AS (
      |  SELECT user_id, g, CAST(count(*) AS BIGINT) AS len,
      |    max(day) AS isl_end
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, max(len) AS longest_streak_days,
      |  CAST(count(*) AS BIGINT) AS n_streaks,
      |  max(isl_end) AS last_active_day
      |FROM runs GROUP BY 1""".stripMargin

  /** CDC APPLY — collapse an ordered change feed (Insert/Update/Delete ops
    * per key) to the final table state: the LAST op per key wins (ts order,
    * id tie-break); keys whose last op is a delete vanish. This is the
    * change-feed consumer that keeps a downstream mirror of the gold table
    * in sync without replaying history — the read-side complement of
    * `FeatureStore.upsertGold` (which produces such a feed's effects on the
    * primary).
    *
    * Scale shape: latest-per-key is ONE exchange + WindowGroupLimit
    * (row_number desc = 1 — each mapper ships at most one candidate row
    * per key), then a narrow filter on the op. No joins.
    *
    * feed: (key, ts, tie, op ∈ {I,U,D}, value). */
  def cdcApply(feed: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, opCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    feed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(col(keyCol), col(tsCol).as("applied_ts"),
        col(valCol).as("value"))
  }

  /** DuckDB mirror of [[cdcApply]] over the events-derived feed
    * (signup→I, click→U, error→D; cents payload). */
  val cdcApplySql: String =
    """WITH feed AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |    CASE event_type WHEN 'signup' THEN 'I' WHEN 'click' THEN 'U'
      |      ELSE 'D' END AS op,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('signup', 'click', 'error')),
      |latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM feed)
      |SELECT user_id, ts_us AS applied_ts, cents AS value
      |FROM latest WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** CLASSICAL SEASONAL DECOMPOSITION (additive, weekly period) of the
    * daily revenue series, integer-exact: trend = centered 7-day moving
    * sum (valid only where the window holds exactly the 7 consecutive
    * days — edges and gap-adjacent days get NULL, never a shortened
    * window); detrended = 7·value − trend (everything scaled ×7 so no
    * division happens); weekday seasonal = the exact rational
    * (Σ detrended, n) per day-of-week. The decomposition table feeds both
    * anomaly detection (|detrended·n − seasonal_sum| large) and naive
    * seasonal forecasting.
    *
    * Scale shape: raw facts collapse to ONE row per day first
    * (partial-agg exchange); every window below runs on the domain-bounded
    * daily series (the q117/q125 reduced-table discipline), and the
    * weekday seasonal joins back broadcast-sized.
    */
  def seasonalDecompose(facts: DataFrame, tsCol: String,
                        centsCol: String): DataFrame = {
    val daily = facts
      .select(expr(s"$tsCol DIV 86400000000").as("day"),
        col(centsCol).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("rev_c"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__span", max(col("day")).over(w) - min(col("day")).over(w))
      .withColumn("trend7",
        when(col("__n") === 7 && col("__span") === 6, sum(col("rev_c")).over(w)))
      .withColumn("detr7", col("rev_c") * 7 - col("trend7"))
      .withColumn("weekday", pmod(col("day"), lit(7L)))
    val seasonal = trended.filter(col("detr7").isNotNull)
      .groupBy(col("weekday"))
      .agg(sum(col("detr7")).as("seasonal_sum7"),
        count(lit(1)).as("seasonal_n"))
    trended
      .join(broadcast(seasonal), Seq("weekday"), "left")
      .select(col("day"), col("weekday"), col("rev_c"), col("trend7"),
        col("detr7"), col("seasonal_sum7"), col("seasonal_n"))
  }

  /** DuckDB mirror of [[seasonalDecompose]] over order totals. */
  val seasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, rev_c,
      |    CASE WHEN count(*) OVER w = 7
      |      AND max(day) OVER w - min(day) OVER w = 6
      |      THEN sum(rev_c) OVER w END AS trend7
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |d AS (
      |  SELECT day, day % 7 AS weekday, rev_c,
      |    CAST(trend7 AS BIGINT) AS trend7,
      |    CAST(rev_c * 7 - trend7 AS BIGINT) AS detr7
      |  FROM t),
      |s AS (
      |  SELECT weekday, CAST(sum(detr7) AS BIGINT) AS seasonal_sum7,
      |    CAST(count(*) AS BIGINT) AS seasonal_n
      |  FROM d WHERE detr7 IS NOT NULL GROUP BY 1)
      |SELECT d.day, d.weekday, d.rev_c, d.trend7, d.detr7,
      |  s.seasonal_sum7, s.seasonal_n
      |FROM d LEFT JOIN s USING (weekday)""".stripMargin

  /** COMPACTION BIN-PACKING (the OPTIMIZE planner): group each partition's
    * small files into target-size compaction batches by running-size
    * assignment — batch id = exclusive-prefix-sum DIV target, the same
    * policy Spark's own scan batching (`files.maxPartitionBytes` /
    * `openCostInBytes`) applies when coalescing splits. Paired with the
    * Z-order layout writer (ops/ZOrder.scala) this is the table-maintenance
    * loop that keeps the gold store scannable: the reference rewrites one
    * file per date partition on every run and never compacts
    * (reference: jobs/build_feature_views.py:75-82).
    *
    * Files are ordered by (size DESC, name) inside the partition — packing
    * big files first tightens the bins under the same single-pass policy
    * and keeps the assignment deterministic.
    *
    * Scale shape: one exchange on the partition key + one sort feeds the
    * running sum; output is one row per file. The file INVENTORY (not data)
    * is what flows through — at 100 TB that is millions of rows, not
    * billions.
    *
    * files: (partCol, nameCol, bytesCol). */
  def compactionBins(files: DataFrame, partCol: String, nameCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(nameCol).asc)
    files
      .withColumn("__cum", coalesce(
        sum(col(bytesCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // integer DIV, never `/` (double division truncated back to long
      // drifts past 2^53 cumulative bytes — reachable at 100 TB)
      .select(col(partCol), col(nameCol), col(bytesCol),
        expr(s"__cum DIV $targetBytes").as("bin"))
  }

  /** DuckDB mirror of [[compactionBins]]: the per-day gold "files" are
    * simulated from orders (partition = order month, file = order date,
    * bytes = total order cents that day). */
  def compactionBinsSql(targetBytes: Long): String =
    s"""WITH files AS (
       |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mon,
       |    CAST(o_orderdate AS DATE) AS file_date,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS bytes
       |  FROM orders GROUP BY 1, 2),
       |c AS (
       |  SELECT mon, file_date, bytes,
       |    coalesce(sum(bytes) OVER (PARTITION BY mon
       |      ORDER BY bytes DESC, file_date ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM files)
       |SELECT mon, file_date, bytes,
       |  CAST(cum // $targetBytes AS BIGINT) AS bin FROM c""".stripMargin

  /** HAMPEL FILTER over a per-group series, integer-exact: for each point,
    * the LOWER MEDIAN of the centered ±`halfWin` row window and the lower
    * median of absolute deviations (MAD) from it; the point is an outlier
    * when |v − med| > `k`·MAD. The robust anomaly detector a spiky revenue
    * series needs (a mean/stddev z-score is dragged by the spike itself);
    * edge windows shrink naturally, and every comparison is on BIGINTs —
    * both engines sort the same integer lists and index the same element,
    * so the oracle replays bit-exactly.
    *
    * Scale shape: facts reduce to the (group, bucket) series first; one
    * key-partitioned window collects the ≤ (2·halfWin+1)-element list per
    * row — state bounded by the window width, not the series length.
    */
  def hampelOutliers(facts: DataFrame, grpCol: String, bucketCol: String,
                     valCol: String, halfWin: Int, k: Long): DataFrame = {
    val series = facts.groupBy(col(grpCol), col(bucketCol))
      .agg(sum(col(valCol)).as("v"))
    val w = Window.partitionBy(col(grpCol)).orderBy(col(bucketCol).asc)
      .rowsBetween(-halfWin, halfWin)
    series
      .withColumn("__win", sort_array(collect_list(col("v")).over(w)))
      .withColumn("med",
        expr("element_at(__win, CAST((size(__win) + 1) DIV 2 AS INT))"))
      .withColumn("__dev", sort_array(
        transform(col("__win"), x => abs(x - col("med")))))
      .withColumn("mad",
        expr("element_at(__dev, CAST((size(__dev) + 1) DIV 2 AS INT))"))
      .withColumn("is_outlier", abs(col("v") - col("med")) > lit(k) * col("mad"))
      .select(col(grpCol), col(bucketCol), col("v"), col("med"), col("mad"),
        col("is_outlier"))
  }

  /** CUSUM CHANGE-POINT detection per group, integer-exact: collapse the
    * facts to one value per (group, bucket), then find the bucket
    * maximizing |n·S_i − i·S_n| (the scaled deviation of the cumulative sum
    * from the constant-rate line — the classic single-changepoint statistic,
    * cross-multiplied so no division ever happens; ties → earliest bucket).
    * Emits per group the argmax bucket, the signed deviation there, the
    * bucket count and the series total — the "when did this series change
    * behavior" primitive for revenue/traffic monitoring.
    *
    * Scale shape: the reduced-table discipline (facts → |group·buckets|
    * rows via a partial-aggregable groupBy) before any window; then one
    * key-partitioned window pass (cumsum + row_number + totals share the
    * partition) and a max(struct) argmax — two exchanges end to end, and
    * the window input is bounded by the bucket domain, not the row count.
    */
  def cusumChangepoint(facts: DataFrame, grpCol: String, bucketCol: String,
                       valCol: String): DataFrame = {
    val series = facts.groupBy(col(grpCol), col(bucketCol))
      .agg(sum(col(valCol)).as("__v"))
    val ow = Window.partitionBy(col(grpCol)).orderBy(col(bucketCol).asc)
    val cum = series
      .withColumn("__s", sum(col("__v"))
        .over(ow.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(ow).cast("long"))
      .withColumn("__tot", sum(col("__v"))
        .over(Window.partitionBy(col(grpCol))))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(col(grpCol))))
      .withColumn("__d", col("__n") * col("__s") - col("__i") * col("__tot"))
    cum.groupBy(col(grpCol))
      .agg(max(struct(abs(col("__d")).as("a"), (-col(bucketCol)).as("nb"),
        col("__d").as("d"), col("__n").as("n"), col("__tot").as("t")))
        .as("m"))
      .select(col(grpCol), col("m.n").as("n_buckets"),
        (-col("m.nb")).as("cp_bucket"), col("m.d").as("cusum"),
        col("m.t").as("total"))
  }
}

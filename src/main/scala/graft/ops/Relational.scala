package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP1 + general relational operators (SURVEY.md §2.1–§2.3, §2.5).
  *
  * The fixture star schema stands in for the reference's retail domain
  * (FIXTURES.md §A mapping): orders+lineitem ≙ bronze order lines,
  * customer/nation/region ≙ the country dimension.
  */
object Relational {
  /** Epoch microseconds from a (NTZ) timestamp column; session TZ is pinned
    * UTC, so naive-as-UTC micros == DuckDB `epoch_us`. */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** EP1 — bronze normalize (reference: jobs/ingest_xlsx_to_parquet.py:13-42).
    * O1 rename-project, O2 null-on-error casts, O3 trim/upper/fillna,
    * O4 null-safe prefix flag, O5 arithmetic derived column, O6 drop-null
    * filter, O7 conditional spend, O8 boolean→int flag.
    *
    * Joins: lineitem⋈orders is the big join (shuffle on orderkey; AQE may
    * broadcast at small sf); customer and nation are broadcast explicitly —
    * dimension tables stay < 100 MB even at 100 TB fact scale.
    */
  def bronzeNormalize(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame): DataFrame = {
    val joined = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    joined
      .na.drop(Seq("o_custkey", "l_shipdate"))                       // O6
      .select(
        col("l_orderkey").as("invoice"),                             // O1
        upper(trim(concat(lit("sku-"), col("l_partkey")))).as("stock_code"), // O3
        col("l_quantity").cast("int").as("quantity"),                // O2
        epochUs(col("l_shipdate")).as("ts_us"),
        col("o_custkey").as("customer_id"),
        coalesce(trim(col("n_name")), lit("")).as("country"),        // O3
        col("l_linenumber").as("line_number"),
        coalesce(col("l_returnflag").startsWith("R"), lit(false))
          .as("is_cancel"),                                          // O4
        (round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long") / lit(100.0)).as("line_amount"))             // O5 (cents-exact)
      .withColumn("txn", (!col("is_cancel")).cast("int"))            // O8
      .withColumn("spend",
        when(!col("is_cancel"), col("line_amount")).otherwise(lit(0.0))) // O7
  }

  /** A-family global aggregation (TPC-H Q1 shape) with exact integerized
    * money so the oracle matches bit-for-bit. Demonstrates partial (map-side)
    * aggregation + single shuffle on the group keys. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("base_c", round(col("l_extendedprice") * 100).cast("long"))
      .withColumn("disc_c",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("long"))
      .withColumn("charge_c",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 10000).cast("long"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        (sum(col("base_c")) / lit(100.0)).as("sum_base_price"),
        (sum(col("disc_c")) / lit(10000.0)).as("sum_disc_price"),
        (sum(col("charge_c")) / lit(10000.0)).as("sum_charge"),
        // no round(): operands are bit-identical across engines (exact sums),
        // so the quotients match bit-for-bit; rounding would only diverge on
        // exact decimal .5 boundaries.
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        ((sum(col("base_c")) / lit(100.0)) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_partkey")).as("uniq_parts"))

  /** S2/pushdown showcase — filtered, projected scan that Catalyst pushes to
    * the parquet reader (PushedFilters + 3-column ReadSchema; verify with
    * .explain("formatted")). */
  def prunedScan(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === lit("R") &&
        col("l_quantity") >= lit(25.0))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / lit(100.0))
          .as("sum_price"))

  /** J1-family multiway star join: revenue per region/nation. Dimensions are
    * broadcast (no shuffle for them); facts shuffle once for the group-by. */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        (sum(col("price_c")) / lit(100.0)).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))

  /** A7 — deterministic per-group mode (reference:
    * jobs/build_feature_views.py:59 — pandas mode().iloc[0] = tie-break by
    * lexicographic min; Spark's built-in mode() has unspecified ties, so we
    * pin count desc, value asc via row_number. SURVEY §7.4). */
  def modePerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counted = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(groupCol), col(valueCol).as(s"${valueCol}_mode"), col("cnt"))
  }

  /** O11–O15 scalar-function battery over orders (clip, date extraction,
    * interval arithmetic, days-since-first via A6 partition min, ISO format). */
  def scalarFuncs(orders: DataFrame): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
    orders.select(
      col("o_orderkey"), col("o_custkey"),
      least(greatest(col("o_totalprice") / lit(500000.0), lit(0.0)),
        lit(1.0)).as("price_clip01"),                                // O11
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"), // O12
      epochUs(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_us"), // O13
      date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"), // O15
      epochUs(col("o_orderdate")).as("ts_us"))
      .withColumn("tenure_days",                                     // O14 + A6
        floor((col("ts_us") - min(col("ts_us")).over(byCust))
          / lit(86400000000.0)).cast("long"))
  }

  /** Keyless interval join via time-bin bucketing — the scale path for range
    * joins with NO equi component (q18's per-user variant gets its shuffle
    * key for free). Counts right-side events in `[ts - windowUs, ts)` of
    * each left event, across ALL keys: a naive theta join is a
    * BroadcastNestedLoopJoin (O(n·m) comparisons); binning by
    * `ts DIV windowUs` turns it into an EQUI join on the bin — each left row
    * probes its two covering bins, each right row lives in exactly one, so
    * every qualifying pair meets exactly once (no dedup pass) and the exact
    * predicate only runs on same-bin candidates. This is the bucketed
    * range-join optimization from the Databricks/Flink playbooks, in plain
    * DataFrame ops. */
  def binnedIntervalCount(left: DataFrame, right: DataFrame,
                          windowUs: Long): DataFrame = {
    val l = left
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"(ts_us - $windowUs) DIV $windowUs"),
        expr(s"ts_us DIV $windowUs")))))
    val r = right
      .select(col("ts_us").as("r_ts"),
        expr(s"ts_us DIV $windowUs").as("__bin"))
    val counted = l.join(r,
        l("__bin") === r("__bin") &&
          col("r_ts") >= col("ts_us") - lit(windowUs) &&
          col("r_ts") < col("ts_us"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_before"))
    left.select(col("event_id"), col("ts_us"))
      .join(counted, Seq("event_id"), "left")
      .select(col("event_id"), col("ts_us"),
        coalesce(col("n_before"), lit(0L)).as("n_before"))
  }

  /** Merge overlapping-or-touching intervals per key (span coalescing — the
    * PII-span / time-range dedup primitive): an interval starts a new merged
    * group iff its start exceeds the running max end of every earlier
    * interval in the key (ties in start can't split a group: any two
    * same-start rows overlap by construction).
    *
    * Shape: one shuffle on the key + one in-partition sort feeds BOTH the
    * running-max window and (via the derived group id) the final aggregate.
    * No self-join — the classic `NOT EXISTS overlap` formulation is O(n²)
    * per key and un-shardable; this is the linear sweep, distributed.
    * Integer bounds only (epoch micros), per the determinism policy.
    */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
                        endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc, col(tieCol).asc)
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new", when(prevMax.isNull || col(startCol) > prevMax, 1L)
        .otherwise(0L))
      .withColumn("__grp", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min(col(startCol)).as("interval_start"),
        max(col(endCol)).as("interval_end"),
        count(lit(1)).as("n_rows"))
      .drop("__grp")
  }

  /** GAPS between a key's merged intervals — the complement of
    * [[coalesceIntervals]]: after coalescing, each pair of consecutive
    * merged intervals defines one gap `[end_i, start_{i+1})`. The
    * availability/idle-time analysis twin of span coalescing (uncovered
    * SLA windows, inventory stockout periods, user dormancy).
    *
    * Scale shape: coalesce's single key-exchange output feeds one lead()
    * window on the SAME partitioning (no second exchange — merged
    * intervals per key are few), then a narrow filter.
    */
  def intervalGaps(df: DataFrame, keyCol: String, startCol: String,
                   endCol: String, tieCol: String): DataFrame = {
    val merged = coalesceIntervals(df, keyCol, startCol, endCol, tieCol)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("interval_start").asc)
    merged
      .withColumn("__next", lead(col("interval_start"), 1).over(w))
      .filter(col("__next").isNotNull && col("__next") > col("interval_end"))
      .select(col(keyCol), col("interval_end").as("gap_start"),
        col("__next").as("gap_end"),
        (col("__next") - col("interval_end")).as("gap_us"))
  }

  /** 2-D skyline (Pareto frontier, maximize both dims) over the DISTINCT
    * (x, y) pairs, with the support count per surviving point. A pair is on
    * the frontier iff no pair has x' ≥ x AND y' ≥ y with one strict — i.e.
    * its y beats every y at strictly greater x (range frame, integer x) and
    * it is the max y within its own x.
    *
    * Scale shape: the groupBy collapses the input to |distinct pairs| ≤
    * |x-domain|·|y-domain| rows BEFORE the single-partition window — the
    * window's input is domain-bounded, not data-bounded, so the plan
    * survives a 100× row scale-up unchanged. (A fully general skyline over
    * unbounded real-valued dims would need the partition-local-frontier +
    * merge formulation instead.)
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pairs = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("n_rows"))
    // "max y at strictly greater x" as a GROWING frame: sort x DESC, frame
    // [unbounded preceding, 1 preceding] (value-based, so 1-preceding in
    // descending order = x' ≥ x+1 = strictly greater for integer x). Spark
    // evaluates growing frames incrementally (O(n)); the ascending mirror —
    // rangeBetween(1, unboundedFollowing) — is a shrinking frame that
    // re-scans the remainder per row: O(n²) over the distinct pairs
    // (measured minutes vs seconds at 590k pairs).
    val wGt = Window.orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1L)
    val wEq = Window.partitionBy(col(xCol))
    pairs
      .withColumn("__maxYgt", max(col(yCol)).over(wGt))
      .withColumn("__maxYeq", max(col(yCol)).over(wEq))
      .filter((col("__maxYgt").isNull || col(yCol) > col("__maxYgt")) &&
        col(yCol) === col("__maxYeq"))
      .select(col(xCol), col(yCol), col("n_rows"))
  }

  /** Causal + centered fixed-coefficient sliding kernels over each key's
    * value series — the division-free, transcendental-free stand-in for
    * EWMA/Gaussian smoothing (integer cents × integer weights stays BIGINT,
    * so the DuckDB replay is exact; see the determinism policy on never
    * emitting computed doubles).
    *
    * One shuffle on the key, one sort, all four lags/leads share the single
    * WindowExec. Weights: causal 8-4-2-1 (current..t-3), centered 1-2-1.
    */
  /** GROUP TOP-K AS AN ORDERED LIST COLUMN: per group, the top-k items by
    * (metric desc, item asc) rendered as one comma-joined string — the
    * "favorite items" feature column shape (one row per entity, ordered
    * multi-value payload), vs q56's one-row-per-rank relational form.
    *
    * Determinism despite `collect_list` (whose order is partition-arrival):
    * the list is rebuilt inside the row by `sort_array` over
    * (rank, item) structs — struct comparison is field-ordinal, so the
    * array order is the window's rank order regardless of arrival. The
    * ranked input is a WindowGroupLimit (≤ k rows per group leave each
    * mapper); the final aggregate carries k smalls per group.
    */
  def groupTopKList(df: DataFrame, groupCol: String, itemCol: String,
                    metricCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(metricCol).desc, col(itemCol).asc)
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .groupBy(col(groupCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rnk").as("r"),
          col(itemCol).cast("string").as("i")))),
        x => x.getField("i")), ",").as("top_items"),
        count(lit(1)).as("n_items"))
  }

  /** One referential-integrity edge for [[fkAudit]]: child table+key →
    * parent table+key, labeled. */
  case class FkEdge(name: String, child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String)

  /** REFERENTIAL-INTEGRITY AUDIT — the data-quality gate a warehouse runs
    * before promoting a load: for every declared FK edge, the child row
    * count, orphan rows (non-null child key with no parent), distinct
    * orphan keys, and null child keys. All-zeros on a clean load IS the
    * audit's output — the value is the guarantee, produced scalably.
    *
    * Scale shape: per edge, one left join of the child's key projection
    * against the parent's DISTINCT key (a pre-aggregated, usually
    * broadcastable side) feeding a single partial-aggregable summary row —
    * the fact table is scanned once per edge with only the key column
    * read (column pruning reaches the parquet scan).
    */
  def fkAudit(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty,
      "fkAudit requires at least one FkEdge (an empty audit has no schema " +
        "source; declare the edges you want checked)")
    edges.map { e =>
      val c = e.child.select(col(e.childKey).as("__ck"))
      val p = e.parent.select(col(e.parentKey).as("__ck")).distinct()
        .withColumn("__p", lit(1))
      c.join(p, Seq("__ck"), "left")
        .agg(
          count(lit(1)).as("child_rows"),
          sum(when(col("__p").isNull && col("__ck").isNotNull, 1L)
            .otherwise(0L)).as("orphan_rows"),
          countDistinct(when(col("__p").isNull && col("__ck").isNotNull,
            col("__ck"))).as("orphan_keys"),
          sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("null_keys"))
        .select(lit(e.name).as("rel"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"), col("null_keys"))
    }.reduce(_ unionByName _)
  }

  /** Exact WEIGHTED MEDIAN per group — the smallest value v with
    * 2·W(≤v) ≥ W_total (weights BIGINT, cross-multiplied, no division):
    * the quantity-weighted "typical price" that an unweighted median
    * misstates whenever line sizes vary. Same reduced-domain discipline as
    * the rank-AUC: rows collapse to one per (group, value) FIRST, the
    * window runs over the distinct-value series, and the answer is a
    * partial-aggregable min over the qualifying suffix.
    */
  def weightedMedian(df: DataFrame, grpCol: String, valCol: String,
                     weightCol: String): DataFrame = {
    val perVal = df.groupBy(col(grpCol), col(valCol))
      .agg(sum(col(weightCol)).as("__w"))
    val ow = Window.partitionBy(col(grpCol)).orderBy(col(valCol).asc)
    perVal
      .withColumn("__cum", sum(col("__w"))
        .over(ow.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum(col("__w"))
        .over(Window.partitionBy(col(grpCol))))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(grpCol))
      .agg(min(col(valCol)).as("wmedian"), max(col("__tot")).as("w_total"))
  }

  /** Keyless INTERVAL-OVERLAP JOIN via time binning — every (left, right)
    * pair of intervals with s₁ ≤ e₂ ∧ s₂ ≤ e₁, found WITHOUT the
    * quadratic theta join: each interval explodes onto the `binUs`-wide
    * time bins it touches, candidates meet on a bin equi join, duplicates
    * are suppressed by the FIRST-COMMON-BIN rule (keep the pair only at
    * max(bin₁_start, bin₂_start) — a narrow filter, not a distinct
    * shuffle), and the exact overlap predicate filters false bin
    * neighbors. The third temporal-join class beside point-in-range
    * (q115/q18) and as-of (q39/q118/q175).
    *
    * Scale shape: candidates = Σ bins-touched ≈ |intervals|·(len/binUs+1)
    * rows through ONE equi-join shuffle; pick binUs near the typical
    * interval length to keep the blowup a small constant.
    */
  def binnedOverlapJoin(left: DataFrame, right: DataFrame,
                        startCol: String, endCol: String,
                        binUs: Long): DataFrame = {
    def binned(df: DataFrame, p: String) = df
      .select(df.columns.map(c => col(c).as(s"$p$c")) :+
        explode(sequence(expr(s"$startCol DIV $binUs"),
          expr(s"$endCol DIV $binUs"))).as("__bin"): _*)
    val l = binned(left, "l_")
    val r = binned(right, "r_")
    l.join(r, Seq("__bin"))
      .filter(col(s"l_$startCol") <= col(s"r_$endCol") &&
        col(s"r_$startCol") <= col(s"l_$endCol"))
      // first common bin: both intervals cover __bin, so the earliest
      // shared bin is max of the two start bins — keep exactly that one
      .filter(col("__bin") ===
        greatest(expr(s"l_$startCol DIV $binUs"),
          expr(s"r_$startCol DIV $binUs")))
      .drop("__bin")
  }

  /** SURVIVORSHIP (golden-record merge) — the step after entity resolution
    * clusters records: collapse each entity's event history into ONE profile
    * row by per-field merge rules, every rule deterministic:
    *   - first_seen_us / last_seen_us / n_events: plain min/max/count;
    *   - max_value_cents: max of the integerized amount (nulls ignored);
    *   - last_sku: MOST RECENT NON-NULL value (recency survivorship), ties
    *     broken by event_id desc — a null-skipping argmax, expressed as one
    *     row_number over (non-null-first, ts desc, id desc) so a key whose
    *     values are ALL null still yields a row (with NULL sku);
    *   - top_event_type: modal value, ties by lexicographic min (the A7
    *     mode discipline).
    *
    * Scale shape: three key-partitioned passes (hash agg + two windows) over
    * the same shuffle key, then two joins on the |entities|-sized outputs —
    * the raw events never join each other.
    */
  def goldenRecord(events: DataFrame): DataFrame = {
    val aggs = events.groupBy(col("user_id")).agg(
      min(col("ts_us")).as("first_seen_us"),
      max(col("ts_us")).as("last_seen_us"),
      count(lit(1)).as("n_events"),
      max(round(col("value") * 100).cast("long")).as("max_value_cents"))
    val skuW = Window.partitionBy(col("user_id"))
      .orderBy(col("props").isNotNull.desc, col("ts_us").desc,
        col("event_id").desc)
    val lastSku = events
      .withColumn("__rn", row_number().over(skuW))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("props").as("last_sku"))
    val modeW = Window.partitionBy(col("user_id"))
      .orderBy(col("__cnt").desc, col("event_type").asc)
    val topType = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__rn", row_number().over(modeW))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type").as("top_event_type"))
    aggs.join(lastSku, Seq("user_id")).join(topType, Seq("user_id"))
  }

  def kernelSmooth(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val cents = expr(s"CAST(round($valCol * 100) AS BIGINT)")
    df.withColumn("__c", cents)
      .select(col(keyCol), col(tsCol), col(tieCol),
        col("__c").as("cents"),
        (col("__c") * 8 +
          coalesce(lag(col("__c"), 1).over(w), lit(0L)) * 4 +
          coalesce(lag(col("__c"), 2).over(w), lit(0L)) * 2 +
          coalesce(lag(col("__c"), 3).over(w), lit(0L))).as("causal_w15"),
        (coalesce(lag(col("__c"), 1).over(w), lit(0L)) +
          col("__c") * 2 +
          coalesce(lead(col("__c"), 1).over(w), lit(0L))).as("centered_w4"))
  }

  /** Distributed SURROGATE-KEY mint over a DISTINCT-key relation: gap-free
    * 1..n keys in natural-key order with NO single-partition window (the
    * naive `dense_rank().over(Window.orderBy(key))` moves every key to one
    * task — a straight scale-killer on a 100 TB dim build).
    *
    * Shape: split the key domain into `numBuckets` ordered VALUE ranges at
    * approximate quantile boundaries, rank locally inside each bucket
    * (a PARTITIONED window — parallelism = numBuckets), then add each
    * bucket's prefix count. The prefix sums come from a triangle
    * self-join over the per-bucket counts (numBuckets rows — broadcast,
    * O(B²) on B≈32). The only global structures are the B−1 boundary
    * values and one count per bucket, never the keys themselves.
    *
    * Determinism is load-bearing: the bucket id is a function of the KEY
    * VALUE against boundary LITERALS (one driver-side approxQuantile
    * collect of B−1 doubles), so every re-execution of the subtree —
    * Spark re-evaluates it per reference, and AQE may re-layout any
    * shuffle — assigns identical buckets. An earlier draft bucketed by
    * `spark_partition_id()` after a range repartition; that column is
    * NONDETERMINISTIC, two instances of the subtree could disagree on the
    * layout, and the inner bucket⋈offsets join then silently dropped rows
    * (reproduced at sf0.1: 597 831 of 600 000 fact rows survived q250).
    * Quantile skew only unbalances bucket SIZES, never correctness.
    *
    * Requires `keys` to be distinct on `keyCol` (callers pass the
    * `.distinct()` dim projection) and numeric; ranks are then dense and
    * unique.
    */
  def surrogateKeys(keys: DataFrame, keyCol: String, skCol: String,
                    numBuckets: Int = 32): DataFrame = {
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else keys.stat.approxQuantile(keyCol, probs, 0.001)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(keyCol).cast("double") > lit(b), 1).otherwise(0)
    }
    val local = keys
      .withColumn("__b", bucket)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__b")).orderBy(col(keyCol))).cast("long"))
    val counts = local.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.alias("a")
      .join(counts.alias("b"), col("b.__b") < col("a.__b"), "left")
      .groupBy(col("a.__b"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
      .select(col("a.__b").as("__b"), col("__off"))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn(skCol, col("__rn") + col("__off"))
      .drop("__b", "__rn")
  }
}

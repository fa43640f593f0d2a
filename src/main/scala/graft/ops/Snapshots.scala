package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M4 — point-in-time snapshot operators (SURVEY.md §2.3 J3/J4, §2.6 E2).
  *
  * The reference serves one customer at a time from an in-memory frame
  * (serving/feature_service.py:36-46); the Spark-native equivalents are
  * whole-table batch operators that materialize every customer's snapshot in
  * one shuffle, which is what the online store is loaded from
  * (jobs/materialize_online.py:19).
  */
object Snapshots {
  /** J4 — latest row per key ("as of now",
    * reference: jobs/materialize_online.py:19). Deterministic tie-break on
    * `tieCol` desc (the reference takes positional last after sort; we pin
    * determinism per SURVEY §7.6).
    *
    * row_number + filter = one exchange on the key, no join. At 100 TB this
    * beats groupBy(max)+self-join (one shuffle vs two).
    */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** J3 — batch backward as-of lookup: latest row per key with ts <= asOf
    * (reference: serving/feature_service.py:42-46 does this for ONE key with
    * a filter+tail; this is the all-keys batch form). Keys with no qualifying
    * row are absent (the reference raises; SQL semantics = no row). */
  def asOf(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           asOfUs: Long): DataFrame =
    latestPerKey(df.filter(col(tsCol) <= lit(asOfUs)), keyCol, tsCol, tieCol)

  /** Backward AS-OF JOIN between two tables: for every left row, the latest
    * right row with the same key and `right.ts <= left.ts`.
    *
    * Union-window formulation (composition, per the custom-operator
    * preference order — no custom SparkPlan needed): tag both sides, union,
    * then `last_value(right value, ignoreNulls) OVER (partition key ORDER BY
    * ts, side rows unbounded preceding..current)` — right rows sort before
    * left rows at equal ts (side 0 < 1) so an exact-timestamp match IS
    * taken, matching standard ASOF semantics (DuckDB `ASOF JOIN` uses >=).
    *
    * Scale shape: ONE shuffle on the key, one sort — no range-join
    * explosion, no per-key skew beyond the window itself. This is the plan
    * a dedicated AsOfJoinExec would produce.
    *
    * `rightVals` are the right-side value columns to carry; left columns
    * pass through unchanged.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // the right payload travels as ONE non-null struct: a matched right row
    // whose value columns are genuinely NULL stays distinguishable from the
    // left-row placeholder (which is a NULL struct), and all carried columns
    // come from the SAME right row — per-column last() could mix rows when
    // values are independently null (DuckDB ASOF parity)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        Seq(lit(null).cast(rStructType).as("__r")): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightVals.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        rightVals.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** FORWARD AS-OF JOIN: for every left row, the EARLIEST right row with the
    * same key and `right.ts >= left.ts` (inclusive), ties on right ts broken
    * by `rightTieCol` asc. Same union-window architecture as [[asOfJoin]]
    * mirrored by REVERSING the sort: order (ts DESC, side asc, tie DESC)
    * with right = side 0, so every right row at ts ≥ the left row's ts —
    * including exact-ts matches — precedes it, and among equal-ts right
    * rows the minimum tie sorts LAST; then `last(right struct, ignoreNulls)`
    * over [unbounded preceding, current] picks exactly the earliest
    * qualifying right row with the min-tie break.
    *
    * The reversed sort matters for more than elegance: Spark evaluates
    * growing [unbounded preceding, current] frames INCREMENTALLY (O(n) per
    * partition), while the naive mirror — `first()` over [current row,
    * unbounded following] — runs UnboundedFollowingWindowFunctionFrame,
    * which re-scans the remainder of the partition for every row: O(n²) on
    * exactly the hot keys that matter at scale (measured: a single skewed
    * user partition pinned a core for 20+ minutes at sf0.1; this form runs
    * the same data in seconds). One shuffle on the key, one sort — same
    * scale shape as the backward join.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, rightTieCol: String,
                      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val tieType = right.schema(rightTieCol).dataType
    val lTagged = left
      .withColumn("__side", lit(1))
      // tie value for left rows is irrelevant to the match (sides already
      // order left after right at equal ts); any constant keeps the sort
      // total and deterministic
      .withColumn("__tie", lit(Long.MinValue).cast(tieType))
      .select(Seq(col(keyCol), col(tsCol), col("__side"), col("__tie")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        Seq(lit(null).cast(rStructType).as("__r")): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTieCol))
      .select(Seq(col(keyCol), col(tsCol), col("__side"), col("__tie")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(rightVals.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        rightVals.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** The same as-of join through the custom physical operator
    * (plans/AsOfJoin.scala): builds the AsOfJoinNode over the analyzed child
    * plans and registers the planner strategy. Key/ts must be LongType.
    * Semantics identical to `asOfJoin`; exists to exercise and measure the
    * full custom-plan path. */
  def asOfJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftInternal
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = GraftInternal.analyzed(left)
    // Fresh-alias the right side: when both inputs share lineage they carry
    // IDENTICAL exprIds; the analyzer's DeduplicateRelations re-ids the right
    // subtree but does not rewrite attributes stored inside a custom node.
    // Referencing brand-new alias ids keeps the node stable under dedup.
    val rRaw = GraftInternal.analyzed(right)
    val rAliases = rRaw.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rRaw)
    val rAttrs = rAliases.map(_.toAttribute)
    def lAttr(n: String) = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in left"))
    def rAttr(n: String) = rAttrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in right"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      lAttr(keyCol), lAttr(tsCol), rAttr(keyCol), rAttr(tsCol),
      rightVals.map(rAttr))
    GraftInternal.ofRows(spark, node)
  }

  /** NEAREST-within-tolerance temporal join: for every left row, the right
    * row with the same key minimizing |right.ts − left.ts|, considered only
    * when the distance is ≤ `tolUs`; ties (equidistant before/after) go to
    * the EARLIER right row (backward wins), matching the "closest known
    * reading" semantics of sensor/price alignment. No match ⇒ NULL payload.
    *
    * Composition: one backward [[asOfJoin]] + one forward [[asOfJoinForward]]
    * (each a single key-shuffle + incremental window — no range-join
    * explosion), both carrying the matched right ts inside the payload
    * struct; a final Project picks the closer in-tolerance side per row.
    * The per-side candidates are provably sufficient: the nearest right row
    * overall is either the latest at-or-before or the earliest at-or-after.
    *
    * Output: left columns ++ rightVals ++ (`r_ts`, `delta_us`) — the matched
    * right timestamp and its absolute distance (NULL when unmatched).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, rightTieCol: String, tolUs: Long,
                  rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    def renamed(prefix: String) = right.select(
      Seq(col(keyCol), col(tsCol), col(rightTieCol).as(s"${prefix}tie")) ++
        rightVals.map(c => col(c).as(s"$prefix$c")) :+
        col(tsCol).as(s"${prefix}ts"): _*)
    val bVals = rightVals.map("__b_" + _) :+ "__b_ts"
    val fVals = rightVals.map("__f_" + _) :+ "__f_ts"
    val afterB = asOfJoin(left, renamed("__b_"), keyCol, tsCol, bVals)
    val afterF = asOfJoinForward(afterB, renamed("__f_"), keyCol, tsCol,
      "__f_tie", fVals)
    val bDelta = col(tsCol) - col("__b_ts")
    val fDelta = col("__f_ts") - col(tsCol)
    val bOk = col("__b_ts").isNotNull && bDelta <= tolUs
    val fOk = col("__f_ts").isNotNull && fDelta <= tolUs
    // backward wins exact ties: bDelta <= fDelta keeps the earlier row
    val useB = bOk && (!fOk || bDelta <= fDelta)
    val useF = fOk && !useB
    afterF.select(leftCols.map(col) ++
      rightVals.map(c => when(useB, col(s"__b_$c"))
        .when(useF, col(s"__f_$c")).as(c)) ++ Seq(
      when(useB, col("__b_ts")).when(useF, col("__f_ts")).as("r_ts"),
      when(useB, bDelta).when(useF, fDelta).as("delta_us")): _*)
  }

  /** One feature group for [[pitJoin]]: a timestamped feature table keyed
    * like the entity frame, its value columns, and a max-age TTL. */
  case class FeatureGroup(df: DataFrame, vals: Seq[String], ttlUs: Long)

  /** Multi-feature-group POINT-IN-TIME join with max-age TTL — the core
    * feature-store retrieval operation (Feast/Tecton "historical
    * retrieval"): for each entity row (key, event ts), attach from EVERY
    * feature group the latest feature row at-or-before the event ts, but
    * only if it is fresher than the group's TTL; stale or missing features
    * surface as NULL, never as leaked-future or expired values.
    *
    * The reference's serving path is the single-table no-TTL special case
    * (reference: serving/feature_service.py:42-46 — latest row ≤ ts with no
    * staleness bound). TTL is what makes the semantics production-grade:
    * without it, a customer dormant for a year would be scored on
    * year-old features.
    *
    * Composition: one backward [[asOfJoin]] per group (each a single
    * key-shuffle + sort, no range explosion), carrying the matched right
    * timestamp inside the payload struct so the age check compares the
    * ACTUAL matched row's ts — then a per-column `when(age ≤ ttl)` mask.
    * Groups chain left-to-right; entity grain is preserved throughout
    * (each as-of join emits exactly one row per left row).
    */
  def pitJoin(entities: DataFrame, keyCol: String, tsCol: String,
              groups: Seq[FeatureGroup]): DataFrame =
    groups.zipWithIndex.foldLeft(entities) { case (acc, (g, i)) =>
      val ftsCol = s"__fts_$i"
      val withTs = g.df.withColumn(ftsCol, col(tsCol))
      val joined = asOfJoin(acc, withTs, keyCol, tsCol, g.vals :+ ftsCol)
      val fresh = col(ftsCol).isNotNull &&
        (col(tsCol) - col(ftsCol)) <= g.ttlUs
      g.vals.foldLeft(joined) { (d, v) =>
        d.withColumn(v, when(fresh, col(v)))
      }.drop(ftsCol)
    }
}

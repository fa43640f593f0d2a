package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics computed distributively — the metrics a
  * training pipeline needs server-side, at corpus scale, without collecting
  * scores to the driver (the reference computes AUC in-process via sklearn,
  * reference: jobs/make_training_and_train.py:79-84).
  *
  * Determinism contract (same as the rest of the suite): every metric is
  * assembled from BIGINT sufficient statistics with a pinned double
  * expression tree at the very end, so the DuckDB oracle reproduces the
  * bytes, not just the idea.
  */
object Eval {

  /** Per-group simple linear regression (y on x) from integer sufficient
    * statistics: one partial-aggregable pass collects
    * (n, Σx, Σy, Σxy, Σx², Σy²) per group; slope/intercept/R² are formed
    * driver-free from those exact operands.
    *
    * Scale shape: ONE exchange carrying one row per (group) of fixed-width
    * longs — map-side combine does virtually all the work, identical to the
    * corrMatrix posture. Inputs must be pre-integerized (cents/dollars) so
    * the sums are exact; squares of dollar-sized values keep Σy² under 2^63
    * through sf100 (cents would overflow at sf0.1 — same reasoning as
    * corrMatrix).
    */
  def groupRegression(df: DataFrame, grpCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val stats = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"),
        sum(col(xCol) * col(xCol)).as("sxx"),
        sum(col(yCol) * col(yCol)).as("syy"))
    // pinned double tree: cov/vx/vy formed exactly as in the oracle SQL
    val nd = col("n").cast("double")
    val cov = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val slope = cov / vx
    stats.select(col(grpCol), col("n"), col("sx"), col("sy"), col("sxy"),
      col("sxx"), col("syy"),
      slope.as("slope"),
      ((col("sy").cast("double") - slope * col("sx").cast("double")) / nd)
        .as("intercept"),
      (cov * cov / (vx * vy)).as("r2"))
  }

  /** Distributed rank-based AUC (Mann-Whitney U) of an integer score against
    * a boolean label, without a global per-row sort: scores collapse to one
    * row per DISTINCT value first (domain-bounded, like the skyline sweep),
    * then a single running-sum window over that tiny set counts
    * wins*2 + ties per positive:
    *
    *   num2 = Σ_s  pos_s · (2·(negatives strictly below s) + neg_s)
    *   AUC  = num2 / (2·n_pos·n_neg)
    *
    * Exact — equivalent to the average-rank formulation with tie correction —
    * and every count is a BIGINT until the one final division. At 100 TB the
    * per-row work is a partial aggregate on (score); only distinct scores
    * reach the single-partition window (cents-valued scores: bounded domain).
    */
  /** ANN RECALL@k — the quality gate every approximate-similarity pipeline
    * needs before swapping in for brute force: per query, how many of the
    * approximate index's top-k survive in the EXACT top-k. Emits one row
    * per query (hits, k) plus the query's worst surviving exact rank —
    * exact integers, so the whole evaluation is oracle-checkable (the
    * usual float "recall = 0.97" is the caller's one division away).
    *
    * Scale shape: both sides are the already-WindowGroupLimit'd top-k edge
    * lists (|queries|·k rows); the comparison is an equi-join + count on
    * that reduced table, never on raw scores.
    */
  def annRecall(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.select(col("q_id"), col("n_id"))
      .withColumn("__hit", lit(1L))
    val e = exact.select(col("q_id"), col("n_id"),
      col("rank").cast("long").as("exact_rank"))
    // left join from the EXACT side: zero-hit queries must still appear
    // (they are the whole point of a recall gate)
    e.join(a, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
        max(when(col("__hit").isNotNull, col("exact_rank")))
          .as("worst_kept_rank"))
      .select(col("q_id"), col("hits"), lit(k.toLong).as("k"),
        col("worst_kept_rank"))
  }

  /** CALIBRATION BINS (reliability diagram) — per score decile: population,
    * positive count, exact integer score range, and the two pinned-division
    * means (observed positive rate vs mean score) whose divergence IS
    * miscalibration. The companion to [[rankAuc]]: AUC measures ranking,
    * this measures whether the score's VALUE is trustworthy as a
    * probability, which decides if a threshold (reference E5,
    * serving/app.py:47-48) is meaningful.
    *
    * Decile assignment is ntile over (score, id) — deterministic under
    * ties; all sums are BIGINT, the two means are single final divisions
    * from identical operands.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      idCol: String, bins: Int): DataFrame = {
    import graft.ops.Ranks
    // distributed ntile (Ranks): score-range buckets monotone in the sort
    // key; no fact-sized unpartitioned window (bit-identical to ntile)
    Ranks.withGlobalRank(df, expr(s"$scoreCol DIV 100000"),
        Seq(col(scoreCol).asc, col(idCol).asc), "__rn", "__n")
      .withColumn("bin", Ranks.ntileFromRank(col("__rn"), col("__n"), bins))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        min(col(scoreCol)).as("score_min"),
        max(col(scoreCol)).as("score_max"),
        sum(col(scoreCol)).as("score_sum"))
      .select(col("bin"), col("n"), col("n_pos"), col("score_min"),
        col("score_max"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"),
        (col("score_sum").cast("double") / col("n")).as("mean_score"))
  }

  /** MinHash-LSH BANDING recall gate — the dedup-side sibling of
    * [[annRecall]]: ground truth is the exact n-gram Jaccard pair set at
    * `minJaccard`, the candidate set is the banding stage of the LSH
    * pipeline ALONE (no exact verify), and the output is per-similarity-
    * decile (n_truth, n_hit, recall). This measures the S-curve the banding
    * parameters (bands × rows) actually deliver on THIS corpus — the
    * go/no-go before trusting LSH to replace the quadratic exact join, and
    * the instrument for tuning band geometry when recall at the target
    * threshold is too low.
    *
    * Scale shape: the ground-truth join is the exact co-shingle self-join —
    * affordable at eval-sample scale, which is how a production gate runs
    * (sample, not corpus); the candidate side is the same banding plan the
    * full pipeline uses. The comparison itself joins two pair lists.
    */
  def lshRecall(documents: DataFrame, k: Int = 3,
                minJaccard: Double = 0.3): DataFrame = {
    val sh = Dedup.shingleIds(documents, k).cache()
    val truth = Dedup.jaccardFromShingleIds(sh, minJaccard)
    val cands = Dedup.minhashLshCandidates(sh)
      .select(col("doc_id").as("d1"), col("doc_id2").as("d2"),
        lit(1L).as("__hit"))
    truth.join(cands, Seq("d1", "d2"), "left")
      // decile via floor(j*10) on the SAME double both engines compute from
      // identical integer operands — bit-stable, like every jaccard filter
      // in the suite
      .groupBy(floor(col("jaccard") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_truth"))
  }

  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = perScore
      .withColumn("cumneg", coalesce(sum(col("neg")).over(w), lit(0L)))
      .select(col("pos"), col("neg"),
        (col("pos") * (lit(2L) * col("cumneg") + col("neg"))).as("num2c"))
    contrib.agg(
      sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
      sum(col("num2c")).as("auc_num2"))
      .select(col("n_pos"), col("n_neg"), col("auc_num2"),
        (col("auc_num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"))
  }
}

package graft

import scala.io.Source

/** CI pin for the plan census (tools/census_baseline.tsv).
  *
  * The census is the structural screen that catches shared-subtree replans
  * — a query whose corpus-wide scan/explode plans once per consumer instead
  * of once (25 replay bugs in the r8 sweep; the q300 bigram triple-scan in
  * r9). Until now it ran by hand, so a regression could land silently. This
  * spec regenerates every query's census at sf0.001 and fails if any count
  * EXCEEDS its committed adjudicated value (lower is fine — that's an
  * improvement; refresh the baseline as Explain's scaladoc describes).
  *
  * Three structural properties are pinned:
  *  - parquet SCANS — the 100 TB-relevant number (each extra scan of a fact
  *    table is a full corpus pass), stable across partition settings unlike
  *    exchange counts under AQE;
  *  - GENERATES (r10) — for the queries whose census fix was persisting an
  *    explode, a replanned Generate INSIDE a cached scan is the one replay
  *    shape the scan pin cannot see (the scan count stays 1 while the
  *    corpus-wide explode runs once per consumer again);
  *  - HOIST violations at zero (r10) — the q296 class: a heavy function
  *    hoisted by ExtractGenerator into the Project above a Generate without
  *    consuming the generator's output re-runs once per EXPLODED row
  *    (q296 paid 32 md5s per order until split below the explode).
  */
class PlanCensusSpec extends SparkSpec {

  private val baselinePath = "tools/census_baseline.tsv"

  /** Hard ceiling for [[Explain.planWeight]]'s expression-path count —
    * ~5× the heaviest healthy query, ~9× under the pre-fix q440. */
  private val PlanWeightCeiling = 120000L

  test("no query scans, generates, or globally-windows more than its " +
    "adjudicated census baseline") {
    val src = Source.fromFile(baselinePath)
    // row: query \t scans \t exchanges \t generates \t imr \t lambda
    //      \t windows.
    // Validate instead of bare toInt: the documented regen recipe greps
    // bench output, where an error line also starts with the query name —
    // such a row must fail BY NAME, not as a NumberFormatException
    val baseline: Map[String, (Int, Int, Int)] =
      try src.getLines().drop(1).filter(_.nonEmpty).map { l =>
        val f = l.split('\t')
        // nonEmpty first: forall on an empty string is vacuously true, so
        // a blank field would otherwise slip through to toInt and crash
        // with the NumberFormatException this check exists to replace
        def num(i: Int) = f(i).nonEmpty && f(i).forall(_.isDigit)
        require(f.length >= 7 && num(1) && num(3) && num(6),
          s"$baselinePath: malformed row for '${f.head}' — regenerate the " +
            "baseline and drop non-census (e.g. ERR) lines")
        f(0) -> ((f(1).toInt, f(3).toInt, f(6).toInt))
      }.toMap
      finally src.close()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val missing = names.filterNot(baseline.contains)
    assert(missing.isEmpty,
      s"queries missing from $baselinePath (regenerate it per Explain's " +
        s"scaladoc and adjudicate the new rows): ${missing.mkString(", ")}")
    // and the inverse: a deleted/renamed query must not leave a dead row,
    // or the committed tsv drifts from the suite it claims to pin
    val stale = baseline.keySet.diff(names.toSet)
    assert(stale.isEmpty,
      s"stale rows in $baselinePath for queries that no longer exist " +
        s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")

    // clearCache in finally: several builders run eager actions while the
    // plan is constructed (e.g. q354's keys.count()), so an exception
    // mid-loop would otherwise strand their persisted relations in the
    // shared TestSpark session and poison later suites
    val regressions =
      try names.flatMap { n =>
        spark.sharedState.cacheManager.clearCache()
        val df = SparkEntry.queries(n)(spark, sf)
        val p = Explain.formatted(df)
        val got = Explain.censusRowOf(p)
          .copy(windows = Explain.unpartitionedWindows(df))
        val (wantScans, wantGen, wantWin) = baseline(n)
        val scanRow =
          if (got.scans > wantScans)
            Some(s"$n: ${got.scans} scans > adjudicated $wantScans") else None
        val genRow =
          if (got.generates > wantGen)
            Some(s"$n: ${got.generates} generates > adjudicated $wantGen")
          else None
        // the r11 column: an UNPARTITIONED Window/WindowGroupLimit routes
        // every row to one task — the adjudicated nonzero counts are all
        // on domain-bounded relations (calendar spines, distinct-value
        // reduces); anything fact-sized is pinned at zero
        val winRow =
          if (got.windows > wantWin)
            Some(s"$n: ${got.windows} unpartitioned windows > adjudicated " +
              s"$wantWin — if the new window's input is NOT domain-bounded, " +
              "partition it; otherwise re-adjudicate the baseline")
          else None
        // the q296 class, pinned at ZERO repo-wide: a heavy function in
        // the Project directly above a Generate that ignores the
        // generator's output re-runs once per exploded row
        val hoistRows = Explain.hoistViolations(p).map(v => s"$n: $v")
        // every nonzero-window row's domain-bounded claim, machine-checked
        // (r12): the audit recurses through InMemoryRelation and registered
        // localCheckpoints, so "adjudicate by what built the cache" is no
        // longer a human step — any line still containing RAW means a
        // window whose input the audit cannot prove reduced
        val rawRows =
          if (got.windows == 0) Nil
          else Explain.windowAudit(df).filter(_.contains("RAW"))
            .map(l => s"$n: unpartitioned window over an unproven input — $l")
        // COLD-PLAN WEIGHT ceiling (r13, the q440 class): the DAG-expanded
        // expression-path count of the un-cached plan, through IMR/AQE
        // boundaries. Pre-fix q440 weighed 1,123,645 paths here and cost
        // 13 min of single-threaded codegen per cold run; the healthy
        // suite tops out around 20k (q437 WordPiece round unrolls). A plan
        // over the ceiling WILL hang driver-side at execution — sever the
        // composition with a provenance-registered localCheckpoint at the
        // reused-subtree boundary (the q440/q463/q438 discipline).
        val (_, w) = Explain.planWeight(df)
        val weightRow =
          if (w > PlanWeightCeiling)
            Some(s"$n: cold-plan weight $w > ceiling $PlanWeightCeiling — " +
              "a non-cheap alias is being substituted per reference " +
              "(pushdown/collapse); checkpoint the boundary")
          else None
        scanRow.toSeq ++ genRow.toSeq ++ winRow.toSeq ++ hoistRows ++
          rawRows ++ weightRow.toSeq
      }
      finally spark.sharedState.cacheManager.clearCache()
    assert(regressions.isEmpty,
      "plan-census regressions (a shared subtree is being replanned per " +
        "consumer — persist it or re-adjudicate the baseline):\n  " +
        regressions.mkString("\n  "))
  }

  test("the cold-plan weight gate fires on a q440-shaped alias blowup, " +
    "stays quiet on a checkpoint-severed equivalent, and never hangs") {
    import org.apache.spark.sql.functions._
    // BUG shape (the r12 q440 class, distilled): a non-cheap alias
    // consumed 3× per composition round builds a compact object DAG whose
    // every TREE walk — optimizer substitution, codegen, toString — costs
    // 3^rounds visits. 13 rounds = 1.59M paths, comfortably over the
    // ceiling yet cheap to COUNT (the cap bounds the walk).
    var e: org.apache.spark.sql.Column = col("id")
    for (_ <- 1 to 13) { val c = e; e = c + c + c }
    val bad = spark.range(0, 10).select(e.as("v"))
    val (_, badW) = Explain.planWeight(bad)
    assert(badW > PlanWeightCeiling,
      s"the distilled q440 shape must exceed the ceiling (got $badW)")
    // and the cap bounds the WALK itself — a plan past the cap reports
    // the cap (still a gate failure) instead of hanging the measurement
    val (_, cappedW) = Explain.planWeight(bad, cap = 1000L)
    assert(cappedW == 1000L,
      s"a capped walk must report the cap, not undercount (got $cappedW)")
    // FIXED shape: the same composition severed by a localCheckpoint is a
    // leaf — the monster's cost was paid once at build, the plan is tiny
    val sev = Explain.localCheckpointWithProvenance(
      spark.range(0, 10).select((col("id") + col("id") + col("id")).as("v")))
    val good = sev.select((col("v") + col("v") + col("v")).as("w"))
    val (_, goodW) = Explain.planWeight(good)
    assert(goodW < 1000L,
      s"a checkpoint-severed plan must weigh almost nothing (got $goodW)")
  }

  test("the hoist detector fires on the q296 bug shape and stays quiet " +
    "on the fixed shape") {
    import org.apache.spark.sql.functions._
    val base = spark.range(0, 10).select(col("id"))
    // BUG shape: hash and explode in ONE select — ExtractGenerator hoists
    // the md5 above the Generate, once per exploded row
    val bad = base.select(
      conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10).as("h"),
      explode(sequence(lit(0), lit(3))).as("b"))
    assert(Explain.hoistViolations(Explain.formatted(bad)).nonEmpty,
      "detector must flag a generator-independent heavy expr above Generate")
    // FIXED shape: hash in a select below the explode
    val good = base
      .select(conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
        .as("h"))
      .select(col("h"), explode(sequence(lit(0), lit(3))).as("b"))
    assert(Explain.hoistViolations(Explain.formatted(good)).isEmpty,
      "detector must accept the hash below the explode")
    // LEGITIMATE per-exploded-row shape: the hash consumes the generator
    // output (a shingle hash), so above-Generate is the only correct place
    val legit = spark.createDataFrame(Seq(Tuple1("abcdef"))).toDF("text")
      .select(explode(sequence(lit(0), lit(2))).as("p"), col("text"))
      .select(md5(col("text").substr(col("p") + 1, lit(3))).as("g"))
    assert(Explain.hoistViolations(Explain.formatted(legit)).isEmpty,
      "detector must not flag a hash that consumes the generator output")
  }

  test("the unpartitioned-window detector fires on a global window and " +
    "stays quiet on partitioned and group-limit-optimized shapes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("k"))
    // BUG shape: Window.orderBy with no partitionBy — every row to one task
    val global = base.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    assert(Explain.unpartitionedWindows(global) == 1,
      "detector must count the empty-partitionSpec WindowExec")
    // FIXED shape: the same rank partitioned by a key
    val part = base.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("id"))))
    assert(Explain.unpartitionedWindows(part) == 0,
      "a partitioned window must not be counted")
    // WindowGroupLimit shape: rank + filter collapses to a group-limit
    // node, which carries the SAME partitionSpec field — a global top-k
    // must still be seen even when the Window node is optimized away
    val globalTopK = base.withColumn("rn",
      row_number().over(Window.orderBy(col("id")))).filter(col("rn") <= 3)
    assert(Explain.unpartitionedWindows(globalTopK) >= 1,
      "a global top-k (WindowGroupLimit) must be counted")
    val partTopK = base.withColumn("rn",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("id"))))
      .filter(col("rn") <= 3)
    assert(Explain.unpartitionedWindows(partTopK) == 0,
      "a partitioned top-k must not be counted")
  }

  test("the window audit sees through cache and checkpoint boundaries " +
    "(r12): agg-built inputs resolve, a cached fact-sized input stays RAW") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val fact = spark.read.parquet(s"$sf/events.parquet")
    // NEGATIVE: a global window over a cached FACT-SIZED relation must
    // still report RAW — the cache boundary must not launder the shape
    val cachedFact = fact.cache()
    try {
      val w = cachedFact
        .withColumn("rn", row_number().over(Window.orderBy(col("ts"))))
      val audit = Explain.windowAudit(w)
      assert(audit.nonEmpty && audit.forall(_.contains("cache-of(RAW)")),
        s"expected cache-of(RAW) for a cached fact under a global window, " +
          s"got: ${audit.mkString("; ")}")
    } finally cachedFact.unpersist()
    // POSITIVE: a cached AGGREGATE resolves through the cache
    val agg = fact.groupBy(col("user_id")).agg(count(lit(1)).as("n")).cache()
    try {
      val w = agg
        .withColumn("rn", row_number().over(Window.orderBy(col("user_id"))))
      val audit = Explain.windowAudit(w)
      assert(audit.exists(_.contains("cache-of(agg-below(user_id)")),
        s"expected cache-of(agg-below(user_id)), got: ${audit.mkString("; ")}")
    } finally agg.unpersist()
    // CHECKPOINT with registered provenance resolves; an UNREGISTERED one
    // must stay RAW (opaque = unproven, never silently trusted)
    val reg = Explain.localCheckpointWithProvenance(
      fact.groupBy(col("user_id")).agg(count(lit(1)).as("n")))
    val wReg = reg
      .withColumn("rn", row_number().over(Window.orderBy(col("user_id"))))
    assert(Explain.windowAudit(wReg)
      .exists(_.contains("checkpoint-of(agg-below(user_id)")),
      "registered checkpoint must carry its build provenance")
    val unreg = fact.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val wUnreg = unreg
      .withColumn("rn", row_number().over(Window.orderBy(col("user_id"))))
    assert(Explain.windowAudit(wUnreg)
      .exists(_.contains("RAW-unregistered-checkpoint")),
      "an unregistered checkpoint must report as RAW")
  }
}

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
  * Two columns are pinned:
  *  - parquet SCANS — the 100 TB-relevant number (each extra scan of a fact
  *    table is a full corpus pass), stable across partition settings unlike
  *    exchange counts under AQE;
  *  - GENERATES (r10) — for the queries whose census fix was persisting an
  *    explode, a replanned Generate INSIDE a cached scan is the one replay
  *    shape the scan pin cannot see (the scan count stays 1 while the
  *    corpus-wide explode runs once per consumer again).
  */
class PlanCensusSpec extends SparkSpec {

  private val baselinePath = "tools/census_baseline.tsv"

  test("no query scans or generates more than its adjudicated census baseline") {
    val src = Source.fromFile(baselinePath)
    // row: query \t scans \t exchanges \t generates \t imr \t lambda.
    // Validate instead of bare toInt: the documented regen recipe greps
    // bench output, where an error line also starts with the query name —
    // such a row must fail BY NAME, not as a NumberFormatException
    val baseline: Map[String, (Int, Int)] =
      try src.getLines().drop(1).filter(_.nonEmpty).map { l =>
        val f = l.split('\t')
        require(f.length >= 4 && f(1).forall(_.isDigit) && f(3).forall(_.isDigit),
          s"$baselinePath: malformed row for '${f.head}' — regenerate the " +
            "baseline and drop non-census (e.g. ERR) lines")
        f(0) -> ((f(1).toInt, f(3).toInt))
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
        val got = Explain.censusOf(spark, sf, n)
        val (wantScans, wantGen) = baseline(n)
        val scanRow =
          if (got.scans > wantScans)
            Some(s"$n: ${got.scans} scans > adjudicated $wantScans") else None
        val genRow =
          if (got.generates > wantGen)
            Some(s"$n: ${got.generates} generates > adjudicated $wantGen")
          else None
        scanRow.toSeq ++ genRow.toSeq
      }
      finally spark.sharedState.cacheManager.clearCache()
    assert(regressions.isEmpty,
      "plan-census regressions (a shared subtree is being replanned per " +
        "consumer — persist it or re-adjudicate the baseline):\n  " +
        regressions.mkString("\n  "))
  }
}

package graft

import scala.io.Source

/** CI pin for the plan census (tools/census_baseline.tsv).
  *
  * The census is the structural screen that catches shared-subtree replans
  * — a query whose corpus-wide scan/explode plans once per consumer instead
  * of once (25 replay bugs in the r8 sweep; the q300 bigram triple-scan in
  * r9). Until now it ran by hand, so a regression could land silently. This
  * spec regenerates every query's scan count at sf0.001 and fails if any
  * count EXCEEDS its committed adjudicated value (lower is fine — that's an
  * improvement; refresh the baseline as Explain's scaladoc describes).
  *
  * Only the parquet-scan count is pinned: it is the 100 TB-relevant number
  * (each extra scan of a fact table is a full corpus pass) and it is stable
  * across partition settings, unlike exchange counts under AQE.
  */
class PlanCensusSpec extends SparkSpec {

  private val baselinePath = "tools/census_baseline.tsv"

  test("no query scans more parquet than its adjudicated census baseline") {
    val src = Source.fromFile(baselinePath)
    val baseline: Map[String, Int] =
      try src.getLines().drop(1).map { l =>
        val f = l.split('\t'); f(0) -> f(1).toInt
      }.toMap
      finally src.close()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val missing = names.filterNot(baseline.contains)
    assert(missing.isEmpty,
      s"queries missing from $baselinePath (regenerate it per Explain's " +
        s"scaladoc and adjudicate the new rows): ${missing.mkString(", ")}")

    val regressions = names.flatMap { n =>
      val got = Explain.censusOf(spark, sf, n).scans
      val want = baseline(n)
      if (got > want) Some(s"$n: $got scans > adjudicated $want") else None
    }
    // leave no stale cache behind for later suites
    spark.sharedState.cacheManager.clearCache()
    assert(regressions.isEmpty,
      "plan-census regressions (a shared subtree is being replanned per " +
        "consumer — persist it or re-adjudicate the baseline):\n  " +
        regressions.mkString("\n  "))
  }
}

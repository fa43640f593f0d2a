package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev main: dump formatted physical plans for named queries (plan review —
  * SURVEY.md §4 posture: verify window fusion, pushdown, broadcast choices).
  *
  * `--census` mode prints one TSV row per query instead of full plans:
  * parquet-scan count, Exchange count, Generate count, InMemoryRelation
  * refs, and whether any higher-order lambda survives in the physical plan
  * — the structural-waste screen used for the bench-tail sweeps (a high
  * scan count without a matching cache is a shared subtree replanned per
  * consumer; a lambdafunction is an interpreted per-row allocation).
  * `--census q1 q2 ...` censuses only the named queries.
  *
  * The committed snapshot lives at `tools/census_baseline.tsv`;
  * PlanCensusSpec regenerates every row at sf0.001 in CI and fails if any
  * query's scan or generate count exceeds the committed value, so a
  * shared-subtree replan (the r8 q300 escape) can't land silently. Refresh
  * after an adjudicated plan change with:
  * {{{
  * sbt -batch "runMain graft.Explain --census" 2>/dev/null \
  *   | grep -P "^q|^query" | grep -v $'\tERR\t' > tools/census_baseline.tsv
  * }}}
  * (the `grep -v` drops error rows, which also start with the query name —
  * PlanCensusSpec rejects a malformed row by name rather than crashing,
  * but an ERR row in the baseline means that query was never adjudicated).
  */
object Explain {

  /** One census row: (parquet scans, exchanges, generates, InMemoryRelation
    * refs, any interpreted lambda). Counts the FormattedMode detail section,
    * where each operator prints exactly once. */
  case class CensusRow(scans: Int, exchanges: Int, generates: Int,
                       imr: Int, lambda: Boolean) {
    def tsv: String = s"$scans\t$exchanges\t$generates\t$imr\t$lambda"
  }

  def censusRow(df: DataFrame): CensusRow = {
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    CensusRow(
      p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")),
      p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")),
      p.linesIterator.count(_.matches("""\(\d+\) Generate.*""")),
      p.linesIterator.count(_.contains("InMemoryRelation")),
      p.contains("lambdafunction"))
  }

  /** Census one query by name against `dir`, clearing the shared cache
    * first so counts reflect the fresh-session plan shape. */
  def censusOf(spark: SparkSession, dir: String, name: String): CensusRow = {
    spark.sharedState.cacheManager.clearCache()
    censusRow(SparkEntry.queries(name)(spark, dir))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session(cores = 4, appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val census = args.headOption.contains("--census")
    val names =
      if (census && args.length > 1) args.drop(1).toSeq // census of a subset
      else if (args.nonEmpty && !census) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    if (census) println("query\tscans\texchanges\tgenerates\timr\tlambda")
    for (n <- names) {
      if (census) {
        try println(s"$n\t${censusOf(spark, dir, n).tsv}")
        catch { case e: Throwable => println(s"$n\tERR\t$e") }
      } else {
        println(s"\n========== $n ==========")
        try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}

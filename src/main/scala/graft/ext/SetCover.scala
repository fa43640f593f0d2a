package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GREEDY SET COVER over (source → word-set): pick, k times, the source
  * adding the most uncovered words — the coverage-maximizing data-selection
  * step of corpus curation ("which k sources buy the broadest vocabulary"),
  * and the classic ln(n)-approximation to the NP-hard optimum.
  *
  * Iteration shape (the k-means/k-center discipline, q53/q180): k rounds,
  * each ONE distributed anti-join + partial-aggregable count over the
  * (source, word) reduce, with only the |sources|-row gain table and the
  * argmax touching the driver. The covered set stays distributed
  * (localCheckpoint per round cuts the growing union lineage). Ties pinned
  * by source name.
  */
object SetCover {

  /** Returns one row per round: (round, source, n_new, cum_covered). */
  def greedy(sourceWords: DataFrame, k: Int): DataFrame = {
    val spark = sourceWords.sparkSession
    import spark.implicits._
    val sw = sourceWords.select(col("source"), col("w")).distinct()
      .localCheckpoint()
    var covered = sw.select(col("w")).limit(0).localCheckpoint()
    var cum = 0L
    val picks = (1 to k).map { round =>
      val gains = sw.join(covered, Seq("w"), "left_anti")
        .groupBy(col("source")).agg(count(lit(1)).as("n_new"))
        .orderBy(col("n_new").desc, col("source").asc)
        .limit(1).collect()
      val (src, nNew) =
        if (gains.isEmpty) ("", 0L)
        else (gains(0).getString(0), gains(0).getLong(1))
      cum += nNew
      if (gains.nonEmpty) {
        covered = covered
          .unionByName(sw.filter(col("source") === src).select(col("w")))
          .distinct().localCheckpoint()
      }
      (round.toLong, src, nNew, cum)
    }
    picks.toDF("round", "source", "n_new", "cum_covered")
      .filter(col("source") =!= "")
  }

  /** DuckDB mirror: the k rounds unrolled as chained CTEs. */
  def greedySql(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val prevCov = if (r == 1) "" else
        s" WHERE w NOT IN (SELECT w FROM cov${r - 1})"
      val covPrev = if (r == 1) "SELECT NULL AS w WHERE false"
        else s"SELECT w FROM cov${r - 1}"
      s"""gain$r AS (
         |  SELECT source, count(*) AS n_new FROM sw$prevCov
         |  GROUP BY 1 ORDER BY n_new DESC, source LIMIT 1),
         |cov$r AS (
         |  $covPrev
         |  UNION
         |  SELECT w FROM sw WHERE source = (SELECT source FROM gain$r))"""
        .stripMargin
    }.mkString(",\n")
    val rows = (1 to k).map { r =>
      s"""SELECT $r AS round, (SELECT source FROM gain$r) AS source,
         |  (SELECT n_new FROM gain$r) AS n_new,
         |  (SELECT count(*) FROM cov$r) AS cum_covered"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    // bigrams, not unigrams: the fixtures' word vocabulary is coverable by
    // one source, which would exhaust the greedy after round 1
    s"""WITH docs AS (
       |  SELECT source, string_split(text, ' ') AS wl FROM documents),
       |sw AS (
       |  SELECT DISTINCT source, wl[i] || ' ' || wl[i + 1] AS w
       |  FROM docs, unnest(range(1, len(wl))) t(i)),
       |$rounds
       |SELECT * FROM ($rows)
       |WHERE source IS NOT NULL""".stripMargin
  }
}

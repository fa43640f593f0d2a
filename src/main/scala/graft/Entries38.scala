package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 17: greedy set-cover source selection, Benford
  * first-digit profile.
  */
object Entries38 {

  val all: Seq[Q] = Seq(

    // GREEDY SET COVER: the 5 sources that together cover the most
    // BIGRAM vocabulary, picked by marginal gain (ext/SetCover.scala) —
    // the coverage-maximizing corpus-selection step, with the ENTIRE
    // greedy (all 5 rounds) replayed in the oracle's chained CTEs. Ties
    // by source name; bigrams because one source covers the fixtures'
    // whole unigram vocabulary (the q259 lesson).
    Q("q265_set_cover",
      (s, d) => graft.ext.SetCover.greedy(
        Tables.documents(s, d)
          .select(col("source"), split(col("text"), " ").as("wl"))
          .select(col("source"), explode(expr(
            "transform(slice(wl, 1, size(wl) - 1), " +
              "(x, i) -> concat(x, ' ', wl[i + 1]))")).as("w")), 5),
      Some(graft.ext.SetCover.greedySql(5))),

    // BENFORD FIRST-DIGIT PROFILE of order totals: leading-digit counts
    // per order year — the fraud/anomaly screen. First digit taken from
    // the integer CENTS string (exact; no float log anywhere), digits
    // 1-9 (cents > 0 always holds here, pinned by n_nonpos).
    Q("q266_benford",
      (s, d) => Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("long").as("y"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("y"),
          substring(col("cents").cast("string"), 1, 1).as("digit"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") <= 0, 1L).otherwise(0L)).as("n_nonpos")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             |  substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS digit,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
             |    <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos
             |FROM orders GROUP BY 1, 2""".stripMargin)))
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 19: mixture rebalance plan, Cohen's kappa agreement. */
object Entries40 {

  val all: Seq[Q] = Seq(

    // MIXTURE REBALANCE PLAN: the per-source add/remove ledger that turns
    // the CURRENT corpus composition into a UNIFORM target at the same
    // total — target quotas by the Hamilton largest-remainder rule
    // (exactly the q186/q234 allocation discipline: ⌊T/k⌋ each, leftovers
    // by remainder rank → here by source name, since remainders tie),
    // delta = target − current. Σdelta = 0 by construction — the plan is
    // exactly executable.
    Q("q269_rebalance_plan",
      (s, d) => {
        val cur = Tables.documents(s, d)
          .groupBy(col("source")).agg(count(lit(1)).as("n_current"))
        val w = Window.orderBy(col("source").asc)
        val withTot = cur
          .withColumn("total", sum(col("n_current")).over(
            Window.partitionBy()))
          .withColumn("k", count(lit(1)).over(Window.partitionBy()))
          .withColumn("rk", row_number().over(w).cast("long"))
        withTot.select(col("source"), col("n_current"),
          (expr("total DIV k") +
            when(col("rk") <= expr("total % k"), 1L).otherwise(0L))
            .as("n_target"))
          .withColumn("delta", col("n_target") - col("n_current"))
      },
      Some("""WITH cur AS (
             |  SELECT source, count(*) AS n_current
             |  FROM documents GROUP BY 1),
             |t AS (
             |  SELECT source, n_current,
             |    sum(n_current) OVER () AS total,
             |    count(*) OVER () AS k,
             |    row_number() OVER (ORDER BY source) AS rk
             |  FROM cur)
             |SELECT source, n_current,
             |  CAST(total // k + CASE WHEN rk <= total % k THEN 1 ELSE 0 END
             |    AS BIGINT) AS n_target,
             |  CAST(total // k + CASE WHEN rk <= total % k THEN 1 ELSE 0 END
             |    - n_current AS BIGINT) AS delta
             |FROM t""".stripMargin)),

    // COHEN'S KAPPA between two deterministic document "annotators" (a
    // length gate and an alpha-ratio gate — the two quality heuristics
    // judging the same corpus), as EXACT integers: observed agreement,
    // the chance-agreement margin term Σ(row·col), and the
    // cross-multiplied kappa pair (n·agree − Σm, n² − Σm). The
    // inter-annotator/inter-heuristic reliability gate an labeling
    // pipeline reports before trusting either signal.
    Q("q270_kappa",
      (s, d) => {
        val judged = Tables.documents(s, d).select(
          when(col("n_chars") >= 200, 1L).otherwise(0L).as("a"),
          when(length(regexp_replace(col("text"), "[^a-zA-Z ]", "")) * 10
            >= length(col("text")) * 9, 1L).otherwise(0L).as("b"))
        judged.agg(
          count(lit(1)).as("n"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
          sum(col("a")).as("a1"), sum(col("b")).as("b1"))
          .select(col("n"), col("n_agree"), col("a1"), col("b1"),
            ((col("a1") * col("b1")) +
              ((col("n") - col("a1")) * (col("n") - col("b1"))))
              .as("margin_sum"),
            (col("n") * col("n_agree") -
              ((col("a1") * col("b1")) +
                ((col("n") - col("a1")) * (col("n") - col("b1")))))
              .as("kappa_num"),
            (col("n") * col("n") -
              ((col("a1") * col("b1")) +
                ((col("n") - col("a1")) * (col("n") - col("b1")))))
              .as("kappa_den"))
      },
      Some("""WITH judged AS (
             |  SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN length(regexp_replace(text, '[^a-zA-Z ]', '',
             |        'g')) * 10 >= length(text) * 9
             |      THEN 1 ELSE 0 END AS b
             |  FROM documents),
             |agg AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_agree,
             |    CAST(sum(a) AS BIGINT) AS a1, CAST(sum(b) AS BIGINT) AS b1
             |  FROM judged)
             |SELECT n, n_agree, a1, b1,
             |  CAST(a1 * b1 + (n - a1) * (n - b1) AS BIGINT) AS margin_sum,
             |  CAST(n * n_agree - (a1 * b1 + (n - a1) * (n - b1))
             |    AS BIGINT) AS kappa_num,
             |  CAST(n * n - (a1 * b1 + (n - a1) * (n - b1)) AS BIGINT)
             |    AS kappa_den
             |FROM agg""".stripMargin)))
}

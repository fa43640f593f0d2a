package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup}
import graft.Tables

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("decontaminate never flags eval docs and counts real overlaps") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.decontaminate(docs, 3, 97).cache()
    assert(out.filter($"doc_id" % 97 === 0).count() == 0)
    assert(out.filter($"n_eval_grams" <= 0).count() == 0)
    // every flagged doc genuinely shares a distinct 3-gram with the eval set
    val evalGrams = Dedup.shingles(docs.filter($"doc_id" % 97 === 0), 3)
      .select($"sh").distinct()
    val recheck = Dedup.shingles(docs.filter($"doc_id" % 97 =!= 0), 3)
      .join(evalGrams, "sh").groupBy($"doc_id").count()
    assert(out.select($"doc_id", $"n_eval_grams")
      .except(recheck.select($"doc_id", $"count".as("n_eval_grams")))
      .count() == 0)
  }

  test("decontaminate broadcasts the eval gram set (no corpus-side shuffle join)") {
    val plan = planOf(Curation.decontaminate(Tables.documents(spark, sf), 3, 97))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan.take(600))
  }

  test("semanticDedup keeps every cluster's minimum id and only drops near-dups") {
    val out = Curation.semanticDedup(Tables.embeddings(spark, sf), 100, 0.4).cache()
    val minIds = out.groupBy($"cluster").agg(min($"vec_id").as("vec_id"))
    assert(out.join(minIds, Seq("cluster", "vec_id")).filter($"keep" === 0).count() == 0)
    assert(out.select($"keep").distinct().collect().map(_.getInt(0)).toSet.subsetOf(Set(0, 1)))
    assert(out.filter($"keep" === 0).count() > 0) // fixtures do contain near-dups
  }

  test("mixtureSample keeps the largest source whole and subsamples the rest") {
    val out = Curation.mixtureSample(Tables.documents(spark, sf)).cache()
    val top = out.orderBy($"n_docs".desc).first()
    assert(top.getAs[Long]("thr") == 1048576L)
    assert(top.getAs[Long]("n_sampled") == top.getAs[Long]("n_docs"))
    assert(out.filter($"n_sampled" > $"n_docs").count() == 0)
    assert(out.filter($"thr" > 1048576L).count() == 0)
    // the rate is monotone in source size: a strictly smaller source never
    // gets a higher threshold (sqrt is increasing)
    val pairs = out.as("a").join(out.as("b"),
      col("a.n_docs") < col("b.n_docs") && col("a.thr") > col("b.thr"))
    assert(pairs.count() == 0)
  }

  test("repetitionFilter word totals match split sizes; keep obeys the 1/5 rule") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.repetitionFilter(docs).cache()
    val sizes = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    assert(out.join(sizes, "doc_id").filter($"n_words" =!= $"n").count() == 0)
    assert(out.filter(($"keep" === 1) =!= ($"max_freq" * 5 < $"n_words")).count() == 0)
    assert(out.filter($"max_freq" > $"n_words").count() == 0)
  }

  test("redactDigits masks every digit and the count is the digit total") {
    val byId = Curation.redactDigits(
      Seq((1L, "call 555-0199 x42"), (2L, "no digits"), (3L, "7"))
        .toDF("id", "s"), "s").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_digits")))).toMap
    assert(byId(1L) == (("call #-# x#", 9L)))
    assert(byId(2L) == (("no digits", 0L)))
    assert(byId(3L) == (("#", 1L)))
  }

  test("ngramCounts: occurrence >= doc frequency and min-count holds") {
    val out = Curation.ngramCounts(Tables.documents(spark, sf), 2, 3).cache()
    assert(out.filter($"n_occurrences" < $"n_docs").count() == 0)
    assert(out.filter($"n_occurrences" < 3).count() == 0)
    assert(out.count() > 0)
  }

  test("pageRank: node set preserved, masses bounded below by the teleport term") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val out = Curation.pageRank(edges, 3).cache()
    assert(out.count() == 6)
    assert(out.filter($"mass" < 150000L).count() == 0)
    // a rerun is bit-identical (pure integer arithmetic)
    val again = Curation.pageRank(edges, 3)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    // higher-degree interior nodes outrank leaves of the chain
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) > m(1L) && m(3L) > m(4L))
  }
}

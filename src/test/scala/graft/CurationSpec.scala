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

  test("chunkDocuments covers every word and clamps the tail chunk") {
    val docs = Tables.documents(spark, sf)
    val chunks = Curation.chunkDocuments(docs, 8, 4).cache()
    // stride < chunk size → every word index is inside some chunk, and per
    // doc the total chunk words ≈ overlap-covered length
    val perDoc = chunks.groupBy($"doc_id").agg(
      sum($"n_chunk_words").as("covered"), max($"n_chunk_words").as("mx"),
      count(lit(1)).as("n_chunks"))
    assert(perDoc.filter($"mx" > 8).count() == 0)
    val sizes = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    // every chunk starts within the doc: n_chunks == ceil(n / stride)
    assert(perDoc.join(sizes, "doc_id")
      .filter($"n_chunks" =!= (($"n" + 3L) / 4L).cast("long")).count() == 0)
    // no empty chunks
    assert(chunks.filter($"n_chunk_words" <= 0).count() == 0)
  }

  test("containmentPairs finds subset quotes Jaccard misses") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "completely different words here entirely unrelated")
    ).toDF("doc_id", "text")
    val out = Curation.containmentPairs(docs, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))   // 1 fully contained in 2
    assert(!out.contains((2L, 1L)))  // 2 not contained in 1
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("qualityComposite: keep iff score is 5, signals bounded") {
    val out = Curation.qualityComposite(Tables.documents(spark, sf)).cache()
    assert(out.filter($"score" < 0 || $"score" > 5).count() == 0)
    assert(out.filter(($"keep" === 1) =!= ($"score" === 5)).count() == 0)
    assert(out.count() == Tables.documents(spark, sf).count())
  }

  test("crossCorpusDedup reports all new sources and exact drop counts") {
    val docs = Seq(
      (1L, "src0", "shared text one"), (2L, "src1", "base only"),
      (10L, "src10", "shared text one"),    // dup of base → dropped
      (11L, "src10", "fresh text"),         // kept
      (12L, "src11", "shared text one")     // all of src11 dropped
    ).toDF("doc_id", "source", "text")
    val out = Curation.crossCorpusDedup(docs,
      substring($"source", 4, 10).cast("int") >= 10).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped")))).toMap
    assert(out("src10") == ((2L, 1L, 1L)))
    assert(out("src11") == ((1L, 0L, 1L))) // vanishing-source regression guard
  }

  test("fuzzyJoinEd1 finds exactly the brute-force edit-distance-1 pairs") {
    val names = Seq((1L, "kitten"), (2L, "sitten"), (3L, "kitte"),
      (4L, "kittens"), (5L, "mitten"), (6L, "banana")).toDF("id", "name")
    val out = Curation.fuzzyJoinEd1(names, "id", "name")
      .select($"k1", $"k2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same frame
    val brute = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == brute && out.contains((1L, 2L)) && out.contains((1L, 3L))
      && out.contains((1L, 4L)) && !out.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("triangles enumerates each ordered triple once") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("a", "d"), ("x", "y")).toDF("d1", "d2")
    val tri = Curation.triangles(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // K4 on {a,b,c,d} has exactly 4 triangles; the (x,y) edge none
    assert(tri == Set(("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"),
      ("b", "c", "d")))
  }

  test("collocationEdges is canonical (wa < wb, no loops) and thresholded") {
    val e = Curation.collocationEdges(Tables.documents(spark, sf), 5).cache()
    assert(e.filter($"wa" >= $"wb").count() == 0)
    assert(e.filter($"n" < 5).count() == 0)
    assert(e.count() > 0)
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

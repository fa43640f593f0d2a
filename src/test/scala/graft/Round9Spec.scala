package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, Multimodal, Similarity, TextAnalysis, TrainPrep}

/** Property pins for the round-7 batch-26..29 operators — the invariants
  * the per-query oracles can't express (guarantees, symmetries, edge
  * behavior on constructed inputs). */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("winnowing guarantee: docs sharing a >= k+w-1 substring share a fingerprint") {
    // k=8, w=4: guarantee window is 11 chars. The shared run is 16 chars.
    val shared = "abcdefghijklmnop"
    val d = docs(
      1L -> s"xxxxxxxxxxxxxx${shared}yyyyyyyyyyyy",
      2L -> s"qqqqqqqq${shared}rrrrrrrrrrrrrrrr",
      3L -> "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz") // no shared content
    // fingerprint VALUE sets via the library's own pipeline
    val fps = d
      .withColumn("t", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .withColumn("hs", expr(
        """transform(sequence(1, length(t) - 7),
          |  i -> CAST(conv(substr(md5(substring(t, i, 8)), 1, 12), 16, 10)
          |       AS BIGINT))""".stripMargin))
      .withColumn("fps", expr(
        """array_distinct(transform(sequence(1, size(hs) - 3),
          |  j -> array_min(slice(hs, j, 4))))""".stripMargin))
      .select(col("doc_id"), col("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "shared 16-char substring must yield a shared fingerprint")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty,
      "disjoint alphabets must not collide")
    // and the summary op agrees with the inline pipeline
    val sums = Dedup.winnowingFingerprints(d, 8, 4)
      .select(col("doc_id"), col("n_fingerprints"))
      .as[(Long, Long)].collect().toMap
    assert(sums(1L) == fps(1L).distinct.length.toLong)
  }

  test("MMR with mu=0 degenerates to pure top-k by relevance") {
    val emb = Tables.embeddings(spark, sf).limit(200).cache()
    val mmr = Similarity.mmrSelect(emb, 5, 0.7, 0.0)
      .select(col("vec_id")).as[Long].collect().toSeq
    val qId = emb.agg(min(col("vec_id"))).head().getLong(0)
    val q = emb.filter(col("vec_id") === qId)
      .select(col("embedding").as("q_emb"))
    val topk = emb.filter(col("vec_id") =!= qId).crossJoin(broadcast(q))
      .withColumn("rel", Similarity.cosine(col("embedding"), col("q_emb")))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(5).select(col("vec_id")).as[Long].collect().toSeq
    assert(mmr == topk, s"mu=0 must equal relevance top-k: $mmr vs $topk")
  }

  test("MMR picks are distinct and diversify vs pure top-k") {
    val emb = Tables.embeddings(spark, sf).limit(200).cache()
    val picks = Similarity.mmrSelect(emb, 6, 0.7, 0.3)
      .select(col("sel_order"), col("vec_id"), col("ms"))
      .collect()
    assert(picks.map(_.getLong(1)).distinct.length == 6)
    // ms is NULL exactly on round 0
    assert(picks.filter(_.getLong(0) == 0L).forall(_.isNullAt(2)))
    assert(picks.filter(_.getLong(0) > 0L).forall(!_.isNullAt(2)))
  }

  test("KS and Mann-Whitney are exactly null on identical populations") {
    val base = Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    // both halves = the SAME multiset: every row duplicated once per half
    val both = base.withColumn("h", lit(0))
      .unionByName(base.withColumn("h", lit(1)))
    val ks = TrainPrep.ksDrift(both, "c_mktsegment", "h", col("cents"))
    assert(ks.filter(col("ks_num") =!= 0L).count() == 0,
      "identical halves must have zero KS deviation")
    val mw = TrainPrep.mannWhitney(both, "c_mktsegment", "h", col("cents"))
    // identical multisets: U1 = n1*n2/2 exactly, i.e. 2*U1 = n1*n2
    assert(mw.filter(col("u1_x2") =!= col("n1") * col("n2")).count() == 0,
      "identical halves must give U1 = n1*n2/2 exactly")
  }

  test("epoch shuffle: exact per-epoch cover, contiguous positions, epoch-varying order") {
    val plan = TrainPrep.epochShufflePlan(
      Tables.documents(spark, sf), 2, 8).cache()
    val nDocs = Tables.documents(spark, sf).count()
    // every doc exactly once per epoch
    assert(plan.groupBy(col("epoch")).agg(countDistinct(col("doc_id")).as("n"))
      .filter(col("n") =!= nDocs).count() == 0)
    // positions are 1..count within each (epoch, shard) — no gaps
    val bad = plan.groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() == 0, "positions must be a contiguous 1..n")
    // the two epochs order docs differently (md5 re-keying)
    val e0 = plan.filter(col("epoch") === 0L)
      .select(col("doc_id"), col("shard"), col("pos"))
    val e1 = plan.filter(col("epoch") === 1L)
      .select(col("doc_id"), col("shard").as("s1"), col("pos").as("p1"))
    val moved = e0.join(e1, Seq("doc_id"))
      .filter(col("shard") =!= col("s1") || col("pos") =!= col("p1"))
    assert(moved.count() > 0, "epochs must not repeat the same order")
  }

  test("lateness census: zero on an in-order stream, exact on a swapped pair") {
    val inOrder = Seq((1L, 1L, "a", 100L), (1L, 2L, "a", 200L),
      (2L, 3L, "a", 50L)).toDF("user_id", "event_id", "event_type", "ts_us")
    val c1 = graft.ops.Sessions.latenessCensus(inOrder).collect()
    assert(c1.forall(r => r.getAs[Long]("n_late") == 0L))
    // event 2 arrives AFTER event 3 (ids) but carries an earlier ts
    val swapped = Seq((1L, 1L, "a", 100L), (1L, 2L, "a", 500L),
      (1L, 3L, "a", 350L)).toDF("user_id", "event_id", "event_type", "ts_us")
    val c2 = graft.ops.Sessions.latenessCensus(swapped).head()
    assert(c2.getAs[Long]("n_late") == 1L)
    assert(c2.getAs[Long]("max_late_us") == 150L)
    assert(c2.getAs[Long]("sum_late_us") == 150L)
  }

  test("novelty census: arrival-order asymmetry on duplicated docs") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon", // exact dup, later arrival
      3L -> "one two three four five")
    val nov = Curation.noveltyCensus(d, 3)
      .select(col("doc_id"), col("novelty_decile")).as[(Long, Long)]
      .collect().toMap
    assert(nov(1L) == 10L, "first sighting owns all its shingles")
    assert(nov(2L) == 0L, "an exact dup arriving later owns none")
    assert(nov(3L) == 10L)
  }

  test("shot boundaries: constant payload has zero cuts and zero delta") {
    val d = docs(1L -> ("x" * 300))
    val r = Multimodal.shotBoundaries(d, 64, 2000L).head()
    assert(r.getAs[Long]("n_frames") == 4L)
    assert(r.getAs[Long]("n_cuts") == 0L)
    assert(r.getAs[Long]("max_delta") == 0L)
    assert(r.getAs[Long]("sum_delta") == 0L)
  }

  test("sign drift census: mirrored halves have zero imbalance everywhere") {
    // even ids and odd ids carry the SAME vectors → per-bucket counts
    // equal → cross-multiplied imbalance identically 0
    val base = Tables.embeddings(spark, sf).limit(100)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    val mirrored = base.unionByName(
      base.select((col("vec_id") + 1).as("vec_id"), col("embedding")))
    val drift = Similarity.signDriftCensus(mirrored, 6)
    assert(drift.filter(col("imbalance") =!= 0L).count() == 0)
    assert(drift.filter(col("n_v1") =!= col("n_v2")).count() == 0)
  }

  test("contamination census: an eval-subset doc grades at decile 10") {
    // doc 97 IS eval (97 % 97 == 0); doc 1 repeats doc 97's text → every
    // shingle hits; doc 2 shares nothing → decile 0
    val d = docs(
      97L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six")
    val cc = Curation.contaminationGraded(d, 3, 97)
      .select(col("doc_id"), col("overlap_decile")).as[(Long, Long)]
      .collect().toMap
    assert(cc(1L) == 10L && cc(2L) == 0L)
    assert(!cc.contains(97L), "eval docs are not graded")
  }
}

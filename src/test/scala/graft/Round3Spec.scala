package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TrainPrep}

/** Round-3 operators: big/small-star connected components, salted skew
  * join, chi-square cells, int8 quantization, sequence assembly. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("ccBigStar equals label propagation on the Jaccard pair graph") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).cache()
    val a = Dedup.ccBigStar(docs, pairs)
    val b = Dedup.nearDupClusters(docs, pairs)
    assert(a.count() == docs.count())
    assert(a.join(b.withColumnRenamed("cluster_id", "c2"), "doc_id")
      .filter($"cluster_id" =!= $"c2").count() == 0)
  }

  test("ccBigStar collapses a 200-node chain to its min (the O(log n) path)") {
    // diameter 199 — label propagation would need ~200 rounds; star
    // contraction converges in O(log n)
    val n = 200
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("d1", "d2")
    val docs = (0L until n.toLong).toDF("doc_id")
    val out = Dedup.ccBigStar(docs, pairs, maxIters = 15).collect()
    assert(out.length == n && out.forall(_.getLong(1) == 0L))
  }

  test("ccBigStar handles singletons and multiple components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val out = Dedup.ccBigStar(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("saltedJoin equals the plain inner join") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_partkey")
    val supp = Tables.supplier(spark, sf).select($"s_suppkey", $"s_nationkey")
    val salted = graft.ops.Skew.saltedJoin(li, supp,
      "l_suppkey", "s_suppkey", "l_orderkey", 8)
    val plain = li.join(supp, $"l_suppkey" === $"s_suppkey")
    assert(salted.count() == plain.count() && plain.count() > 0)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("chi-square cells: exactly zero under independence; marginals add up") {
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val cells = TrainPrep.chiSquareCells(indep, "x", "y").collect()
    assert(cells.length == 4 &&
      cells.forall(_.getAs[Double]("chi2_cell") == 0.0))
    val docs = Tables.documents(spark, sf)
    val real = TrainPrep.chiSquareCells(docs, "lang", "source")
    assert(real.agg(sum($"o")).collect()(0).getLong(0) == docs.count())
    assert(real.filter($"chi2_cell" < 0.0).count() == 0)
  }

  test("int8 quantization: q in [-127,127], and max|q| = 127 when scale > 0") {
    val q = Similarity.quantizeInt8Summary(Tables.embeddings(spark, sf))
    assert(q.count() > 0)
    assert(q.filter($"q_min" < -127 || $"q_max" > 127).count() == 0)
    assert(q.filter($"scale" > 0.0)
      .filter(greatest(abs($"q_min"), abs($"q_max")) =!= 127).count() == 0)
  }

  test("event sequences concatenate in (ts, event_id) order") {
    val ev = Seq((1L, 10L, 100L, "a"), (1L, 11L, 50L, "b"),
      (1L, 9L, 100L, "c"), (2L, 12L, 70L, "d"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val out = TrainPrep.eventSequences(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("seq")).toMap
    // ties on ts_us break by event_id: (50,11)b, (100,9)c, (100,10)a
    assert(out == Map(1L -> "b>c>a", 2L -> "d"))
  }
}

package graft

import graft.ext.TrainPrep
import org.apache.spark.sql.functions._

/** TrainPrep operator semantics (ext/TrainPrep.scala): split stability,
  * stratification bounds, group-limit, bin monotonicity, correlation range,
  * idf monotonicity, packing budget, weight balance. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is a pure function of the key and covers 3 splits") {
    val c = Tables.customer(spark, sf)
    val s1 = TrainPrep.hashSplit(c, "c_custkey").select($"c_custkey", $"split")
    val s2 = TrainPrep.hashSplit(c, "c_custkey").select($"c_custkey", $"split")
    assert(s1.except(s2).count() == 0) // deterministic across evaluations
    val bySplit = s1.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // ~80/10/10: train must dominate
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("same key never lands in two splits (leakage-free)") {
    val dup = Tables.customer(spark, sf).unionByName(Tables.customer(spark, sf))
    val n = TrainPrep.hashSplit(dup, "c_custkey")
      .groupBy($"c_custkey").agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(n == 0)
  }

  test("stratifiedSample takes at most n per stratum, deterministically") {
    val c = Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
    val s = TrainPrep.stratifiedSample(c, "c_mktsegment", "c_custkey", 10)
    val per = s.groupBy($"c_mktsegment").count().as[(String, Long)].collect()
    assert(per.forall(_._2 <= 10))
    val again = TrainPrep.stratifiedSample(c, "c_mktsegment", "c_custkey", 10)
    assert(s.except(again).count() == 0)
  }

  test("topKPerGroup returns the k largest with deterministic ties") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 3.0), (2L, 20L, 1.0))
      .toDF("g", "id", "v")
    val top = TrainPrep.topKPerGroup(df, "g", "v", "id", 2)
      .select($"g", $"id").as[(Long, Long)].collect().toSet
    assert(top == Set((1L, 10L), (1L, 11L), (2L, 20L))) // tie broken by id asc
  }

  test("quantileBins: bins are contiguous, ordered, and partition the rows") {
    val bins = TrainPrep.quantileBins(Tables.orders(spark, sf), 10)
      .orderBy($"bin").collect()
    assert(bins.length == 10)
    val total = bins.map(_.getAs[Long]("n")).sum
    assert(total == Tables.orders(spark, sf).count())
    // non-decreasing value ranges across bins
    val pairs = bins.map(r => (r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents")))
    pairs.sliding(2).foreach { case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2) }
  }

  test("corrMatrix values are in [-1, 1]; perfect correlation hits 1") {
    val r = TrainPrep.corrMatrix(Tables.lineitem(spark, sf)).collect()(0)
    val cs = Seq("corr_qty_price", "corr_qty_disc", "corr_price_disc")
      .map(r.getAs[Double])
    assert(cs.forall(c => c >= -1.0 && c <= 1.0))
    // sanity on a constructed frame: price = 2*qty => corr exactly 1
    val lin = Seq((1L, 2.0, 0.0), (2L, 4.0, 0.1), (3L, 6.0, 0.2))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val c1 = TrainPrep.corrMatrix(lin).collect()(0).getAs[Double]("corr_qty_price")
    assert(math.abs(c1 - 1.0) < 1e-12)
  }

  test("tfidf: rarer terms score higher at equal tf") {
    val docs = Seq((1L, "alpha common"), (2L, "beta common"), (3L, "gamma common"))
      .toDF("doc_id", "text")
    val out = TrainPrep.tfidf(docs).collect()
    val byTerm = out.map(r => r.getAs[String]("w") -> r.getAs[Double]("score")).toMap
    assert(byTerm("alpha") > byTerm("common")) // df 1 vs 3
  }

  test("packSequences: bin boundaries respect the running budget") {
    val out = TrainPrep.packSequences(Tables.documents(spark, sf), 2048L, 8)
      .orderBy($"shard", $"doc_id").collect()
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rws) =>
      var cum = 0L
      rws.foreach { r =>
        val bin = r.getAs[Long]("bin")
        assert(bin == cum / 2048L) // bin = exclusive prefix sum div budget
        cum += r.getAs[Long]("n_subword_tokens")
      }
    }
  }

  test("normalizeText strips punctuation and collapses whitespace") {
    val out = TrainPrep.normalizeText(
      Seq((1L, "Hello,  World! 42")).toDF("doc_id", "text")).collect()(0)
    assert(out.getAs[String]("norm_text") == "hello world 42")
    assert(out.getAs[Boolean]("is_ascii"))
    assert(out.getAs[Long]("norm_len") == 14L)
  }

  test("classWeights: weighted class mass is equal across classes") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("cls")
    // n_c * weight(c) = N / K for every class
    val masses = TrainPrep.classWeights(df, "cls").collect()
      .map(r => r.getAs[Long]("n") * r.getAs[Double]("weight"))
    assert(masses.forall(m => math.abs(m - 20.0) < 1e-9))
  }
}

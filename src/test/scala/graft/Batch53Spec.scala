package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 3 pins: retrieval-eval consistency with the q168 recall
  * gate, SRM chi-square direct check, co-visitation brute-force replay,
  * PMI recomputation from collected counts. */
class Batch53Spec extends SparkSpec {

  test("q305: ndcg within [0,1]; positive iff the recall gate counts hits") {
    graft.functions.GraftFunctions.register(spark)
    val out = SparkEntry.queries("q305_retrieval_eval")(spark, sf).collect()
    assert(out.length === 20)
    val emb = Tables.embeddings(spark, sf)
    val hits = graft.ext.Eval.annRecall(
      graft.ext.Similarity.ivfTopK(emb, 20, 5, 100, 2),
      graft.ext.Similarity.bruteForceTopK(emb, 20, 5), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val q = r.getLong(0)
      val ndcg = r.getDouble(r.fieldIndex("ndcg"))
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert((ndcg > 0.0) === (hits(q) > 0L), s"q=$q")
      // perfect ranking ⇔ all 5 kept in order ⇒ rr = 1e6
      if (ndcg == 1.0)
        assert(r.getLong(r.fieldIndex("rr_q")) === 1000000L)
    }
  }

  test("q306: chi2 matches the direct formula; arms partition each segment") {
    val sizes = Tables.customer(spark, sf).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q306_srm_check")(spark, sf).collect()
    assert(out.length === sizes.size)
    out.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      assert(na + nb === sizes(r.getString(0)))
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      assert(r.getDouble(r.fieldIndex("chi2")) === chi2)
      assert(r.getBoolean(r.fieldIndex("srm_flag")) === (chi2 > 3.841))
    }
  }

  test("q307: brute-force replay of the directed transition counts") {
    val ev = Tables.events(spark, sf)
      .filter(col("props").isNotNull)
      .select(col("user_id"), col("props"), col("ts_us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._3, r._4)).sliding(2).collect {
        case Array(a, b)
          if b._2 != a._2 && b._3 - a._3 <= 1800000000L => (a._2, b._2)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    val got = SparkEntry.queries("q307_covisitation")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("q308: PMI recomputed from collected document frequencies") {
    val out = SparkEntry.queries("q308_word_pmi")(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSet)
    val n = docs.length.toLong
    val cw = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val (w1, w2, cab) = (r.getString(0), r.getString(1), r.getLong(2))
      val direct = docs.count { case (_, ws) => ws(w1) && ws(w2) }.toLong
      assert(direct === cab, s"($w1,$w2)")
      assert(cab <= math.min(cw(w1), cw(w2)))
      val pmi = math.floor(math.log(cab.toDouble * n /
        (cw(w1).toDouble * cw(w2))) * 1e4).toLong
      assert(r.getLong(r.fieldIndex("pmi_q")) === pmi)
    }
  }
}

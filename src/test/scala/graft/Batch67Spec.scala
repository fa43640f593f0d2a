package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 11 pins: coverage-curve monotonicity, truncation-loss
  * accounting, length-bias sign on this corpus, LSH occupancy
  * conservation, water-filling budget feasibility and level optimality,
  * MinHash error bounds. */
class Batch67Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q381: coverage rises with k and hits 100% at full vocab") {
    val out = q("q381_vocab_coverage").collect().sortBy(_.getAs[Long]("k"))
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cov_ppm") <= b.getAs[Long]("cov_ppm"))
      case _ =>
    }
    val last = out.last
    // the fixture vocabulary is ~40 tokens, so k=40 covers everything
    if (last.getAs[Long]("vocab_used") === last.getAs[Long]("vocab_n"))
      assert(last.getAs[Long]("cov_ppm") === 1000000L)
    out.foreach(r => assert(r.getAs[Long]("vocab_used") <=
      math.min(r.getAs[Long]("k"), r.getAs[Long]("vocab_n"))))
  }

  test("q382: kept tokens never exceed totals and the ppm fields are " +
    "consistent") {
    q("q382_truncation_loss").collect().foreach { r =>
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("docs_fit") <= r.getAs[Long]("docs"))
      assert(r.getAs[Long]("loss_ppm") ===
        (r.getAs[Long]("tokens") - r.getAs[Long]("tokens_kept")) *
          1000000L / r.getAs[Long]("tokens"))
      // docs that fit contribute zero loss: kept >= tokens of fit docs
      assert(r.getAs[Long]("tokens_kept") >= r.getAs[Long]("docs_fit"))
    }
  }

  test("q383: the Gopher gates on this corpus fail SHORT docs, so the " +
    "pass flag correlates positively with length") {
    val r = q("q383_length_bias").head()
    assert(r.getAs[Long]("n_pass") > 0L)
    assert(r.getAs[Long]("n_pass") < r.getAs[Long]("n"))
    val rpb = r.getAs[Long]("rpb_q")
    assert(math.abs(rpb) <= 1000000000L)
    // the length rule (>= 30 words) is the binding constraint here
    assert(rpb > 0L, s"expected positive length bias, got $rpb")
  }

  test("q384: every band sees every doc; pair counts match bucket sizes") {
    val out = q("q384_lsh_occupancy").collect()
    assert(out.length === 4)
    val nDocs = Tables.documents(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === nDocs, s"$r")
      assert(r.getAs[Long]("singletons") <= r.getAs[Long]("n_buckets"))
      assert(r.getAs[Long]("max_bucket") >= 1L)
      // cand_pairs = 0 iff all buckets are singletons
      if (r.getAs[Long]("singletons") === r.getAs[Long]("n_buckets"))
        assert(r.getAs[Long]("cand_pairs") === 0L)
    }
  }

  test("q385: allocations are feasible (within budget), optimal (no slack " +
    "while a source is capped), and capped exactly when above level") {
    val out = q("q385_token_waterfill").collect()
    val budget = out.head.getAs[Long]("budget")
    val level = out.head.getAs[Long]("level")
    val alloc = out.map(_.getAs[Long]("alloc")).sum
    assert(alloc <= budget, s"alloc=$alloc budget=$budget")
    // if anything is capped, the leftover is at most n_capped (floor loss)
    val nCapped = out.count(_.getAs[Boolean]("capped"))
    if (nCapped > 0)
      assert(budget - alloc <= nCapped.toLong, s"slack=${budget - alloc}")
    out.foreach { r =>
      assert(r.getAs[Long]("alloc") ===
        math.min(r.getAs[Long]("tokens"), level))
      assert(r.getAs[Boolean]("capped") ===
        (r.getAs[Long]("tokens") > level))
    }
  }

  test("q386: per-pair absolute error is bounded by the 16-hash grid, " +
    "so the sums respect n_pairs x 1e6") {
    val r = q("q386_minhash_error").head()
    val n = r.getAs[Long]("n_pairs")
    assert(n > 0L)
    assert(r.getAs[Long]("abs_err_sum") >= 0L)
    assert(r.getAs[Long]("abs_err_sum") <= n * 1000000L)
    assert(math.abs(r.getAs[Long]("signed_err_sum")) <=
      r.getAs[Long]("abs_err_sum"))
  }
}

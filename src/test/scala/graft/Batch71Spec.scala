package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 4 pins: advisor threshold arithmetic, Bloom layout
  * lower bounds, fairness ratio algebra, Simpson reversal definition,
  * leakage-scan Cramér bound, row-group planner conservation. */
class Batch71Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q405: strategies agree with the literal thresholds and small dims " +
    "broadcast") {
    val out = q("q405_join_advisor").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val want =
        if (r.getAs[Long]("build_bytes") <= 10485760L) "broadcast"
        else if (r.getAs[Long]("max_key_rows") * 100 >=
          r.getAs[Long]("probe_rows")) "shuffle_salted"
        else "shuffle_hash"
      assert(r.getAs[String]("strategy") === want)
    }
    // at test SF every dim fits comfortably under 10 MiB
    assert(out.forall(_.getAs[String]("strategy") == "broadcast"))
  }

  test("q406: the planned filter respects the information-theoretic " +
    "floor (> 1.44 n bits for 1% fpp) and bytes round up from bits") {
    q("q406_bloom_planner").collect().foreach { r =>
      val n = r.getAs[Long]("n_keys")
      val m = r.getAs[Long]("m_bits")
      assert(m > n * 9L && m < n * 10L, s"m=$m n=$n")
      assert(r.getAs[Long]("k_hashes") === 7L)
      assert(r.getAs[Long]("filter_bytes") === (m + 7) / 8)
    }
  }

  test("q407: rates are exact count ratios, the DI ratio uses the true " +
    "min/max, and the gap is consistent") {
    val out = q("q407_fairness_census").collect()
    assert(out.nonEmpty)
    val rates = out.map(_.getAs[Long]("rate_ppm"))
    out.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") ===
        r.getAs[Long]("n_pos") * 1000000L / r.getAs[Long]("n"))
      assert(r.getAs[Long]("parity_gap_ppm") === rates.max - rates.min)
      if (rates.max > 0)
        assert(r.getAs[Long]("di_ratio_ppm") ===
          rates.min * 1000000L / rates.max)
    }
  }

  test("q408: reversal flags require nonzero opposing signs") {
    val out = q("q408_simpson_reversal").collect()
    assert(out.length === 5)
    // signs are BIGINT on both engines since the r8 dtype-parity fix
    // (Spark sign() is DOUBLE; the driver's hash is representation-
    // sensitive, so the query casts)
    val pooledSigns = out.map(_.getAs[Long]("pooled_sign")).distinct
    assert(pooledSigns.length === 1)
    out.foreach { r =>
      val s = r.getAs[Long]("stratum_sign")
      val p = r.getAs[Long]("pooled_sign")
      assert(r.getAs[Boolean]("reversed") === (s != 0L && p != 0L && s != p))
      assert(math.signum(r.getAs[Long]("ad_minus_bc").toDouble).toLong === s)
    }
  }

  test("q409: Cramér's V stays within [0,1] micro for every scanned " +
    "feature and the level counts match the dimension cardinalities") {
    val out = q("q409_leakage_scan").collect()
    assert(out.map(_.getAs[String]("feature")).sorted ===
      Array("mktsegment", "nation", "region"))
    out.foreach { r =>
      val v = r.getAs[Long]("cramers_v_micro")
      assert(v >= 0L && v <= 1000000L, s"V=$v")
      assert(r.getAs[Long]("n_levels") >= 2L)
      assert(r.getAs[Long]("chi2_pico") >= -r.getAs[Long]("n_levels"),
        "chi2 is a sum of floored non-negative terms")
    }
  }

  test("q410: row groups cover all rows with no more than one partial " +
    "group of slack") {
    q("q410_rowgroup_planner").collect().foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val rpg = r.getAs[Long]("rows_per_group")
      val g = r.getAs[Long]("n_groups")
      assert(rpg > 0L)
      assert(g === (n + rpg - 1) / rpg)
      assert(g * rpg >= n && (g - 1) * rpg < n)
      assert(r.getAs[Long]("avg_row_bytes") > 0L)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 4 pins: equi-depth bucket invariants, inferred-member
  * completeness, conformal coverage guarantee, skew census cross-check. */
class Batch54Spec extends SparkSpec {

  test("q309: buckets tile the value domain with near-equal depth") {
    val out = SparkEntry.queries("q309_equi_depth_hist")(spark, sf)
      .orderBy(col("bucket")).collect()
    assert(out.length === 8)
    val n = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getLong(3)).sum === n)
    // contiguous, non-overlapping, ordered ranges
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
    // equi-depth: every bucket within ±NDV-granularity of n/8; with mostly
    // unique cents values the deviation is tiny — allow 25% slack
    out.foreach { r =>
      val rows = r.getLong(3)
      assert(math.abs(rows - n / 8.0) < n / 8.0 * 0.25,
        s"bucket ${r.getLong(0)} rows $rows vs ${n / 8}")
      assert(r.getLong(4) <= rows) // ndv <= rows
    }
  }

  test("q310: every fact joins after augmentation; statuses consistent") {
    val out = SparkEntry.queries("q310_inferred_members")(spark, sf)
    val dimKeys = out.select("c_custkey").distinct().count()
    assert(dimKeys === out.count(), "augmented dim must be key-unique")
    val missing = Tables.orders(spark, sf)
      .join(out, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(missing === 0L, "no fact may dangle after augmentation")
    val inferred = out.filter(col("member_status") === "inferred")
    assert(inferred.filter(col("c_mktsegment") =!= "UNKNOWN").count() === 0L)
    assert(inferred.filter(col("n_pending_facts") <= 0L).count() === 0L)
    // only keys hidden by the %97 simulation may be inferred
    assert(inferred.filter(pmod(col("c_custkey"), lit(97L)) =!= 0L)
      .count() === 0L)
  }

  test("q311: finite-sample conformal coverage holds on the calibration set") {
    // sf0.001 has 1-2 calibration days per nation — statistically mute; the
    // coverage guarantee is only observable at sf0.01's dense daily series
    val out = SparkEntry.queries("q311_conformal_naive")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nTest = r.getLong(r.fieldIndex("n_test"))
      val nCov = r.getLong(r.fieldIndex("n_covered"))
      assert(nCov <= nTest)
      assert(r.getLong(r.fieldIndex("q_hat")) >= 0L)
      // per-nation floor only where the calibration set is big enough to
      // mean anything (at sf0.001 some nations have 1-2 calibration days)
      if (r.getLong(r.fieldIndex("n_cal")) >= 30L)
        assert(nCov.toDouble / nTest > 0.5,
          s"nation ${r.getLong(0)} coverage ${nCov.toDouble / nTest}")
    }
    // pooled coverage must not collapse (exchangeability holds per nation
    // in expectation; the pooled rate is the stable observable)
    val totTest = out.map(_.getLong(out.head.fieldIndex("n_test"))).sum
    val totCov = out.map(_.getLong(out.head.fieldIndex("n_covered"))).sum
    assert(totCov.toDouble / totTest > 0.5,
      s"pooled coverage ${totCov.toDouble / totTest}")
  }

  test("q312: census matches direct groupBy counts per edge") {
    val out = SparkEntry.queries("q312_skew_census")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 3)
    def direct(df: org.apache.spark.sql.DataFrame, key: String) = {
      val c = df.groupBy(col(key)).count().collect().map(_.getLong(1))
      (c.sum, c.length.toLong, c.max)
    }
    val cases = Seq(
      "lineitem.l_suppkey" -> direct(Tables.lineitem(spark, sf), "l_suppkey"),
      "lineitem.l_partkey" -> direct(Tables.lineitem(spark, sf), "l_partkey"),
      "orders.o_custkey" -> direct(Tables.orders(spark, sf), "o_custkey"))
    cases.foreach { case (edge, (total, ndv, mx)) =>
      val r = out(edge)
      assert(r.getLong(r.fieldIndex("n_rows")) === total)
      assert(r.getLong(r.fieldIndex("ndv")) === ndv)
      assert(r.getLong(r.fieldIndex("max_key_rows")) === mx)
      assert(r.getLong(r.fieldIndex("p99_key_rows")) <= mx)
      assert(r.getLong(r.fieldIndex("skew_num")) === mx * ndv)
    }
  }
}

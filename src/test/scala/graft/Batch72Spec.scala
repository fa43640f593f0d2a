package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 5 pins: Holt unroll against an independent imperative
  * Scala model, gap-sweep monotonicity, split-gain non-negativity and
  * partition conservation, Erlang-C probability bounds and load
  * monotonicity. */
class Batch72Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q411: the unrolled Holt chain equals an imperative Scala fold " +
    "over the same monthly series") {
    val months = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val series = (0 until 24).map { i =>
      months.getOrElse((1996 + i / 12, i % 12 + 1), 0L).toDouble
    }
    var l = series(0)
    var b = series(1) - series(0)
    for (t <- 2 until 24) {
      val lNew = 0.3 * series(t) + (1.0 - 0.3) * (l + b)
      val bNew = 0.1 * (lNew - l) + (1.0 - 0.1) * b
      l = lNew; b = bNew
    }
    val r = q("q411_holt_unroll").head()
    assert(r.getAs[Long]("level_cents") === math.floor(l).toLong)
    assert(r.getAs[Long]("trend_cents") === math.floor(b).toLong)
    assert(r.getAs[Long]("fc2_cents") === math.floor(l + 2.0 * b).toLong)
  }

  test("q412: session counts fall monotonically as the gap threshold " +
    "grows, bounded below by the user count") {
    val out = q("q412_gap_sweep").collect().sortBy(_.getAs[Long]("theta_s"))
    assert(out.length === 4)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_sessions") >= b.getAs[Long]("n_sessions"))
      case _ =>
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("events_per_session_milli") >= 1000L)
    }
  }

  test("q413: best split gains are non-negative and the two sides " +
    "partition the rows") {
    val out = q("q413_split_gain").collect()
    assert(out.map(_.getAs[String]("feature")).sorted ===
      Array("discount_cents", "quantity"))
    val n = Tables.lineitem(spark, sf).count()
    out.foreach { r =>
      // gain = (sl·nr − sr·nl)²/(nl·nr·n) is a square over a positive
      // denominator — exactly non-negative, no floor shaving
      assert(r.getAs[Long]("gain_micro") >= 0L)
      assert(r.getAs[Long]("nl") + r.getAs[Long]("nr") === n)
      assert(r.getAs[Long]("nl") > 0L && r.getAs[Long]("nr") > 0L)
    }
  }

  test("q414: wait probabilities are valid ppm and increase with " +
    "offered load among unsaturated queues") {
    val out = q("q414_erlang_c").collect()
    assert(out.length === 5)
    out.foreach { r =>
      val p = r.getAs[Long]("p_wait_ppm")
      assert(p >= 0L && p <= 1000000L)
      assert(r.getAs[Long]("a_micro") >= 0L)
    }
    val unsat = out.filter(_.getAs[Long]("p_wait_ppm") < 1000000L)
      .sortBy(_.getAs[Long]("a_micro"))
    unsat.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("p_wait_ppm") <= b.getAs[Long]("p_wait_ppm"))
      case _ =>
    }
  }
}

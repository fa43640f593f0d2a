package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 3 pins: backtest bounds (sMAPE ≤ 1), allocation shares
  * summing under the floor budget, EMD range, DiD hand-check, PR curve
  * monotonicity, and the two defining Hilbert properties — bijectivity and
  * unit-step adjacency — proven over the ENTIRE 256×256 grid. */
class Batch59Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q333: 12-month holdback leaves n_evals = months - 12 and sMAPE " +
    "is a proper fraction") {
    // expected evaluation window per series: months whose m-12 ancestor
    // exists for the SAME series (tiny SFs have month gaps, so this is
    // computed, not months-12; it would still catch a lag off-by-one)
    val monthSets = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .distinct().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    q("q333_backtest_mae").collect().foreach { r =>
      val pr = r.getAs[String]("o_orderpriority")
      val ms = monthSets(pr)
      assert(r.getAs[Long]("n_evals") ===
        ms.count(m => ms.contains(m - 12)).toLong, s"$r")
      assert(r.getAs[Long]("mae_c") >= 0L)
      // |a-f| <= a+f for nonnegative series, so per-term sMAPE <= 10000bp
      assert(r.getAs[Long]("smape_bp") >= 0L &&
        r.getAs[Long]("smape_bp") <= 10000L, s"$r")
    }
  }

  test("q334: Neyman shares are a sub-unit partition and the allocation " +
    "respects the budget") {
    val out = q("q334_neyman_alloc").collect()
    assert(out.nonEmpty)
    val shareSum = out.map(_.getAs[Long]("share_ppm")).sum
    val allocSum = out.map(_.getAs[Long]("n_alloc_10k")).sum
    // floor division: sum in (1e6 - strata, 1e6]
    assert(shareSum <= 1000000L && shareSum > 1000000L - out.length)
    assert(allocSum <= 10000L && allocSum > 10000L - out.length)
    out.foreach { r =>
      assert(r.getAs[Long]("wq") >= 0L)
      assert(r.getAs[Long]("share_ppm") >= 0L)
    }
  }

  test("q335: EMD bounded by the ppm scale and the t=0.2 flag is " +
    "consistent") {
    val out = q("q335_tcloseness").collect()
    assert(out.length > 1)
    out.foreach { r =>
      val emd = r.getAs[Long]("emd_ppm")
      assert(emd >= 0L && emd <= 1000000L, s"$r")
      assert(r.getAs[Boolean]("t02_ok") === (emd <= 200000L), s"$r")
    }
  }

  test("q336: DiD nets out the pre-period gap (hand check) and cells " +
    "partition all purchases") {
    val r = q("q336_did_estimator").head()
    val nTotal = Seq("t1", "t0", "c1", "c0")
      .map(c => r.getAs[Long](s"n_$c")).sum
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(nTotal === nPurch)
    // recompute the contrast from the reported cells
    def m(c: String) =
      r.getAs[Long](s"s_$c").toDouble / r.getAs[Long](s"n_$c").toDouble
    val did = (m("t1") - m("t0")) - (m("c1") - m("c0"))
    assert(math.floor(did * 1000).toLong === r.getAs[Long]("did_millicents"))
  }

  test("q337: recall decreases with threshold, precision/recall are " +
    "proper ppm fractions, tp+fn = P at every point") {
    val out = q("q337_pr_points").collect()
      .sortBy(_.getAs[Long]("threshold"))
    assert(out.nonEmpty)
    val p = out.head.getAs[Long]("tp") + out.head.getAs[Long]("fn")
    out.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === p, s"$r")
      assert(r.getAs[Long]("prec_ppm") <= 1000000L, s"$r")
      assert(r.getAs[Long]("rec_ppm") <= 1000000L, s"$r")
    }
    out.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("rec_ppm") >= hi.getAs[Long]("rec_ppm"),
          "recall must fall as the threshold rises")
      case _ =>
    }
  }

  test("q338: the Hilbert walk is a bijection on the full 256x256 grid " +
    "and consecutive addresses are always grid-adjacent") {
    // re-implement the reference walk in Scala and compare against the
    // ENGINE result for every fixture row (engine vs independent model)
    def xy2d(xIn: Long, yIn: Long): Long = {
      var (x, y, d) = (xIn, yIn, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val out = q("q338_hilbert_key").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("hilbert_key") ===
        xy2d(r.getAs[Long]("x"), r.getAs[Long]("y")), s"$r")
    }
    // bijectivity + adjacency of the model over the whole grid (and by
    // the equality above, of the engine's unroll)
    val all = (0L until 65536L).map(i => (i % 256, i / 256))
      .map { case (x, y) => xy2d(x, y) -> ((x, y)) }
    assert(all.map(_._1).distinct.size === 65536)
    val byD = all.sortBy(_._1)
    assert(byD.head._1 === 0L && byD.last._1 === 65535L)
    byD.sliding(2).foreach {
      case Seq((_, (x1, y1)), (_, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
          s"non-adjacent step ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
  }
}

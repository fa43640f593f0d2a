package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 6 pins: OBF boundary monotonicity and cumulative-cell
  * growth, IPS/SNIPS weight accounting, intermittency quadrant cutoff
  * consistency. */
class Batch73Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q415: cells grow cumulatively across looks and boundaries " +
    "decrease (O'Brien-Fleming shape)") {
    val out = q("q415_obrien_fleming").collect().sortBy(_.getAs[Int]("look"))
    assert(out.length === 4)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n1") <= b.getAs[Long]("n1"))
        assert(a.getAs[Long]("n2") <= b.getAs[Long]("n2"))
        assert(a.getAs[Long]("x1") <= b.getAs[Long]("x1"))
        assert(a.getAs[Long]("boundary_micro") >
          b.getAs[Long]("boundary_micro"))
      case _ =>
    }
    out.foreach { r =>
      assert(r.getAs[Long]("x1") <= r.getAs[Long]("n1"))
      assert(r.getAs[Long]("x2") <= r.getAs[Long]("n2"))
      if (r.get(r.fieldIndex("z_micro")) != null)
        assert(r.getAs[Boolean]("crossed") ===
          (math.abs(r.getAs[Long]("z_micro")) >=
            r.getAs[Long]("boundary_micro")))
    }
  }

  test("q416: the IPS estimate only counts matched actions and SNIPS is " +
    "a weighted mean inside the reward range") {
    val r = q("q416_ips_policy_value").head()
    assert(r.getAs[Long]("matched") > 0L)
    assert(r.getAs[Long]("matched") <= r.getAs[Long]("n"))
    val snips = r.getAs[Long]("snips_cents")
    // SNIPS is a convex combination of matched rewards → within range
    val maxReward = Tables.orders(spark, sf)
      .agg(max(round(col("o_totalprice") * 100).cast("long")))
      .head().getLong(0)
    assert(snips >= 0L && snips <= maxReward)
    assert(r.getAs[Long]("ips_cents_per_order") >= 0L)
  }

  test("q417: quadrant labels agree with the published cutoffs and the " +
    "non-zero week count never exceeds the calendar span") {
    val out = q("q417_intermittency_class").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("nz") <= r.getAs[Long]("cal_weeks"))
      val adi = r.getAs[Long]("adi_milli")
      val cv2 = r.getAs[Long]("cv2_milli")
      assert(adi >= 1000L, "ADI is at least 1 by construction")
      val want =
        if (adi < 1320 && cv2 < 490) "smooth"
        else if (adi >= 1320 && cv2 < 490) "intermittent"
        else if (adi < 1320) "erratic"
        else "lumpy"
      assert(r.getAs[String]("demand_class") === want)
    }
  }

  test("q418: selection flag is exactly the integer threshold rule and " +
    "n_bigrams reconciles with an independent token count") {
    val rows = q("q418_moore_lewis").collect()
    assert(rows.nonEmpty)
    // the flag must be a pure function of (score_q, n_bigrams) — the
    // integer rational avg < -0.1 nat rule, no hidden double compare.
    // (No direction-of-signal assertion on lang: the synthetic fixture's
    // lang label does not partition the generated vocabulary the way real
    // language data would, so en-vs-other score ordering is a property of
    // the generator, not of the operator.)
    rows.foreach { r =>
      val want = r.getAs[Long]("score_q") < -1000L * r.getAs[Long]("n_bigrams")
      assert(r.getAs[Boolean]("selected") === want, r.toString)
    }
    // structural reconciliation: a test doc with T whitespace tokens owns
    // exactly T-1 scored bigrams — the explode/NULL-tail bookkeeping
    val expected = graft.ext.TrainPrep.hashSplit(Tables.documents(spark, sf),
        "doc_id")
      .filter(col("split") === "test")
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 1).cast("long").as("want"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === expected.count(_._2 > 0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") === expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the score is a real signal, not a constant artifact of smoothing
    assert(rows.map(_.getAs[Long]("score_q")).distinct.length > 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Round-8 batch 5 pins: CharGrams generator semantics vs the array
  * formulation, E-S sample invariants + weight monotonicity, encoding
  * planner cross-check, watermark sizing monotonicity. */
class Batch55Spec extends SparkSpec {

  import spark.implicits._

  test("char_grams equals substring enumeration; explode (not outer) semantics") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "abcde"), (2L, "abc"), (3L, "ab"), (4L, null))
      .toDF("id", "t")
    val out = df.select(col("id"), expr("char_grams(t, 3)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSet === Set(
      (1L, "abc", 0), (1L, "bcd", 1), (1L, "cde", 2), (2L, "abc", 0)))
    // parity with the array formulation on the real corpus
    val viaGen = Tables.documents(spark, sf)
      .select(expr("char_grams(text, 4)")).groupBy("gram").count()
    val viaArr = Tables.documents(spark, sf)
      .select(explode(expr(
        "transform(sequence(0, length(text) - 4), i -> substring(text, i + 1, 4))"))
        .as("gram"))
      .groupBy("gram").count()
    assert(viaGen.exceptAll(viaArr).count() === 0L)
    assert(viaArr.exceptAll(viaGen).count() === 0L)
  }

  test("char_grams runs in GenerateExec (the explode execution path)") {
    GraftFunctions.register(spark)
    val plan = Tables.documents(spark, sf)
      .select(expr("char_grams(text, 4)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate char_grams"), plan.take(500))
  }

  test("q314: exactly 20 per source; higher weight wins at equal uniform") {
    val out = SparkEntry.queries("q314_weighted_reservoir")(spark, sf)
      .collect()
    val bySource = out.groupBy(_.getString(0))
    val total = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      assert(rows.length === math.min(20L, total(src)).toInt, src)
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length))
    }
    // E-S key property: ln(u)/w is increasing in w for fixed u<1 (ln u <0)
    val k1 = -1000000.0 / 50
    val k2 = -1000000.0 / 500
    assert(k2 > k1)
  }

  test("q315: planner matches direct distinct counts; verdicts sane") {
    val out = SparkEntry.queries("q315_encoding_planner")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, sf)
    val ndvPart = li.select("l_partkey").distinct().count()
    val r = out("l_partkey")
    assert(r.getLong(r.fieldIndex("ndv")) === ndvPart)
    // code_bits = ceil(log2 ndv) for ndv not a power of two
    assert(r.getLong(r.fieldIndex("code_bits")) ===
      64 - java.lang.Long.numberOfLeadingZeros(ndvPart - 1))
    // 1-char flags: dictionary always wins at fixture scale
    assert(out("l_returnflag").getBoolean(
      out("l_returnflag").fieldIndex("choose_dict")))
    // verdict equals an independent recomputation of the size model
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(ndvPart - 1)
    val n = r.getLong(r.fieldIndex("n_rows"))
    val dictBytes = ndvPart * 8L + (n * bits + 7L) / 8L
    assert(r.getLong(r.fieldIndex("dict_bytes")) === dictBytes)
    assert(r.getBoolean(r.fieldIndex("choose_dict")) === (dictBytes < n * 8L))
  }

  test("q316: drops are monotone non-increasing in the delay; q292 consistency") {
    val out = SparkEntry.queries("q316_watermark_sizing")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.length === 5)
    val n = Tables.events(spark, sf).count()
    out.foreach { case (_, nEvents, nDropped) =>
      assert(nEvents === n)
      assert(nDropped >= 0 && nDropped <= n)
    }
    out.sliding(2).foreach {
      case Array(a, b) => assert(b._3 <= a._3, s"$a -> $b")
      case _ =>
    }
    // total lateness>0 count from q292 bounds every candidate's drops
    val anyLate = SparkEntry.queries("q292_lateness_census")(spark, sf)
      .agg(sum("n_late")).head().getLong(0)
    assert(out.head._3 <= anyLate)
  }
}

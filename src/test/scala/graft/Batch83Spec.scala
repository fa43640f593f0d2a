package graft

/** Round-12 continuation batch 11 pins: clustering coefficient (q462),
  * k-truss peeling (q463), dedup survivorship (q464). */
class Batch83Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q462

  test("q462: clustering coefficient — ppm in [0, 1e6], zero for " +
    "degree-1 nodes, triangle incidences sum to 3× the triangle count") {
    val out = q("q462_clustering_coeff").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cc = r.getAs[Long]("cc_ppm")
      assert(cc >= 0L && cc <= 1000000L)
      if (r.getAs[Long]("deg") < 2L) assert(cc === 0L)
      // tri through v ≤ C(deg, 2)
      val deg = r.getAs[Long]("deg")
      assert(r.getAs[Long]("tri") <= deg * (deg - 1) / 2)
    }
    assert(out.map(_.getAs[Long]("tri")).sum % 3 === 0L,
      "each triangle is incident to exactly 3 nodes")
  }

  test("q462: coefficient arithmetic on a hand neighborhood — a node " +
    "whose 3 neighbors form 2 of 3 possible edges scores 2/3") {
    assert(2L * 2000000L / (3L * 2L) === 666666L)
  }

  // ---------------------------------------------------------------- q463

  test("q463: k-truss — the 3-peel survivor set and supports match a " +
    "driver-side replay of the same fixed-round peeling") {
    // q463 runs a FIXED 3 synchronous peels (Entries83.TrussPeels), not a
    // fixpoint loop — so "every survivor has support ≥ 1" is NOT an
    // invariant of its semantics (a non-converged graph can legitimately
    // surface support-0 survivors; ADVICE r12). The invariant that IS its
    // semantics: the output equals three rounds of drop-unsupported-edges
    // replayed on the same input, including each survivor's final support.
    import org.apache.spark.sql.functions._
    val out = q("q463_ktruss").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("support")).toMap
    val all = graft.ext.Curation
      .coengagementPairs(Tables.events(spark, sf), 10, 2L)
      .select(col("i1"), col("i2"))
      .collect().map(r => (r.getAs[String]("i1"), r.getAs[String]("i2")))
      .toSet
    // oriented-triangle support on an a<b edge list, as Entries83 joins it
    def sup(e: Set[(String, String)]): Map[(String, String), Long] = {
      val tris = for {
        (x, y) <- e; (y2, z) <- e if y2 == y; if e.contains((x, z))
      } yield (x, y, z)
      e.map(ed => ed -> tris.count(tr =>
        (tr._1, tr._2) == ed || (tr._2, tr._3) == ed ||
          (tr._1, tr._3) == ed).toLong).toMap
    }
    val replayed = (1 to 3).foldLeft(all) { (e, _) =>
      val s = sup(e); e.filter(s(_) >= 1L)
    }
    assert(out.nonEmpty, "the fixture graph has triangles")
    assert(out.keySet === replayed,
      "q463 survivors must equal the driver-side 3-peel replay")
    val finalSup = sup(replayed)
    out.foreach { case (ed, s) =>
      assert(s === finalSup(ed),
        s"support mismatch on $ed: query $s vs replay ${finalSup(ed)}")
    }
  }

  test("q463: peeling arithmetic on a hand graph — a triangle with a " +
    "pendant edge loses exactly the pendant") {
    // edges ab, bc, ac (triangle) + cd (pendant): cd is in no triangle
    // → peel 1 drops it; the triangle's edges each have support 1 and
    // survive every subsequent peel
    val edges = Set(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    def tris(e: Set[(String, String)]) =
      for {
        (x, y) <- e; (y2, z) <- e if y2 == y; if e.contains((x, z))
      } yield (x, y, z)
    def sup(e: Set[(String, String)]) = {
      val t = tris(e)
      e.map(ed => ed -> t.count(tr =>
        (tr._1, tr._2) == ed || (tr._2, tr._3) == ed ||
          (tr._1, tr._3) == ed)).toMap
    }
    val peeled = edges.filter(ed => sup(edges)(ed) >= 1)
    assert(peeled === edges - (("c", "d")))
    assert(peeled.filter(ed => sup(peeled)(ed) >= 1) === peeled,
      "the triangle is the fixpoint")
  }

  // ---------------------------------------------------------------- q464

  test("q464: survivorship — every cluster keeps exactly one canonical " +
    "doc, the canonical is the longest (ties to smallest id), and rows " +
    "cover the whole corpus") {
    val out = q("q464_cluster_canon").collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.length.toLong === total, "one row per document")
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_.getAs[Long]("keep") === 1L) === 1,
        s"cluster $cid must keep exactly one doc")
      assert(rows.map(_.getAs[Long]("cluster_size")).distinct.length === 1)
      assert(rows.head.getAs[Long]("cluster_size") === rows.length.toLong)
      val canon = rows.find(_.getAs[Long]("keep") === 1L).get
      val best = rows.maxBy(r =>
        (r.getAs[Long]("n_chars"), -r.getAs[Long]("doc_id")))
      assert(canon.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"),
        s"cluster $cid canonical must be longest-then-smallest-id")
      rows.foreach(r => assert(r.getAs[Long]("canon_id") ===
        canon.getAs[Long]("doc_id")))
    }
    // near-dups exist in the fixture: at least one non-singleton cluster
    assert(byCluster.values.exists(_.length > 1),
      "fixture has near-dup docs; survivorship must actually merge")
  }
}

package graft

/** Pins the driver contract on `SparkEntry` itself — the surface the
  * external harness consumes without compiling against this repo:
  * `entry` must smoke (rows > 0 at sf0.001), every registered query must
  * carry a DuckDB oracle twin (the hash-compare gate silently weakens to a
  * rows-only check for any query missing one), and no oracle may be
  * orphaned by a renamed query (it would never run). These are exactly the
  * regressions a refactor can introduce without failing any per-query
  * batch spec.
  */
class ContractSpec extends SparkSpec {

  test("entry: flagship query returns rows at sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("every query is oracle-backed and every oracle names a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val unbacked = q -- o
    val orphaned = o -- q
    assert(unbacked.isEmpty,
      s"queries without an oracle (driver degrades to rows-only): " +
        unbacked.toSeq.sorted.mkString(", "))
    assert(orphaned.isEmpty,
      s"oracles without a query (never executed): " +
        orphaned.toSeq.sorted.mkString(", "))
  }

  test("query names follow the qN_slug convention the tooling greps for") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("""q\d+_\w+"""))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }

  test("no oracle ships a bare transcendental output the policy forbids") {
    // The knife-edge audit covers the 8 vetted floored-ln sites; this pin
    // keeps the set CLOSED: any new oracle using ln/exp must either appear
    // in the vetted list (and get a KnifeEdgeSpec probe) or not exist.
    val vetted = Set("q298_zipf_slope", "q300_bigram_nll", "q303_psi_drift",
      "q308_word_pmi", "q314_weighted_reservoir", "q318_mutual_info",
      "q388_bh_fdr", "q391_dp_histogram")
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if !vetted(name) &&
        ("""(?i)\b(ln|exp|pow|power|log|log2|log10|sin|cos|tan|asin|acos""" +
          """|atan|atan2|sinh|cosh|tanh)\s*\(""").r.findFirstIn(sql).isDefined
        => name
    }
    assert(offenders.isEmpty,
      "new transcendental in an oracle — add a KnifeEdgeSpec probe and " +
        s"vet it, or re-express exactly: ${offenders.toSeq.sorted.mkString(", ")}")
  }
}

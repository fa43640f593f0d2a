package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev main: dump formatted physical plans for named queries (plan review —
  * SURVEY.md §4 posture: verify window fusion, pushdown, broadcast choices).
  *
  * `--census` mode prints one TSV row per query instead of full plans:
  * parquet-scan count, Exchange count, Generate count, InMemoryRelation
  * refs, whether any higher-order lambda survives in the physical plan,
  * and the count of UNPARTITIONED Window/WindowGroupLimit operators (empty
  * partitionSpec = all rows to one task — acceptable only on domain-bounded
  * relations) — the structural-waste screen used for the bench-tail sweeps
  * (a high scan count without a matching cache is a shared subtree
  * replanned per consumer; a lambdafunction is an interpreted per-row
  * allocation). `--census q1 q2 ...` censuses only the named queries.
  *
  * The committed snapshot lives at `tools/census_baseline.tsv`;
  * PlanCensusSpec regenerates every row at sf0.001 in CI and fails if any
  * query's scan or generate count exceeds the committed value, so a
  * shared-subtree replan (the r8 q300 escape) can't land silently. Refresh
  * after an adjudicated plan change with:
  * {{{
  * sbt -batch "runMain graft.Explain --census" 2>/dev/null \
  *   | grep -P "^q|^query" | grep -v $'\tERR\t' > tools/census_baseline.tsv
  * }}}
  * (the `grep -v` drops error rows, which also start with the query name —
  * PlanCensusSpec rejects a malformed row by name rather than crashing,
  * but an ERR row in the baseline means that query was never adjudicated).
  */
object Explain {

  /** One census row: (parquet scans, exchanges, generates, InMemoryRelation
    * refs, any interpreted lambda, unpartitioned windows). Counts the
    * FormattedMode detail section, where each operator prints exactly once —
    * except `windows`, which is collected from the typed sparkPlan tree
    * (partitionSpec emptiness is a node field, not reliably greppable). */
  case class CensusRow(scans: Int, exchanges: Int, generates: Int,
                       imr: Int, lambda: Boolean, windows: Int = 0) {
    def tsv: String = s"$scans\t$exchanges\t$generates\t$imr\t$lambda\t$windows"
  }

  /** FormattedMode physical plan — render once, feed [[censusRowOf]] and
    * [[hoistViolations]] from the same string. */
  def formatted(df: DataFrame): String =
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  def censusRow(df: DataFrame): CensusRow =
    censusRowOf(formatted(df)).copy(windows = unpartitionedWindows(df))

  def censusRowOf(p: String): CensusRow =
    CensusRow(
      p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")),
      p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")),
      p.linesIterator.count(_.matches("""\(\d+\) Generate.*""")),
      p.linesIterator.count(_.contains("InMemoryRelation")),
      p.contains("lambdafunction"))

  /** THE SCALE-KILLER SHAPE the text census can't see: a Window (or
    * WindowGroupLimit) with an EMPTY partitionSpec sends every row to one
    * task — fine on a domain-bounded relation (a calendar spine, a reduced
    * distinct-value table), fatal on fact rows at 100 TB. Counted on the
    * pre-AQE sparkPlan where the tree is fully materialized (the same
    * traversal ScalePostureSpec's per-query pins use; AQE never edits a
    * window's partitionSpec). PlanCensusSpec pins every query's count
    * against the adjudicated baseline. */
  def unpartitionedWindows(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => 1
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => 1
    }.sum

  /** Build-time provenance for localCheckpointed relations: rdd id → the
    * [[boundLabel]] of the plan that BUILT the checkpoint. A checkpoint
    * severs the plan, so post-hoc the audit sees only an RDDScanExec; a
    * builder that checkpoints a domain-bounded relation registers it here
    * (via [[localCheckpointWithProvenance]]) so the claim stays
    * machine-checked. Entries are a few bytes each and keyed by RDD id —
    * session-lifetime growth is bounded by the number of checkpoints. */
  private val checkpointProvenance =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** localCheckpoint `df` (eager) and record what built it, derived from
    * the PRE-checkpoint physical plan — so [[windowAudit]] can see through
    * the resulting RDDScanExec instead of stopping at `checkpointed-rdd`. */
  def localCheckpointWithProvenance(df: DataFrame): DataFrame = {
    val label = boundLabel(df.queryExecution.sparkPlan)
    val out = df.localCheckpoint()
    out.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.foreach(id => checkpointProvenance.put(id, label))
    out
  }

  /** What bounds a plan subtree: the first aggregate / limit /
    * local-relation met walking DOWN (an aggregate below means the subtree
    * is a REDUCED domain: distinct values, group keys, a calendar spine),
    * or `RAW` if it reaches a source scan with no reduction — the shape
    * that cannot ship under an unpartitioned window. Recurses through the
    * two plan-severing boundaries: an InMemoryTableScanExec is audited by
    * the plan that BUILT the cache (`cache-of(...)`), and an RDDScanExec
    * by its registered build-time provenance (`checkpoint-of(...)`) —
    * an UNREGISTERED checkpoint stays opaque and reports as RAW so it
    * must be either registered or adjudicated, never silently trusted. */
  private def boundLabel(
      p: org.apache.spark.sql.execution.SparkPlan): String = p.collectFirst {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      s"agg-below(${a.groupingExpressions.map(_.name).mkString(",")})"
    case _: org.apache.spark.sql.execution.LocalLimitExec => "limit-below"
    case _: org.apache.spark.sql.execution.GlobalLimitExec => "limit-below"
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
      "topk-below"
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      s"local-relation(${l.rows.length} rows)"
    case r: org.apache.spark.sql.execution.RangeExec =>
      // a statically small range is a spine; a huge one is fact-sized
      if (r.numElements <= BigInt(10_000_000)) s"range(${r.numElements} rows)"
      else s"RAW-large-range(${r.numElements})"
    case r: org.apache.spark.sql.execution.RDDScanExec =>
      Option(checkpointProvenance.get(r.rdd.id))
        .map(l => s"checkpoint-of($l)")
        .getOrElse("RAW-unregistered-checkpoint")
    case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      s"cache-of(${boundLabel(i.relation.cachedPlan)})"
    // AQE wrappers are leaf-like (children = Nil) — recurse explicitly,
    // or a cached/staged aggregate would be invisible and report RAW
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      boundLabel(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      boundLabel(q.plan)
  }.getOrElse("RAW")

  /** Adjudication aid for the census `windows` column (`--windows` mode):
    * one line per unpartitioned window with [[boundLabel]] of its child
    * subtree. PlanCensusSpec asserts no registered query's line contains
    * RAW — the domain-bounded claim behind every adjudicated nonzero
    * census row is machine-checked, including through cache and
    * checkpoint boundaries. */
  def windowAudit(df: DataFrame): Seq[String] = {
    def bound(p: org.apache.spark.sql.execution.SparkPlan): String =
      boundLabel(p)
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => s"Window -> ${bound(w.child)}"
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => s"WindowGroupLimit -> ${bound(w.child)}"
    }
  }

  /** Expensive per-row functions that must not be re-evaluated once per
    * EXPLODED row unless they consume the generator's own output. */
  private val HeavyFns = Seq("md5(", "sha2(", "conv(", "regexp_extract(",
    "regexp_replace(", "jaro_winkler(", "sentences(", "levenshtein(")

  /** THE q296 CLASS: `select(heavyExpr, explode(...))` lets Catalyst's
    * ExtractGenerator hoist every non-generator expression into the Project
    * ABOVE the Generate, where it re-evaluates once per exploded row — a
    * 32-replicate bootstrap paid 32 md5s per order (3.4 s → 1.1 s at sf0.1
    * when split into a select below the explode, r10). This screen flags a
    * heavy function in a Project sitting DIRECTLY above a Generate whose
    * argument references none of the generator's output attributes (if it
    * does reference them — a shingle hash, say — per-exploded-row is the
    * only correct place). Returns one description per violation; the r10
    * sweep over all 417 plans returned none after the q296 fix, and
    * PlanCensusSpec pins it at zero. */
  def hoistViolations(p: String): Seq[String] = {
    // exact parenthood from the header tree's indentation (node ids are
    // NOT parent = child + 1 in multi-branch plans — a join's second
    // subtree renumbers): each header line is `indent NodeName (id)`;
    // a node's parent is the nearest shallower line above it
    val header = p.split("""\n\(1\) """).head
    // prefix includes the whole-stage-codegen `* ` marker (present when the
    // plan is not AQE-wrapped) and the branch connectors `+- : |`
    val treeLine = """(?m)^([ :+|*-]*)([A-Za-z][\w ]*) \((\d+)\)\s*$""".r
    val entries = treeLine.findAllMatchIn(header).map { m =>
      (m.group(1).length, m.group(2).trim, m.group(3).toInt)
    }.toSeq
    // id -> (parent name, parent id)
    val parentOf: Map[Int, (String, Int)] = entries.zipWithIndex.flatMap {
      case ((depth, _, id), i) =>
        entries.take(i).reverse.collectFirst {
          case (d, pname, pid) if d < depth => id -> ((pname, pid))
        }
    }.toMap
    val nameOf = entries.map { case (_, n, id) => id -> n }.toMap
    def section(id: Int): String = {
      val start = p.indexOf(s"\n($id) ")
      if (start < 0) return ""
      val body = p.substring(start + 1)
      """\n\(\d+\) """.r.findFirstMatchIn(body)
        .map(m => body.substring(0, m.start))
        .getOrElse(body)
    }
    val attrRe = """\w+#\d+""".r
    nameOf.toSeq.sortBy(_._1).collect {
      case (g, "Generate") if parentOf.get(g).exists(_._1 == "Project") =>
        val genOut = """\[([\w#, ]+)\]""".r.findAllMatchIn(section(g))
          .toSeq.lastOption.toSeq
          .flatMap(m => attrRe.findAllIn(m.group(1)).toSeq)
        val body = section(parentOf(g)._2)
        HeavyFns.flatMap { fn =>
          Iterator.iterate(body.indexOf(fn))(i => body.indexOf(fn, i + 1))
            .takeWhile(_ >= 0).toSeq.flatMap { i =>
              // balanced-paren span of the call's arguments
              var depth = 0; var j = i + fn.length - 1; var end = -1
              while (j < body.length && end < 0) {
                body(j) match {
                  case '(' => depth += 1
                  case ')' => depth -= 1; if (depth == 0) end = j
                  case _ =>
                }
                j += 1
              }
              val span = body.substring(i, if (end < 0) body.length else end + 1)
              if (genOut.exists(span.contains)) None
              else Some(s"${fn.dropRight(1)} in Project(${parentOf(g)._2}) above " +
                s"Generate($g) ignores the generator output " +
                s"${genOut.mkString(",")} — it re-runs once per exploded " +
                "row; compute it in a select BELOW the explode")
            }
        }
    }.flatten
  }

  /** Census one query by name against `dir`, clearing the shared cache
    * first so counts reflect the fresh-session plan shape. */
  def censusOf(spark: SparkSession, dir: String, name: String): CensusRow = {
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries(name)(spark, dir)
    censusRow(df)
  }

  /** Bailout for [[planWeight]]: counting stops here — any plan that
    * reaches it is already far beyond the census ceiling. */
  val PlanWeightCap: Long = 10_000_000L

  /** COLD-PLAN WEIGHT: physical-plan node count and the DAG-EXPANDED
    * expression-tree PATH count of the un-cached plan — the quantity that
    * blew up in r12's q440. Mechanism (measured): an alias of a non-cheap
    * expression consumed k times per composition round stays a compact
    * object DAG in memory, but Catalyst's optimizer (predicate pushdown /
    * project collapse substituting the alias per reference) and then
    * codegen + toString all walk it as a TREE — once per PATH — so a
    * 10-round 3-reference chain costs 3^10 visits. q440's pre-fix lcp
    * fragment weighed 561,641 paths here (17 s just to OPTIMIZE at any sf;
    * ~13 min to codegen at execution), vs ≤ a few thousand for every
    * healthy query. The count itself walks paths too, so it carries a
    * bailout cap ([[PlanWeightCap]]) — a pathological plan returns the cap,
    * it never hangs the gate.
    *
    * Recurses through the two plan-severing wrappers the naive walk
    * misses: InMemoryTableScanExec re-weighs the CACHED child plan (a
    * persist() marker substitutes an IMR leaf even before materialization,
    * and the first action pays the cached plan's full cost — pre-fix q440's
    * monster lived exactly there), and AQE wrappers (leaf-like, children =
    * Nil) are unwrapped explicitly. A localCheckpoint RDD leaf is NOT
    * recursed: its cost was paid at build time by an already-gated plan.
    * PlanCensusSpec asserts a hard ceiling per query with the cache
    * cleared, so the q440 class cannot ship again. */
  def planWeight(df: DataFrame, cap: Long = PlanWeightCap): (Long, Long) = {
    var nodes = 0L
    var exprs = 0L
    def walkExpr(e: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Unit = {
      if (exprs > cap) return
      exprs += 1
      e.children.foreach(c =>
        walkExpr(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]]))
    }
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit =
      p.foreach { n =>
        nodes += 1
        n.expressions.foreach(walkExpr)
        n match {
          case i: org.apache.spark.sql.execution.columnar
                    .InMemoryTableScanExec =>
            walk(i.relation.cachedPlan)
          case a: org.apache.spark.sql.execution.adaptive
                    .AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => ()
        }
      }
    walk(df.queryExecution.sparkPlan)
    (nodes, exprs min cap)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session(cores = 4, appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val census = args.headOption.contains("--census")
    val winAudit = args.headOption.contains("--windows")
    val planTime = args.headOption.contains("--plantime")
    val names =
      if ((census || winAudit || planTime) && args.length > 1) args.drop(1).toSeq
      else if (args.nonEmpty && !census && !winAudit && !planTime) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    if (census)
      println("query\tscans\texchanges\tgenerates\timr\tlambda\twindows")
    if (planTime)
      println("query\tbuild_ms\tplan_ms\tnodes\texprs")
    for (n <- names) {
      if (planTime) {
        // cold-plan phase timing: query construction (which may itself run
        // checkpoint jobs) vs analysis+optimization+physical planning,
        // plus the planWeight counters the census gate pins
        try {
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, dir)
          val t1 = System.nanoTime()
          val (nodes, exprs) = planWeight(df)
          val t2 = System.nanoTime()
          println(s"$n\t${(t1 - t0) / 1000000}\t${(t2 - t1) / 1000000}" +
            s"\t$nodes\t$exprs")
        } catch { case e: Throwable => println(s"$n\tERR\t$e") }
      } else if (winAudit) {
        try {
          spark.sharedState.cacheManager.clearCache()
          val lines = windowAudit(SparkEntry.queries(n)(spark, dir))
          lines.foreach(l => println(s"$n\t$l"))
        } catch { case e: Throwable => println(s"$n\tERR\t$e") }
      } else if (census) {
        try println(s"$n\t${censusOf(spark, dir, n).tsv}")
        catch { case e: Throwable => println(s"$n\tERR\t$e") }
      } else {
        println(s"\n========== $n ==========")
        try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}

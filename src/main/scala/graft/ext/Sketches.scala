package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Heavy-hitter detection at corpus scale — exact answers with sketch-style
  * economics.
  *
  * The classic φ-frequent-item problem: find every item with global count
  * ≥ T without shuffling the full item domain (at 100 TB the token/url/
  * n-gram domain is billions of keys; a naive groupBy shuffles all of them
  * to find the handful of frequent ones).
  */
object Sketches {

  /** Exact heavy hitters via pigeonhole candidate pruning, two passes and
    * NO full-domain shuffle:
    *
    * Pass 1 (map-only): each input partition counts its items in a local
    * hash map and emits only items with local count ≥ ⌈T/P⌉ (pigeonhole: if
    * a global count reaches T over P partitions, some partition holds
    * ≥ ⌈T/P⌉ of them — the emitted set is a guaranteed superset of the true
    * heavy hitters). No shuffle: the only data movement is the candidate
    * ids, collected to a broadcast.
    *
    * Pass 2: re-scan with a broadcast semi-join on the candidates — the
    * filter runs map-side BEFORE the exchange, so only candidate items are
    * ever shuffled — then an exact recount drops the false positives.
    *
    * Wall-clock = two scans + a candidate-sized shuffle; the full-domain
    * alternative is one scan + a domain-sized shuffle. At any realistic
    * skew (frequent items ≪ domain) the two-pass form wins by orders of
    * magnitude.
    *
    * DEGRADATION GUARDS (the 100 TB story): the pigeonhole bound weakens
    * as P grows — at P ≥ T the local threshold hits 1 and the "candidate"
    * set is the whole domain, so `broadcast(candidates)` would become an
    * unbounded driver-side materialization. Two tripwires keep the op
    * bounded:
    *
    *   1. `localThr ≤ 1` (detectable BEFORE any pass): the prune can't
    *      reject anything — skip pass 1 entirely and run the naive exact
    *      two-phase groupBy (map-side partial combine bounds the shuffle
    *      to per-partition distinct keys; no broadcast anywhere).
    *   2. the materialized candidate count exceeds
    *      `maxBroadcastCandidates`: same fallback. The candidate pass is
    *      persisted, so deciding costs one count over the (small) pruned
    *      set, not a rescan. A shuffle semi-join would be WORSE than the
    *      naive plan here — it shuffles every input row, while the
    *      two-phase aggregate ships only partial (key, count) pairs.
    *
    * Either way the result is exact; the guards only pick the cheaper
    * physical plan for the data at hand.
    */
  def heavyHitters(items: DataFrame, itemCol: String, minCount: Long,
                   maxBroadcastCandidates: Long = 2000000L): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(itemCol).cast("string")).as[String]

    def naiveExact: DataFrame =
      ds.toDF(itemCol)
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)

    val p = ds.rdd.getNumPartitions.toLong
    val localThr = (minCount - 1) / p + 1 // ⌈T/P⌉ via (T-1) div P + 1
    if (localThr <= 1L) return naiveExact

    val candidates = ds.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(s => m.update(s, m.getOrElse(s, 0L) + 1L))
      m.iterator.collect { case (s, c) if c >= localThr => s }
    }.toDF(itemCol).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCand = candidates.count()
    if (nCand > maxBroadcastCandidates) {
      candidates.unpersist()
      return naiveExact
    }
    ds.toDF(itemCol)
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bloom-filter pre-filtered membership join — the scale mechanic that
  * makes "is this document already in the corpus?" affordable when the
  * corpus index is billions of rows and almost every probe is novel.
  *
  * Build: every base key sets k=3 bit positions (Kirsch–Mitzenmacher
  * double hashing off ONE 48-bit md5 prefix — same family as the CMS
  * sketch) in an m = 2²⁰-bit exact bitmap via [[graft.functions.BitmapSketchAgg]];
  * the whole filter serializes to ≤ 128 KiB and BROADCASTS.
  *
  * Probe: each row computes its 3 positions and tests them against the
  * broadcast blob IN PLACE with the codegen'd `bitmap_contains` (byte
  * walk, no deserialization) — rows the filter rejects never reach the
  * exact semi-join. No false negatives by construction (every base key's
  * positions were set), so the final output is IDENTICAL to the plain
  * semi-join — the oracle runs the plain semi-join, pinning exactly that.
  *
  * At 100 TB: the exact semi-join shuffles only bloom-positive candidates
  * (true matches + ~(1−e^{−kn/m})^k false positives) instead of the whole
  * probe side — the same pattern Spark's own runtime row-level filtering
  * applies to shuffle joins, here made explicit, deterministic, and
  * mergeable (the bitmap OR-merges across corpus shards).
  */
object Bloom {

  val Bits = 1L << 20 // m: 2^20 bits → 16 dense pages, ≤128 KiB serialized
  val K = 3

  /** 48-bit md5 prefix of `c` (the engine-wide content hash). */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** The i-th Bloom position of a 48-bit hash: (h1 + i·h2) mod m, with
    * h1 = low 20 bits, h2 = (high 28 bits) | 1 (odd ⇒ full-period). */
  def position(h: Column, i: Int): Column =
    (pmod(h, lit(Bits)) + lit(i.toLong) * shiftright(h, 20).bitwiseOR(lit(1L)))
      .%(lit(Bits))

  /** One-row DataFrame: the serialized Bloom filter over `keys` (a LongType
    * 48-bit hash column named `h`). */
  def build(keys: DataFrame): DataFrame =
    keys.select(explode(array((0 until K).map(i =>
      position(col("h"), i)): _*)).as("pos"))
      .agg(GraftFunctions.bitmapSketch(col("pos")).as("bloom"))

  /** Rows of `probe` whose `h` (48-bit hash) appears in `base.h` — the
    * Bloom-accelerated exact semi-join described in the object doc.
    * `GraftFunctions.register` must have run on the session.
    *
    * The filter blob is COLLECTED (one ≤128 KiB row — the same small
    * driver action Spark's own `df.stat.bloomFilter` performs) and embedded
    * as a literal, NOT cross-joined: a cross join is visible to
    * ReorderJoin, which happily schedules the exact semi-join FIRST and
    * the bloom check above it — the exact inversion of the prefilter
    * (observed in the formatted plan; the posture spec pins the fixed
    * shape). As a literal, the probe is a plain codegen'd Filter sitting
    * on the probe scan, below the semi-join shuffle, where it belongs. */
  def memberJoin(probe: DataFrame, base: DataFrame): DataFrame = {
    val blob = build(base.select(col("h"))).head().getAs[Array[Byte]]("bloom")
    probe
      .filter((0 until K).map(i =>
        GraftFunctions.bitmapContains(lit(blob),
          position(col("h"), i))).reduce(_ && _))
      .join(base.select(col("h")).distinct(), Seq("h"), "left_semi")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the 100 TB posture for hot keys (SURVEY.md §4: "AQE
  * skew handling for hot customers like the UK mega-buyers").
  *
  * AQE's skew-join splitting covers joins automatically; for AGGREGATIONS
  * over a hot key the standard remedy is two-phase salted aggregation:
  * partial-aggregate on (key, salt) — spreading one hot key over N
  * reducers — then final-aggregate on key. Spark already does map-side
  * partial aggregation, so salting only wins when a single key's PARTIAL
  * results still swamp one reducer (huge cardinality per key, e.g.
  * collect_set/distinct state); provided here for exactly those aggregates.
  */
object Skew {

  /** Two-phase salted distinct count: phase 1 dedupes (key, salt, value)
    * with the hot key spread over `salts` reducers, phase 2 sums per key.
    * Equivalent to countDistinct(valueCol) group-by keyCol, but no single
    * reducer ever holds a hot key's full distinct set. */
  def saltedDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
                          salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("distinct_cnt"))

  /** Salted replicated-dimension join — the skew remedy when AQE's
    * skew-split can't help (e.g. the big side must also feed a same-keyed
    * aggregation, or the engine predates AQE). The big side gets a
    * deterministic salt from a high-cardinality discriminator column; the
    * small side is replicated `salts`× with every salt value; the join key
    * becomes (key, salt), spreading one hot key over `salts` reducers.
    * Result identical to `big.join(small, key, "inner")`. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, discCol: String, salts: Int): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(xxhash64(col(discCol)), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, b("__salt") === s("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }

  /** Two-phase salted sum (for when even partial-agg rows of one key are
    * too many for a reducer — defensive shape, same result as plain sum). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: Column,
                salts: Int, outName: String): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(outName))
}

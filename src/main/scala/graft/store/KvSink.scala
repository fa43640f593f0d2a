package graft.store

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S5 — online KV materialization (reference: jobs/materialize_online.py).
  *
  * The reference pipelines `HSET fs:customer:{id} {feature -> str}` into
  * Redis (:44-57). Spark-native: `foreachPartition` with one client +
  * pipeline per partition — connections amortized over partition batches,
  * which is the correct shape for any networked sink at cluster scale.
  * Redis itself isn't in this container, so the client is pluggable and
  * tests use the in-memory implementation; a Jedis-backed client drops in
  * without touching the sink logic.
  */
object KvSink {

  /** Minimal hash-set client surface (what the reference uses of Redis). */
  trait KvClient extends Serializable {
    def hset(key: String, fields: Map[String, String]): Unit

    /** Upsert only if the incoming row is at least as fresh (by
      * `meta:ts_us`) as the stored one — REQUIRED of every implementation:
      * incremental materialization relies on it for replay/out-of-order
      * safety (a Redis client implements it as a small Lua compare-and-set;
      * a client that cannot must not be used with the streaming sink). */
    def hsetIfNewer(key: String, fields: Map[String, String]): Unit

    /** Key expiry (reference: jobs/materialize_online.py:55-56 —
      * `pipe.expire(key, REDIS_TTL_SECONDS)` when the env var is set).
      * Redis EXPIRE semantics; default no-op for clients without TTL. */
    def expire(key: String, ttlSeconds: Long): Unit = ()
    def close(): Unit = ()
  }

  /** In-memory stand-in (JVM-local; works in local[*] where executors share
    * the driver JVM — a real deployment supplies a networked client). */
  class InMemoryKvClient extends KvClient {
    def hset(key: String, fields: Map[String, String]): Unit =
      InMemoryKvClient.store.merge(key, fields, (a, b) => a ++ b)

    def hsetIfNewer(key: String, fields: Map[String, String]): Unit =
      InMemoryKvClient.store.merge(key, fields, (old, nw) => {
        val oldTs = old.get("meta:ts_us").map(_.toLong).getOrElse(Long.MinValue)
        val newTs = nw.get("meta:ts_us").map(_.toLong).getOrElse(Long.MinValue)
        if (newTs >= oldTs) nw else old
      })

    override def expire(key: String, ttlSeconds: Long): Unit =
      InMemoryKvClient.deadlines.put(key,
        InMemoryKvClient.clockMs() + ttlSeconds * 1000L)
  }
  object InMemoryKvClient {
    val store = new ConcurrentHashMap[String, Map[String, String]]()
    private val deadlines = new ConcurrentHashMap[String, Long]()
    /** Injectable clock so TTL tests are deterministic. */
    @volatile var clockMs: () => Long = () => System.currentTimeMillis()

    private def live(key: String): Boolean =
      Option(deadlines.get(key)).forall(_ > clockMs())

    def snapshot: Map[String, Map[String, String]] =
      store.asScala.toMap.filter { case (k, _) => live(k) }
    def ttlMs(key: String): Option[Long] =
      Option(deadlines.get(key)).map(_ - clockMs())
    def clear(): Unit = {
      store.clear(); deadlines.clear()
      clockMs = () => System.currentTimeMillis()
    }
  }

  /** Env-config surface for the online path — the reference's knobs
    * (jobs/materialize_online.py:55-56 `REDIS_TTL_SECONDS`,
    * serving/feature_service.py:65-67 `FEATURE_BACKEND`,
    * `REDIS_KEY_PREFIX`) with the same names and defaults, injectable for
    * tests. */
  case class OnlineConfig(backend: String, keyPrefix: String,
                          ttlSeconds: Option[Long])
  object OnlineConfig {
    def fromEnv(env: String => Option[String] =
        k => sys.env.get(k)): OnlineConfig =
      OnlineConfig(
        backend = env("FEATURE_BACKEND").getOrElse("offline"),
        keyPrefix = env("REDIS_KEY_PREFIX").getOrElse("fs:customer:"),
        ttlSeconds = env("REDIS_TTL_SECONDS").flatMap(s =>
          scala.util.Try(s.toLong).toOption))
  }

  /** O16 — stringify row fields the way the reference does
    * (jobs/materialize_online.py:23-42): numeric features as `str(float)`,
    * nulls → "0", meta fields verbatim. */
  def rowToFields(row: Row, featureCols: Seq[String],
                  metaCols: Seq[String]): Map[String, String] = {
    val feats = featureCols.map { c =>
      val v = row.getAs[Any](c)
      val s = v match {
        case null => "0"
        case d: Double => d.toString
        case n: Number => n.doubleValue().toString
        case other => other.toString
      }
      c -> s
    }
    val metas = metaCols.map(c => s"meta:$c" -> String.valueOf(row.getAs[Any](c)))
    (feats ++ metas).toMap
  }

  /** Materialize latest snapshots into the KV store:
    * key = `{prefix}{user_id}`, fields per O16; `ttlSeconds` applies the
    * reference's optional per-key expiry after each upsert. */
  def materializeOnline(snapshots: DataFrame, newClient: () => KvClient,
                        keyPrefix: String = "fs:customer:",
                        ttlSeconds: Option[Long] = None): Long = {
    val featureCols = FeatureStore.featureNames.filterNot(_ == "user_id")
      .filter(snapshots.columns.contains)
    val metaCols = Seq("ts_us").filter(snapshots.columns.contains)
    val keyed = snapshots.withColumn("__key",
      concat(lit(keyPrefix), col("user_id").cast("string")))
    val n = snapshots.sparkSession.sparkContext.longAccumulator("kv_rows")
    keyed.foreachPartition { (it: Iterator[Row]) =>
      val client = newClient()
      try it.foreach { row =>
        val key = row.getAs[String]("__key")
        client.hset(key, rowToFields(row, featureCols, metaCols))
        ttlSeconds.foreach(client.expire(key, _))
        n.add(1)
      } finally client.close()
    }
    n.value
  }
}

package graft.store

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.9 serving edge — the reference's HTTP surface
  * (reference: serving/app.py:24-90, serving/feature_service.py:36-46)
  * reproduced over the JDK's built-in `com.sun.net.httpserver` with ZERO
  * new dependencies:
  *
  *   - `POST /predict` `{customer_id, t_ref?, latest?, threshold?}` →
  *     `{customer_id, t_ref, probability, prediction}`; 404 when the key
  *     (or any snapshot at/before `t_ref`) is unknown, 400 on a bad body.
  *     Lookup semantics mirror `get_snapshot`: `latest` or no `t_ref` →
  *     newest row; else newest row with `ts_us ≤ t_ref`.
  *   - `GET /health` → `{status, backend, model, offline_rows}`.
  *   - `POST /refresh` → `{reloaded_rows}` (re-invokes the loader).
  *   - `POST /debug/write_test` → `{wrote}` (reference: serving/app.py:120
  *     `/debug/write_test`): proves the pred-log partition dir is creatable
  *     and writable by writing one dated test record. The reference writes
  *     a parquet file via pyarrow; the serving edge never launches a Spark
  *     job, so the record here is a flat-JSON marker with the same fields —
  *     same property proven (partition dir + write permission), documented
  *     deviation in format. 503 when no `predsDir` is configured.
  *   - `GET /debug/log_state` → `{pred_files, feature_files}` (reference:
  *     serving/app.py:141 `/debug/log_state`): recursive file counts under
  *     the pred-log and feature-store dirs (parquet plus the test markers).
  *
  * Architecture stance (SURVEY.md §3 EP3): the serving edge reads
  * MATERIALIZED artifacts and never launches a Spark job per request. The
  * loader is called once at start and on `/refresh` only — exactly the
  * reference's in-memory pandas frame, here a per-user time-sorted map.
  * Production-scale serving replaces this process with reads from the KV
  * sink ([[KvSink]]); this endpoint is the single-node ops-parity shim.
  *
  * Prediction logging: the reference writes one parquet file per request
  * (serving/pred_logger.py) — an anti-pattern the batch engine does not
  * copy. Requests append to a bounded in-memory buffer;
  * [[ServingEndpoint.flushPredictionLog]] drains it through
  * [[FeatureStore.logPredictions]] (append-only, date-partitioned) on the
  * ops loop's cadence.
  */
final class ServingEndpoint(
    loader: () => DataFrame,
    contract: Seq[String],
    scorer: Array[Double] => Double,
    modelName: String,
    predsDir: Option[String] = None,
    featuresDir: Option[String] = None) {

  import ServingEndpoint._

  // user → time-ascending (ts_us, row) snapshots; swapped atomically on
  // refresh so in-flight requests always see a consistent table
  @volatile private var byUser: Map[Long, Vector[(Long, Map[String, Any])]] =
    Map.empty
  @volatile private var nRows: Long = 0L
  private val predLog =
    new java.util.concurrent.ConcurrentLinkedQueue[PredLogRow]()
  private var server: HttpServer = _

  /** (Re)load the materialized feature table; returns row count. */
  def reload(): Long = {
    val rows = loader().collect().map { r =>
      r.schema.fieldNames.zip(r.toSeq).toMap
    }
    byUser = rows
      .groupBy(m => asLong(m("user_id")))
      .map { case (u, rs) =>
        u -> rs
          .map(m => (asLong(m("ts_us")), m))
          .sortBy { case (ts, m) =>
            (ts, m.get("event_id").map(asLong).getOrElse(0L))
          }
          .toVector
      }
    nRows = rows.length.toLong
    nRows
  }

  /** Bind and start; port 0 picks an ephemeral port. Returns the bound
    * port. */
  def start(port: Int = 0): Int = {
    reload()
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/predict", (ex: HttpExchange) => handle(ex) {
      if (ex.getRequestMethod != "POST") (405, obj("detail" -> "use POST"))
      else predict(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
    })
    server.createContext("/health", (ex: HttpExchange) => handle(ex) {
      (200, obj("status" -> "ok", "backend" -> "offline",
        "model" -> modelName, "offline_rows" -> nRows))
    })
    server.createContext("/refresh", (ex: HttpExchange) => handle(ex) {
      if (ex.getRequestMethod != "POST") (405, obj("detail" -> "use POST"))
      else (200, obj("reloaded_rows" -> reload()))
    })
    server.createContext("/debug/write_test", (ex: HttpExchange) =>
      handle(ex) {
        if (ex.getRequestMethod != "POST") (405, obj("detail" -> "use POST"))
        else predsDir match {
          case None => (503, obj("detail" -> "no predsDir configured"))
          case Some(dir) =>
            val now = Instant.now()
            val day = now.toString.take(10) // yyyy-MM-dd (UTC)
            val part = java.nio.file.Paths.get(dir, s"date=$day")
            java.nio.file.Files.createDirectories(part)
            val path = part.resolve(s"test-${System.nanoTime()}.json")
            // same fields the reference's test row carries
            // (serving/app.py:125-133)
            java.nio.file.Files.write(path, obj(
              "ts_served" -> now.toString, "latency_ms" -> 0.0,
              "customer_id" -> 0L, "t_ref" -> now.toString,
              "threshold" -> 0.5, "probability" -> 0.0,
              "prediction" -> 0, "model_artifact" -> "test")
              .getBytes(StandardCharsets.UTF_8))
            (200, obj("wrote" -> path.toString))
        }
      })
    server.createContext("/debug/log_state", (ex: HttpExchange) =>
      handle(ex) {
        def countFiles(d: Option[String]): Long = d match {
          case None => 0L
          case Some(root) =>
            val p = java.nio.file.Paths.get(root)
            if (!java.nio.file.Files.isDirectory(p)) 0L
            else {
              val s = java.nio.file.Files.walk(p)
              try s.filter { f =>
                val n = f.getFileName.toString
                java.nio.file.Files.isRegularFile(f) &&
                  (n.endsWith(".parquet") ||
                    (n.startsWith("test-") && n.endsWith(".json")))
              }.count()
              finally s.close()
            }
        }
        (200, obj("pred_files" -> countFiles(predsDir),
          "feature_files" -> countFiles(featuresDir)))
      })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** Drain buffered predictions through the S4 append-only log. Returns
    * the number of rows flushed. */
  def flushPredictionLog(spark: SparkSession, path: String): Long = {
    val drained = Iterator
      .continually(predLog.poll())
      .takeWhile(_ != null)
      .toSeq
    if (drained.nonEmpty) {
      import spark.implicits._
      FeatureStore.logPredictions(
        drained.toDF().withColumnRenamed("tsServedUs", "ts_us"), path)
    }
    drained.length.toLong
  }

  private def predict(body: String): (Int, String) =
    Json.parseFlat(body) match {
      case None => (400, obj("detail" -> "malformed JSON body"))
      case Some(req) =>
        req.get("customer_id") match {
          case Some(idNum: java.lang.Double)
              if idNum.doubleValue.isWhole =>
            val id = idNum.longValue
            val latest = req.get("latest").contains(true)
            val threshold = req.get("threshold") match {
              case Some(t: java.lang.Double)
                  if t.doubleValue >= 0 && t.doubleValue <= 1 =>
                t.doubleValue
              case Some(_) =>
                return (400, obj("detail" -> "threshold must be in [0, 1]"))
              case None => 0.5
            }
            val tRefUs: Option[Long] = req.get("t_ref") match {
              case Some(s: String) => parseInstantUs(s) match {
                case some @ Some(_) => some
                case None =>
                  return (400, obj("detail" -> s"unparseable t_ref: $s"))
              }
              case _ => None
            }
            byUser.get(id) match {
              case None =>
                (404, obj("detail" -> s"No features for customer_id=$id"))
              case Some(snaps) =>
                val chosen =
                  if (latest || tRefUs.isEmpty) Some(snaps.last)
                  else snaps.takeWhile(_._1 <= tRefUs.get).lastOption
                chosen match {
                  case None =>
                    (404, obj("detail" ->
                      (s"No feature snapshot at/before " +
                        s"${req("t_ref")} for customer_id=$id")))
                  case Some((ts, row)) =>
                    val t0 = System.nanoTime()
                    val x = contract.map(n =>
                      row.get(n).map(asDouble).getOrElse(0.0)).toArray
                    val proba = scorer(x)
                    val label = if (proba >= threshold) 1 else 0
                    val now = Instant.now()
                    predLog.add(PredLogRow(
                      tsServedUs = now.getEpochSecond * 1000000L +
                        now.getNano / 1000L,
                      customer_id = id, t_ref_us = ts,
                      threshold = threshold, probability = proba,
                      prediction = label, model_artifact = modelName,
                      latency_ms = (System.nanoTime() - t0) / 1e6))
                    (200, obj("customer_id" -> id, "t_ref" -> isoUs(ts),
                      "probability" -> proba, "prediction" -> label))
                }
            }
          case _ =>
            (400, obj("detail" -> "customer_id (integer) is required"))
        }
    }

  private def handle(ex: HttpExchange)(f: => (Int, String)): Unit = {
    val (code, jsonBody) =
      try f
      catch { case e: Throwable => (500, obj("detail" -> e.toString)) }
    val bytes = jsonBody.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

object ServingEndpoint {

  case class PredLogRow(tsServedUs: Long, customer_id: Long, t_ref_us: Long,
                        threshold: Double, probability: Double,
                        prediction: Int, model_artifact: String,
                        latency_ms: Double)

  /** Adapt a trained churn pipeline (assembler + GBT,
    * [[graft.ml.ChurnModel]]) to a LOCAL per-request scorer — the public
    * `predictProbability(Vector)` on the final stage; no Spark job per
    * request. The input array must already be in the assembler's input
    * order (= the feature-name contract). */
  def pipelineScorer(model: org.apache.spark.ml.PipelineModel)
      : Array[Double] => Double = {
    val clf = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification
        .ProbabilisticClassificationModel[
          org.apache.spark.ml.linalg.Vector, _]]
    x => clf.predictProbability(
      org.apache.spark.ml.linalg.Vectors.dense(x))(1)
  }

  private[graft] def asLong(v: Any): Long = v match {
    case n: Number => n.longValue
    case other => other.toString.toLong
  }

  private[graft] def asDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue
    case null => 0.0
    case _ => 0.0
  }

  private[graft] def isoUs(us: Long): String =
    Instant.EPOCH.plus(us, ChronoUnit.MICROS).toString

  /** ISO instant / datetime / date → epoch micros (UTC), like the
    * reference's `pd.to_datetime(t_ref, utc=True)`. */
  private[graft] def parseInstantUs(s: String): Option[Long] = {
    def us(i: Instant) = i.getEpochSecond * 1000000L + i.getNano / 1000L
    scala.util.Try(us(Instant.parse(s))).toOption
      .orElse(scala.util.Try(us(LocalDateTime.parse(s)
        .toInstant(ZoneOffset.UTC))).toOption)
      .orElse(scala.util.Try(us(LocalDate.parse(s)
        .atStartOfDay(ZoneOffset.UTC).toInstant)).toOption)
  }

  /** Minimal FLAT JSON object codec for the request/response bodies — the
    * payloads here are flat by construction (mirrors serving/app.py's
    * pydantic models); nested values are rejected with a 400. Hand-rolled
    * because the sandbox ships no JSON library and the JDK has none. */
  private[graft] object Json {

    /** Parse `{"k": v, ...}` with string/number/bool/null values.
      * Numbers surface as java.lang.Double, strings as String, booleans
      * as Boolean; null values are dropped. Returns None on anything
      * malformed or nested. */
    def parseFlat(s: String): Option[Map[String, Any]] = {
      val in = s.trim
      if (!in.startsWith("{") || !in.endsWith("}")) return None
      var i = 1
      val out = scala.collection.mutable.Map[String, Any]()
      def skipWs(): Unit = while (i < in.length && in(i).isWhitespace) i += 1
      def parseString(): Option[String] = {
        if (in(i) != '"') return None
        i += 1
        val sb = new StringBuilder
        while (i < in.length && in(i) != '"') {
          if (in(i) == '\\' && i + 1 < in.length) {
            i += 1
            sb.append(in(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case c => c
            })
          } else sb.append(in(i))
          i += 1
        }
        if (i >= in.length) None else { i += 1; Some(sb.toString) }
      }
      skipWs()
      if (i < in.length && in(i) == '}') return Some(Map.empty)
      while (true) {
        skipWs()
        val key = parseString().getOrElse(return None)
        skipWs()
        if (i >= in.length || in(i) != ':') return None
        i += 1; skipWs()
        if (i >= in.length) return None
        in(i) match {
          case '"' => out(key) = parseString().getOrElse(return None)
          case 't' if in.startsWith("true", i) => out(key) = true; i += 4
          case 'f' if in.startsWith("false", i) => out(key) = false; i += 5
          case 'n' if in.startsWith("null", i) => i += 4
          case c if c == '-' || c.isDigit =>
            val start = i
            while (i < in.length && "+-.eE0123456789".indexOf(in(i)) >= 0)
              i += 1
            out(key) = scala.util.Try(
              java.lang.Double.valueOf(in.substring(start, i)))
              .getOrElse(return None)
          case _ => return None // nested object/array: not a flat body
        }
        skipWs()
        if (i >= in.length) return None
        in(i) match {
          case ',' => i += 1
          case '}' =>
            i += 1; skipWs()
            return if (i == in.length) Some(out.toMap) else None
          case _ => return None
        }
      }
      None
    }

    def escape(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
  }

  /** Render a flat JSON object; Doubles via Java's shortest-repr
    * `toString` (what a reader round-trips exactly). */
  private[graft] def obj(kvs: (String, Any)*): String =
    kvs.map { case (k, v) =>
      val rendered = v match {
        case s: String => "\"" + Json.escape(s) + "\""
        case null => "null"
        case other => other.toString
      }
      "\"" + k + "\": " + rendered
    }.mkString("{", ", ", "}")
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BinaryType` payloads with
  * typed metadata, decoded/feature-extracted in batched partition passes.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder; everything around it — the
  * binary column, the case-class schema, the `mapPartitions` batch shape, the
  * partition-local iteration a real JNI/codec call would amortize over — is
  * real, tested Spark plumbing. Swap `decodeStub`'s body for an actual codec
  * (e.g. javax.imageio / ffmpeg via process-per-partition) and nothing else
  * changes.
  */
object Multimodal {

  /** One decoded media record; `width/height/channels` are what a real image
    * decode would yield — here derived deterministically from the payload. */
  case class MediaFeature(doc_id: Long, n_bytes: Long, checksum: Long,
                          width: Int, height: Int, channels: Int)

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Checksum = position-weighted modular hash of the payload bytes
    * (same family as TextAnalysis.fingerprint, so the oracle can mirror it). */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeature = {
    val p = TextAnalysis.FpP
    var acc = 0L
    var i = 0
    while (i < payload.length) {
      // unsigned byte value, 1-based position — mirrors ascii()/ord() on text
      acc += (payload(i) & 0xff).toLong *
        ((TextAnalysis.FpA * (i + 1) + TextAnalysis.FpB) % p)
      i += 1
    }
    MediaFeature(docId, payload.length.toLong, acc % p,
      width = (payload.length % 640).toInt,
      height = (payload.length * 7 % 480).toInt, channels = 3)
  }

  /** Attach a binary payload column (here: utf8 text bytes stand in for media
    * bytes; in production this is the raw image/audio blob read from object
    * storage or an inline parquet binary column). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** One sampled "video frame": fixed-size byte slice of the payload with a
    * per-frame checksum (what a real frame decoder + feature extractor would
    * emit). */
  case class FrameFeature(doc_id: Long, frame_idx: Long, frame_bytes: Long,
                          checksum: Long)

  /** Frame-sample the payload as a stand-in video: fixed `frameBytes` slices,
    * keep every `every`-th frame, per-frame position-weighted checksum (same
    * affine family as the fingerprint, positions 1-based WITHIN the frame, so
    * the oracle replays it from the text). flatMap-partitions shape: one
    * input row fans out to 0..n frame rows, decoder init amortizes per
    * partition. */
  def frameSample(spark: SparkSession, documents: DataFrame,
                  frameBytes: Int = 256, every: Int = 4): Dataset[FrameFeature] = {
    import spark.implicits._
    val p = TextAnalysis.FpP
    withPayload(documents)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).map { f =>
          val start = f * frameBytes
          val end = math.min(bytes.length, start + frameBytes)
          var acc = 0L
          var i = start
          while (i < end) {
            acc += (bytes(i) & 0xff).toLong *
              ((TextAnalysis.FpA * (i - start + 1) + TextAnalysis.FpB) % p)
            i += 1
          }
          FrameFeature(id, f.toLong, (end - start).toLong, acc % p)
        }
      }
  }

  /** One overlapping "audio" chunk: hop-window slice with per-chunk
    * checksum (what a speech featurizer emits per frame window). */
  case class ChunkFeature(doc_id: Long, chunk_idx: Long, start_byte: Long,
                          chunk_bytes: Long, checksum: Long)

  /** OVERLAPPING hop-window chunking — the audio/speech framing pattern
    * (window > hop ⇒ consecutive chunks share window−hop bytes), vs
    * [[frameSample]]'s disjoint strided frames. Chunk starts at every
    * `hopBytes` while inside the payload; checksum positions are 1-based
    * WITHIN the chunk (the oracle replays from the text). Same
    * flatMap-partitions shape: swap the checksum body for a real
    * mel/FFT kernel and the plumbing stands. */
  def audioChunks(spark: SparkSession, documents: DataFrame,
                  windowBytes: Int = 160, hopBytes: Int = 96)
      : Dataset[ChunkFeature] = {
    import spark.implicits._
    val p = TextAnalysis.FpP
    withPayload(documents)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nChunks = (bytes.length + hopBytes - 1) / hopBytes
        (0 until nChunks).map { c =>
          val start = c * hopBytes
          val end = math.min(bytes.length, start + windowBytes)
          var acc = 0L
          var i = start
          while (i < end) {
            acc += (bytes(i) & 0xff).toLong *
              ((TextAnalysis.FpA * (i - start + 1) + TextAnalysis.FpB) % p)
            i += 1
          }
          ChunkFeature(id, c.toLong, start.toLong, (end - start).toLong,
            acc % p)
        }
      }
  }

  /** One resized media record: metadata + checksum of the downsampled
    * payload (what a real resize kernel would emit alongside the new blob). */
  case class ResizedFeature(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
                            new_width: Int, new_height: Int, checksum: Long)

  /** STUB resize: keep every `step`-th payload byte (nearest-neighbor
    * downsampling on the fake byte "pixels"), emit the resized metadata and
    * a position-weighted checksum of the KEPT bytes (1-based position within
    * the resized sequence — the oracle replays it from the text). Swap the
    * body for a real resize kernel; the mapPartitions shape stays. */
  def resizeStub(spark: SparkSession, documents: DataFrame,
                 step: Int = 4): Dataset[ResizedFeature] = {
    import spark.implicits._
    val p = TextAnalysis.FpP
    withPayload(documents)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          var acc = 0L
          var j = 0L
          var i = 0
          while (i < bytes.length) {
            j += 1
            acc += (bytes(i) & 0xff).toLong *
              ((TextAnalysis.FpA * j + TextAnalysis.FpB) % p)
            i += step
          }
          ResizedFeature(id, bytes.length.toLong, j,
            new_width = (j % 640).toInt, new_height = (j * 7 % 480).toInt,
            checksum = acc % p)
        }
      }
  }

  /** Decode + feature-extract via mapPartitions: batch-at-a-time iteration so
    * a real decoder could amortize codec/model init per partition (the
    * mapInPandas batch shape, Scala-native). */
  def decodeFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a real decoder would go here (once, not per row)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** SHOT-BOUNDARY detection on the frame stream: consecutive COMPLETE
    * `frameBytes` frames of the payload compared by exact L1 byte distance
    * (Σ|b_t[i] − b_{t−1}[i]|); a cut is a delta above `threshold` — the
    * classic pixel-difference shot detector, byte-for-pixel on the payload
    * stand-in. Emits per media: complete-frame count, cut count, max and
    * total delta (all exact BIGINTs). A real decoder swaps byte L1 for
    * frame-histogram distance; the framing arithmetic and the census stay.
    *
    * Scale shape: entirely row-local array arithmetic (one projection per
    * doc — no explode, no shuffle before the final one-row-per-doc
    * select); the declarative twin of the mapPartitions frame ops above,
    * chosen here so the oracle can replay the identical integer pipeline.
    */
  def shotBoundaries(documents: DataFrame, frameBytes: Int = 64,
                     threshold: Long = 2000L): DataFrame =
    documents
      .withColumn("nf", expr(s"length(text) DIV $frameBytes"))
      .filter(col("nf") >= 2)
      .withColumn("deltas", expr(
        s"""transform(sequence(1, CAST(nf AS INT) - 1),
           |  t -> aggregate(sequence(1, $frameBytes), 0L,
           |    (acc, i) -> acc +
           |      abs(ascii(substring(text, t * $frameBytes + i, 1)) -
           |          ascii(substring(text, (t - 1) * $frameBytes + i, 1)))))"""
          .stripMargin))
      .select(col("doc_id"),
        col("nf").cast("long").as("n_frames"),
        expr(s"CAST(size(filter(deltas, d -> d > ${threshold}L)) AS BIGINT)")
          .as("n_cuts"),
        array_max(col("deltas")).as("max_delta"),
        expr("aggregate(deltas, 0L, (acc, x) -> acc + x)").as("sum_delta"))
}

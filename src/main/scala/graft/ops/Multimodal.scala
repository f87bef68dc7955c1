package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media document: opaque binary payload + typed metadata. */
final case class MediaDoc(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted features. Dimensions come from the decoder (STUBBED here). */
final case class MediaFeatures(doc_id: Long, media_type: String,
    n_bytes: Int, first_byte: Int, width: Int, height: Int, n_frames: Int)

/** One fixed-size slice of a media payload (audio segmentation shape). */
final case class MediaChunk(doc_id: Long, chunk_idx: Int, chunk: Array[Byte])

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, decoded/featurized in
  * batched per-partition passes.
  *
  * ==== STUB NOTICE ====
  * No image/audio codec libraries exist in this environment, so
  * `decodeStub` derives dimensions deterministically from the payload
  * bytes. The Spark-side plumbing — binary schema, Dataset encoders,
  * mapPartitions batching, partition sizing — is real and tested; swap
  * `decodeStub` for a JNI/codec call in production.
  *
  * Scale design: `mapPartitions` amortizes decoder initialization once per
  * partition (the expensive part for real codecs); payloads never leave
  * their partition — feature extraction is map-only over 100 TB, and the
  * narrow `MediaFeatures` output (not the blobs) is what any downstream
  * shuffle carries.
  */
object Multimodal {

  /** Attach a fake binary payload to the documents table (UTF-8 bytes of
    * the text stand in for image bytes; media_type derived from source).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic pseudo-dimensions from payload bytes.
    * Real implementation would be e.g. an image codec returning
    * (width, height, frames) — marked ??? semantics, faked for tests.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val first = if (n == 0) 0 else payload(0) & 0xff
    (64 + n % 32, 64 + first % 32, 1 + n % 8)
  }

  /** Batched per-partition feature extraction. The iterator-in /
    * iterator-out shape means constant memory per partition regardless of
    * partition size.
    */
  def extractFeatures(media: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { m =>
        val (w, h, f) = decodeStub(m.payload)
        val first = if (m.payload.isEmpty) 0 else m.payload(0) & 0xff
        MediaFeatures(m.doc_id, m.media_type, m.payload.length, first, w, h, f)
      }
    }
  }

  /** Batch-shaped variant: payloads are decoded `batchSize` at a time —
    * the shape real codec/model APIs want (one native/GPU call per batch).
    * Iterator-in/iterator-out via grouped(): at most one batch is
    * materialized per partition at any moment.
    */
  def extractFeaturesBatched(media: Dataset[MediaDoc], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real implementation hands `batch.map(_.payload)` to the codec
        // in one call; the stub decodes element-wise
        batch.map { m =>
          val (w, h, f) = decodeStub(m.payload)
          val first = if (m.payload.isEmpty) 0 else m.payload(0) & 0xff
          MediaFeatures(m.doc_id, m.media_type, m.payload.length, first, w, h, f)
        }
      }
    }
  }

  /** End-to-end: documents → payloads → features, as a DataFrame. */
  def featuresOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(attachPayload(docs).as[MediaDoc]).toDF()
  }

  /** Frame sampling: every `stride`-th frame index per video — pure
    * declarative explode over the decoded frame count (no payload copy per
    * frame; a real pipeline would pass (doc_id, frame_idx) to the decoder
    * for frame-seek extraction). Map-only at any scale.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))

  /** Fixed-size payload chunking (the audio-segmentation shape): each blob
    * becomes ceil(len/chunkBytes) rows carrying its own slice — constant
    * memory per row, downstream batches see bounded payloads.
    */
  def chunkPayload(media: Dataset[MediaDoc], chunkBytes: Int): Dataset[MediaChunk] = {
    import media.sparkSession.implicits._
    require(chunkBytes > 0)
    media.flatMap { m =>
      if (m.payload.isEmpty) Iterator(MediaChunk(m.doc_id, 0, Array.emptyByteArray))
      else m.payload.grouped(chunkBytes).zipWithIndex.map {
        case (c, i) => MediaChunk(m.doc_id, i, c)
      }
    }
  }

  /** STUB resize: deterministic byte-stride downsample standing in for a
    * pixel resample — output length is exactly targetW·targetH/64 (the
    * stub's "pixel" budget), derived only from the input bytes. Swap for a
    * codec resample in production; the batching/partition shape is what
    * matters here.
    */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val want = math.max(1, targetW * targetH / 64)
    if (payload.isEmpty) Array.emptyByteArray
    else Array.tabulate(math.min(want, payload.length))(i =>
      payload((i.toLong * payload.length / math.min(want, payload.length)).toInt))
  }

  /** Batched resize over a media dataset — same iterator-in/iterator-out
    * shape as extractFeaturesBatched. */
  def resizeAll(media: Dataset[MediaDoc], targetW: Int, targetH: Int): Dataset[MediaDoc] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      m.copy(payload = resizeStub(m.payload, targetW, targetH))))
  }
}

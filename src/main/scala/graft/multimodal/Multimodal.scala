package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image / audio / video) column support.
  *
  * Media travels as an opaque `binary` column plus a typed metadata
  * struct — the layout a 100 TB training-data lake uses (parquet with a
  * large binary column; row groups sized so a task holds a few hundred
  * items). Decode / resize / frame-sample run as *batch-shaped*
  * `mapPartitions` stages: one JVM-side iterator per partition, matching
  * the mapInPandas batching model, so a real codec (JNI or subprocess)
  * amortizes per-batch setup.
  *
  * STUB NOTE: this container has no image/audio codecs, so
  * `decodeHeader` parses a deterministic fake header (magic byte +
  * big-endian fields) and `featurize` emits a hash-seeded deterministic
  * pseudo-embedding. The Spark-side plumbing — schema, batching,
  * partitioning, column shapes — is real and tested; swap `decodeHeader`
  * / `featurize` bodies for a codec binding in production.
  */
object Multimodal {

  /** One media item: id + kind ("image" | "audio" | "video") + raw bytes. */
  case class MediaItem(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata (fields are kind-dependent; unused ones are -1). */
  case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Metadata + fixed-dim feature vector. */
  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  /** Fake 8-byte header:
    * [magic, payload, w_hi, w_lo, h_hi, h_lo, sr_hi, sr_lo], where
    * `payload` (byte 1) is kind-specific: the frame count for video,
    * unused otherwise. A real implementation replaces this with an
    * image/audio codec call.
    */
  def decodeHeader(item: MediaItem): MediaMeta = {
    val b = item.content
    def u8(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
    val width = (u8(2) << 8) | u8(3)
    val height = (u8(4) << 8) | u8(5)
    val sr = (u8(6) << 8) | u8(7)
    item.kind match {
      case "image" => MediaMeta(item.media_id, item.kind, b.length.toLong, width, height, -1, 1)
      case "audio" => MediaMeta(item.media_id, item.kind, b.length.toLong, -1, -1, sr, -1)
      case _       => MediaMeta(item.media_id, item.kind, b.length.toLong, width, height, sr, u8(1))
    }
  }

  /** Deterministic pseudo-embedding (FNV-ish rolling hash per lane).
    * Stands in for a model forward pass; dim fixed at 16.
    */
  def featurize(item: MediaItem, dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 2166136261L
    var i = 0
    while (i < item.content.length) {
      h = (h ^ (item.content(i) & 0xff)) * 16777619L
      out(i % dim) += ((h >>> 16) % 1000).toFloat / 1000f
      i += 1
    }
    out
  }

  /** Batch decode: one iterator per partition (mapInPandas-shaped). */
  def decodeMeta(items: Dataset[MediaItem]): Dataset[MediaMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition setup (codec init in a real implementation)
      it.map(decodeHeader)
    }
  }

  /** Batch featurize with deterministic output ordering left to callers. */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaFeature] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(i => MediaFeature(i.media_id, i.kind, featurize(i, dim))))
  }

  /** "Resize" stub: recompute metadata for a target box, preserving
    * aspect ratio — pure arithmetic on decoded metadata (a real resize
    * maps bytes → bytes; the plumbing and schema are what's exercised).
    */
  def resizeMeta(meta: MediaMeta, maxSide: Int): MediaMeta = {
    if (meta.width <= 0 || meta.height <= 0) meta
    else {
      val scale = math.min(1.0, maxSide.toDouble / math.max(meta.width, meta.height))
      meta.copy(
        width = math.max(1, math.round(meta.width * scale).toInt),
        height = math.max(1, math.round(meta.height * scale).toInt))
    }
  }

  /** Batch resize over decoded metadata — same per-partition batch
    * shape as decodeMeta (a real resize maps bytes → bytes with a codec
    * in the loop; this recomputes the metadata contract). */
  def resizeMetas(metas: Dataset[MediaMeta], maxSide: Int): Dataset[MediaMeta] = {
    import metas.sparkSession.implicits._
    metas.mapPartitions(_.map(m => resizeMeta(m, maxSide)))
  }

  /** Deterministic frame sampling: every k-th frame index. */
  def sampleFrameIndices(nFrames: Int, stride: Int): Seq[Int] =
    if (nFrames <= 0 || stride <= 0) Seq.empty else 0 until nFrames by stride

  /** Build a binary-column DataFrame from documents (the corpus has no
    * real media, so text bytes stand in as opaque content).
    */
  def mediaFrameFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))
      .as[MediaItem]
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaItem, MediaMeta}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def header(kind: Int, w: Int, h: Int, sr: Int, extra: Array[Byte] = Array.empty): Array[Byte] =
    Array(0x7f.toByte, kind.toByte,
      (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
      (sr >> 8).toByte, sr.toByte) ++ extra

  test("decodeMeta batch-decodes binary headers via mapPartitions") {
    val items = Seq(
      MediaItem(1L, "image", header(1, 640, 480, 0)),
      MediaItem(2L, "audio", header(2, 0, 0, 16000)),
      MediaItem(3L, "video", header(7, 1920, 1080, 0)))
      .toDS().repartition(2)
    val metas = Multimodal.decodeMeta(items).collect().sortBy(_.media_id)
    assert(metas(0) == MediaMeta(1L, "image", 8L, 640, 480, -1, 1))
    assert(metas(1).sample_rate == 16000 && metas(1).width == -1)
    assert(metas(2).n_frames == 7 && metas(2).width == 1920)
  }

  test("featurize is deterministic and batch-shaped") {
    val item = MediaItem(9L, "image", "some opaque binary payload".getBytes("UTF-8"))
    val f1 = Multimodal.featurize(item)
    val f2 = Multimodal.featurize(item)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    val ds = Seq(item).toDS()
    val viaSpark = Multimodal.extractFeatures(ds).head().feature
    assert(viaSpark.toSeq == f1.toSeq)
  }

  test("resize preserves aspect ratio and caps the long side") {
    val m = MediaMeta(1L, "image", 100L, 1920, 1080, -1, 1)
    val r = Multimodal.resizeMeta(m, 640)
    assert(r.width == 640 && r.height == 360)
    val small = Multimodal.resizeMeta(MediaMeta(2L, "image", 10L, 100, 50, -1, 1), 640)
    assert(small.width == 100 && small.height == 50) // never upscales
  }

  test("frame sampling is deterministic every-kth") {
    assert(Multimodal.sampleFrameIndices(10, 3) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndices(0, 3).isEmpty)
  }

  test("documents corpus lifts into a binary media frame") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val media = Multimodal.mediaFrameFromDocuments(spark, docs)
    val metas = Multimodal.decodeMeta(media)
    assert(metas.count() == docs.count())
    // n_bytes matches the utf8 length of the source text (ascii corpus)
    import org.apache.spark.sql.functions.col
    val joined = metas.toDF().as("m")
      .join(docs.select("doc_id", "n_chars").as("d"), col("m.media_id") === col("d.doc_id"))
      .where(col("m.n_bytes") =!= col("d.n_chars"))
    assert(joined.count() == 0)
  }
}

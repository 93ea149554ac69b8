package graft.operators

import org.apache.spark.sql.functions._

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N — round-3 surface additions.
  *
  * `llm_multimodal_decode` promotes the Multimodal batch-decode path
  * (binary column → `mapPartitions` header decode, the mapInPandas
  * batching shape) from test-only coverage to a driver-graded query
  * (round-2 verdict item 8). The media bytes are deterministically
  * synthesized from the documents corpus (utf8 text bytes as opaque
  * content, kind round-robined by doc_id), and the fake-codec header
  * arithmetic is replayed byte-for-byte by the DuckDB oracle (the
  * corpus is pure ASCII, so `ord(substr(...))` IS the byte value).
  */
object Round3Queries {

  val queries: Map[String, QFn] = Map(

    // ---- multimodal batch decode (mapPartitions, typed Dataset) ---------
    // The real thing being graded: a binary media column flowing
    // through a per-partition batch decode into a typed metadata
    // struct. Plan shape: one scan → one mapPartitions (object-mode
    // pipeline, the unavoidable cost of a codec boundary) → sort. The
    // decode itself is the documented deterministic stub (no codecs in
    // this container); schema, batching and partitioning are real.
    "llm_multimodal_decode" -> ((s, dir) => {
      val items = graft.multimodal.Multimodal.mediaFrameFromDocuments(
        s, Tables.documents(s, dir))
      graft.multimodal.Multimodal.decodeMeta(items).toDF()
        .orderBy("media_id")
    })
  )

  val oracles: Map[String, String] = Map(

    // byte i (0-based) of the utf8 content, 0 past the end — the corpus
    // is ASCII-only (verified: strlen == length for every doc at all
    // SFs), so ord(char) == byte value
    "llm_multimodal_decode" -> {
      def u8(i: Int) =
        s"(CASE WHEN strlen(text) > $i THEN ord(substr(text, ${i + 1}, 1)) ELSE 0 END)"
      s"""WITH m AS (SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes,
        |    CAST(${u8(2)} * 256 + ${u8(3)} AS INTEGER) AS w,
        |    CAST(${u8(4)} * 256 + ${u8(5)} AS INTEGER) AS h,
        |    CAST(${u8(6)} * 256 + ${u8(7)} AS INTEGER) AS sr,
        |    CAST(${u8(1)} AS INTEGER) AS payload
        |  FROM documents)
        |SELECT media_id, kind, n_bytes,
        |  CASE kind WHEN 'audio' THEN -1 ELSE w END AS width,
        |  CASE kind WHEN 'audio' THEN -1 ELSE h END AS height,
        |  CASE kind WHEN 'image' THEN -1 ELSE sr END AS sample_rate,
        |  CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN -1 ELSE payload END AS n_frames
        |FROM m ORDER BY media_id""".stripMargin
    }
  )
}

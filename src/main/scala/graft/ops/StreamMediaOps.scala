package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Registry entries for the multimodal-column and streaming surfaces. */
object StreamMediaOps {

  val all: Seq[Q] = Seq(

    // ---- multimodal metadata plumbing: binary payload + typed meta --------
    Q("q_multimodal_meta",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 32 + 1 AS INT) AS n_frames,
        |  ascii(substr(text, 1, 1)) AS first_byte
        |FROM documents""".stripMargin) { (s, d) =>
      val media = Multimodal.withBinaryPayload(Tables(s, d, "documents"), "text", "text")
      media.select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.width").as("width"),
        col("meta.n_frames").as("n_frames"),
        ascii(substring(col("text"), 1, 1)).as("first_byte"))
    },

    // ---- batched decode/feature-extract (stub codec; rows-only check) -----
    Q.noOracle("q_multimodal_features") { (s, d) =>
      val media = Multimodal.withBinaryPayload(Tables(s, d, "documents"), "text", "text")
      Multimodal.extractFeatures(media, "doc_id", "payload", dim = 16)
        .select(col("id"), size(col("features")).as("dim"), col("features"))
    },

    // ---- streaming tumbling-window agg == batch q_window_day --------------
    Q("q_stream_window",
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |  count(*) AS n, ${Tables.oSum("value")} AS total
         |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Streams.runWindowedAgg(s, d, "1 day", Seq(
          "n" -> count(lit(1)),
          "total" -> Tables.dsum(col("value"))))
        .select(to_date(col("window.start")).as("day"), col("event_type"),
          col("n"), col("total"))
    }
  )
}

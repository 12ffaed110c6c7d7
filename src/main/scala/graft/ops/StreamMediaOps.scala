package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Registry entries for the multimodal-column and streaming surfaces. */
object StreamMediaOps {

  val all: Seq[Q] = Seq(

    // ---- multimodal image decode: REAL PNGs through javax.imageio --------
    // Fixture PNGs are generated per doc_id (dimensions and pixels are
    // pure functions of the id), then decoded back; the oracle recomputes
    // the formulas — a hash match proves the encode→decode round-trip
    // recovered the true geometry and exact pixel values.
    Q("q_multimodal_meta",
      """SELECT doc_id,
        |  CAST(8 + doc_id % 24 AS INT) AS width,
        |  CAST(8 + doc_id % 16 AS INT) AS height,
        |  (doc_id * 2654435761) % 16777216 AS p00,
        |  (doc_id * 2654435761 + (8 + doc_id % 24 - 1) * 31
        |    + (8 + doc_id % 16 - 1) * 17) % 16777216 AS pwh
        |FROM documents""".stripMargin) { (s, d) =>
      val media = Multimodal.withPngPayload(
        Tables(s, d, "documents").select("doc_id"), "doc_id")
      Multimodal.imageProbe(media, "doc_id", "payload")
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

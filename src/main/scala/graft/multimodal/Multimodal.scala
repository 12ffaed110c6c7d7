package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * a typed metadata struct, plus partition-batched decode/feature-extract
  * plumbing.
  *
  * The decode step is a DETERMINISTIC STUB (this container ships no codec
  * libraries): features derive from the payload bytes via a seeded hash
  * mix. Everything around it is the real production shape — binary column
  * in, fixed-width float vector + metadata out, rows processed in batches
  * inside `mapPartitions` (the JVM analogue of `mapInPandas` batch UDFs),
  * no driver materialization, schema declared up front so Catalyst can
  * prune and the exchange layout is stable at 100 TB. */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Demo payload attach: UTF-8 bytes of a text column as the binary
    * payload + stub metadata. Real pipelines read payloads from object
    * storage; this keeps the column types honest. */
  def withBinaryPayload(df: DataFrame, textCol: String, kind: String): DataFrame =
    df.withColumn("payload", col(textCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        (octet_length(col(textCol)) % 640).cast("int").as("width"),
        (octet_length(col(textCol)) % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (octet_length(col(textCol)) % 32 + 1).cast("int").as("n_frames")))

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * Replace with a real codec (JPEG/WAV/MP4 demux) in production. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      out(i % dim) += ((h >>> 32) & 0xffff) / 65536.0f
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction: (id, payload) → (id, features).
    * Batches of `batchSize` rows model the arrow-batch shape real decode
    * UDFs want (amortized codec init per batch, bounded memory). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val pre = df.select(col(idCol).cast("long"), col(payloadCol))
    pre.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init point (codec contexts, model weights, …)
        batch.iterator.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB image resize: a real codec would re-encode the payload to
    * (w, h); here the payload passes through (no codec libs) and the typed
    * metadata records the target geometry — downstream schema and
    * partitioning behave exactly as in production. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.kind"), lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate"), col("meta.n_frames")))

  /** STUB audio resample to `rate` Hz — metadata analogue of [[resize]]. */
  def resample(df: DataFrame, rate: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.kind"), col("meta.width"), col("meta.height"),
      lit(rate).as("sample_rate"), col("meta.n_frames")))

  /** STUB frame sampler: split the payload into `n` byte chunks standing
    * in for decoded video frames (array<binary> column). */
  def frameSample(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = octet_length(col(payloadCol))
    val step = greatest(len.cast("int") / n, lit(1))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(payloadCol), (i * step + 1).cast("int"), lit(65536))))
  }
}

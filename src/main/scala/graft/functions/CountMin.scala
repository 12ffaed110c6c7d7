package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `count_min(key, depth, width)` → `array<bigint>` of `depth × width`
  * counters (row-major) — the Count-Min sketch (Cormode & Muthukrishnan,
  * J. Algorithms 2005): point-frequency estimates from O(depth·width)
  * state regardless of key cardinality, with the one-sided guarantee
  * est(k) ≥ true(k) and est(k) ≤ true(k) + N/width w.h.p. Counters add
  * pointwise, so partial aggregation and merges are exact under any
  * partitioning order — the whole sketch is a linear projection of the
  * count vector, which also means sketches of DISJOINT streams union by
  * addition (the cross-day / cross-source composition a 100 TB pipeline
  * needs; contrast Misra-Gries whose merge loses up to N/(m+1)).
  *
  * The bucket hash is deliberately PORTABLE rather than fast: row `s`
  * hashes key `k` to the first 3 bytes (big-endian) of
  * `md5(k.toString + "cm" + s)` mod `width`. Both Spark SQL and DuckDB
  * evaluate the identical `md5(CAST(k AS VARCHAR) || 'cm' || s)` string,
  * so an oracle can replay every cell exactly — estimates become
  * deterministic values, not "approximately right" hand-waves. A
  * production variant would swap in xxhash64 (also available on both
  * engines) — same structure, cheaper per row.
  *
  * Reference scope note: the reference engine ships no sketch aggregates;
  * this is part of the capability superset tier (alongside HLL and
  * Misra-Gries) for cardinality/frequency work at corpus scale.
  */
object CountMin {
  // One digest per thread, reset between calls — update() hashes depth
  // times per input row, and MessageDigest.getInstance on every call
  // would dominate the aggregate's hot path with provider lookups.
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Bucket of `key` in hash row `s` — must stay in lock-step with the
    * SQL replay: `FeatureOps.hexUniform(h, width)` over
    * `md5(CAST(k AS STRING) || 'cm' || s)` (first 6 hex nibbles,
    * big-endian, mod width). Change either side only with the other. */
  def bucket(key: Long, s: Int, width: Int): Int = {
    val md = md5.get()
    md.reset()
    val h = md.digest(s"${key}cm$s".getBytes(StandardCharsets.UTF_8))
    val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    v % width
  }
}

case class CountMinAgg(
    key: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 1, s"bad sketch dims $depth x $width")

  override def children: Seq[Expression] = Seq(key)

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"count_min requires bigint keys, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val kl = k.asInstanceOf[Long]
      var s = 0
      while (s < depth) {
        buffer(s * width + CountMin.bucket(kl, s, width)) += 1L
        s += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(key = newChildren(0))
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequency summary of capacity `m` over long keys.
  *
  * Invariants (Misra-Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12):
  *  - estimates UNDERCOUNT: est(k) ≤ true(k);
  *  - after any sequence of updates and merges totalling N items,
  *    true(k) − est(k) ≤ N/(m+1);
  *  - hence every key with true(k) > N/(m+1) is present in the summary.
  * These hold under ANY partial-aggregation order, which is what makes
  * the gate booleans of `q_heavy_hitters_approx` deterministic even
  * though the summary's tail contents are partitioning-dependent. */
final class MGBuffer(val m: Int) {
  val counts: mutable.LongMap[Long] = mutable.LongMap.empty

  def add(key: Long, w: Long): Unit = {
    if (counts.contains(key)) counts(key) += w
    else if (counts.size < m) counts.update(key, w)
    else {
      // decrement-all by the new item's weight, capped at the current
      // minimum so no count crosses zero "past" the others (batched
      // form of the classic decrement; removes at least one key when
      // d == min)
      val d = math.min(w, counts.values.min)
      shiftDown(d)
      if (w > d) add(key, w - d) // re-offer the remainder (size < m now or recurse)
    }
  }

  /** Subtract `d` from every count, dropping keys that reach ≤ 0. */
  def shiftDown(d: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[Long]
    counts.foreach { case (k, c) =>
      if (c - d <= 0) dead += k else counts.update(k, c - d)
    }
    dead.foreach(counts.remove)
  }

  /** Agarwal et al. merge: add counts pointwise, then if over capacity
    * subtract the (m+1)-th largest count from all and drop ≤ 0. */
  def mergeWith(other: MGBuffer): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > m) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val t = sorted(sorted.length - (m + 1)) // (m+1)-th largest
      shiftDown(t)
    }
  }
}

/** `misra_gries(key, m)` → `array<struct<key bigint, est bigint>>`
  * sorted by (est desc, key asc) — the bounded-memory approximate
  * heavy-hitters sketch: O(m) state per group regardless of input size,
  * map-side partial aggregation, mergeable with the N/(m+1) error
  * guarantee intact. The exact-counting `q_heavy_hitters` shuffles one
  * (key, count) pair per DISTINCT key; this summary caps state at m
  * entries per partition — the difference when the key space itself
  * does not fit (user ids at 100 TB). */
case class MisraGriesTopK(
    key: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(m >= 1, s"m must be >= 1, got $m")

  override def children: Seq[Expression] = Seq(key)

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires bigint keys, got $t")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val k = key.eval(input)
    if (k != null) buffer.add(k.asInstanceOf[Long], 1L)
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val arr = buffer.counts.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(arr.map { case (k, c) =>
      InternalRow(k, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreachEntry { (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(m)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(key = newChildren(0))
}

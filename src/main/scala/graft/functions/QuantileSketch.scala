package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable bounded-memory quantile summary over long values — the
  * MRL/KLL compactor family (Manku-Rajagopalan-Lindsay SIGMOD'98; Karnin
  * -Lang-Liberty FOCS'16) with DETERMINISTIC compaction: a level holding
  * ≥ k items is sorted and the even-indexed half is promoted with doubled
  * weight. Dropping the coin flip costs KLL's randomized-error optimality
  * but buys a worst-case guarantee that holds under ANY update/merge
  * order: one compaction of weight-w items perturbs any rank query by at
  * most w, so the buffer tracks `errBound` = Σ w over every compaction
  * it has ever performed (merges add the operands' bounds) and
  *
  *     | true_rank(estimate(q)) − q·N |  ≤  errBound
  *
  * is a certificate, not an expectation. Summary contents DO depend on
  * partitioning — like Misra-Gries, anything hash-compared downstream
  * must be a gate derived from the certificate, never the raw estimates.
  * State: O(k · log(N/k)) longs per group; map-side partial aggregation
  * keeps the shuffle at sketch size — the quantile counterpart of
  * `q_countmin`/`q_heavy_hitters_approx` when neither the rows nor the
  * distinct-value domain fit anywhere (the exact `q_percentile` path
  * needs a sort; this needs k longs per level). */
final class QSketchBuffer(val k: Int) {
  // levels(l) = unsorted items of weight 2^l
  val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long])
  var total: Long = 0L      // exact N of items represented
  var errBound: Long = 0L   // Σ weights over all compactions ever done

  def add(v: Long): Unit = {
    levels(0) += v
    total += 1
    compactFrom(0)
  }

  private def compactFrom(start: Int): Unit = {
    var l = start
    while (l < levels.length && levels(l).length >= k) {
      val sorted = levels(l).sorted
      if (l + 1 == levels.length) levels += ArrayBuffer.empty[Long]
      // keep even indices (0, 2, …): deterministic; survivors carry 2× weight
      var i = 0
      while (i < sorted.length - 1) { levels(l + 1) += sorted(i); i += 2 }
      // an odd straggler stays at this level instead of being dropped —
      // total weight must be conserved exactly
      levels(l) = if (sorted.length % 2 == 1) ArrayBuffer(sorted.last)
                  else ArrayBuffer.empty[Long]
      errBound += (1L << l)
      l += 1
    }
  }

  def mergeWith(o: QSketchBuffer): Unit = {
    while (levels.length < o.levels.length) levels += ArrayBuffer.empty[Long]
    var l = 0
    while (l < o.levels.length) { levels(l) ++= o.levels(l); l += 1 }
    total += o.total
    errBound += o.errBound
    var i = 0
    while (i < levels.length) { compactFrom(i); i += 1 }
  }

  /** Weighted items sorted by value: (value, weight). */
  def weighted(): Array[(Long, Long)] = {
    val out = ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy(t => (t._1, t._2)).toArray
  }

  /** Smallest summary value whose cumulative weight reaches
    * ceil(ppm·N/1e6) — the rank-q estimate. */
  def estimate(ppm: Long): Long = {
    val items = weighted()
    if (items.isEmpty) return 0L
    val target = math.max(1L, (ppm * total + 999999L) / 1000000L)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    items.last._1
  }
}

/** `quantile_sketch(v, k, ppms)` → `array<bigint>` =
  * `[errBound, N, est(ppms(0)), est(ppms(1)), …]`. The caller turns the
  * estimates + certificate into deterministic gate booleans against an
  * exact rank table (see `q_quantile_sketch`). */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    ppms: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer] {

  require(k >= 8, s"capacity k must be >= 8, got $k")
  require(ppms.nonEmpty && ppms.forall(p => p >= 0 && p <= 1000000),
    s"quantile ppms must be in [0, 1e6], got $ppms")

  override def children: Seq[Expression] = Seq(value)

  override def checkInputDataTypes(): TypeCheckResult =
    value.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch requires a bigint value, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QSketchBuffer = new QSketchBuffer(k)

  override def update(buffer: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = value.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: QSketchBuffer): Any =
    new GenericArrayData(
      (Seq(buffer.errBound, buffer.total) ++ ppms.map(buffer.estimate))
        .map(v => v: Any).toArray)

  override def serialize(buffer: QSketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.total)
    out.writeLong(buffer.errBound)
    out.writeInt(buffer.levels.length)
    buffer.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QSketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QSketchBuffer(k)
    buf.total = in.readLong()
    buf.errBound = in.readLong()
    val nl = in.readInt()
    buf.levels.clear()
    var l = 0
    while (l < nl) {
      val n = in.readInt()
      val lv = new ArrayBuffer[Long](n)
      var i = 0
      while (i < n) { lv += in.readLong(); i += 1 }
      buf.levels += lv
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(value = newChildren(0))
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k selection state: a size-k heap whose head is the WORST
  * kept entry (lowest score, then highest id), so a better candidate can
  * evict it in O(log k). */
final class TopKBuffer(val k: Int) {
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(TopKBuffer.WorstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (TopKBuffer.WorstFirst.compare((score, id), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((score, id))
    }
  }
}

object TopKBuffer {
  /** Greatest = worst (lowest score; ties → highest id), so the queue's
    * max is the eviction candidate. */
  val WorstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

/** `top_k_by_score(score, id, k)` → `array<struct<score double, id bigint>>`
  * sorted by (score desc, id asc), truncated to k.
  *
  * A TypedImperativeAggregate, so Spark runs it with map-side partial
  * aggregation: each input partition reduces to at most k entries per
  * group BEFORE the shuffle. For top-k-per-query patterns (ANN search)
  * this moves O(k × partitions) rows per group across the wire instead of
  * the whole scored corpus that a `row_number() OVER (PARTITION BY ...)`
  * window would shuffle — the difference at 100 TB.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score requires (double, bigint), got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buffer.insert(s, i) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    // ascending "worstness" = best (highest score, lowest id) first
    val sorted = buffer.heap.toArray.sorted(TopKBuffer.WorstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    var idx = 0
    while (idx < n) { buf.insert(in.readDouble(), in.readLong()); idx += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_matrix(xf, dim)` over `array<bigint>` rows → one
  * `array<bigint>` of `dim·dim + dim + 1` cells laid out as
  * `[P_00..P_(d-1)(d-1) row-major | S_0..S_(d-1) | n]`: the exact moment
  * matrix Σxxᵀ, the column sums Σx, and the row count — everything PCA's
  * covariance needs, in ONE aggregation with NO row explosion. The
  * explode-then-groupBy formulation materializes dim² rows per input row
  * through the hash aggregate (~20M at sf0.1); this buffer does the same
  * dim² multiply-adds in a tight JVM loop and ships exactly ONE
  * dim²+dim+1 vector per partition — partials add pointwise (the moment
  * matrix is linear in the row set), so any partitioning and merge order
  * yields the identical exact result.
  *
  * Overflow: with ×10⁴ fixed-point components bounded by |x| ≤ 10⁵,
  * each product is ≤ 10¹⁰, so ~10⁸ rows fit the signed-64 accumulator
  * with two orders of margin; past that, shard the aggregation and merge
  * the (still exact) partial vectors. */
case class GramMatrixAgg(
    xf: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def children: Seq[Expression] = Seq(xf)

  override def checkInputDataTypes(): TypeCheckResult =
    xf.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gram_matrix requires array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * dim + dim + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val a = xf.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData].toLongArray()
      require(arr.length == dim,
        s"gram_matrix(dim=$dim) saw a ${arr.length}-element row")
      var i = 0
      while (i < dim) {
        val vi = arr(i)
        buffer(dim * dim + i) += vi
        val base = i * dim
        var j = 0
        while (j < dim) { buffer(base + j) += vi * arr(j); j += 1 }
        i += 1
      }
      buffer(dim * dim + dim) += 1L
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

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(xf = newChildren(0))
}

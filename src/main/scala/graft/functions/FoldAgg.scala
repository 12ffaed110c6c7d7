package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** The reference's fold aggregate (`aggregate(combine, aggregate,
  * initial_value)`, dataset.py:593-704) as a TypedImperativeAggregate:
  * per-partition `aggFn` folds rows into a buffer of the user's type B,
  * partial buffers ship through the shuffle encoder-serialized, and
  * `combineFn` merges them — the update/combine split the reference
  * compiles per stage (`AggregateFunctions.cc:16-244`), here running
  * INSIDE the SQL engine (ObjectHashAggregate with map-side partials)
  * instead of dropping to the RDD layer and losing Tungsten.
  *
  * `children` are the dataset's visible columns; the user fold sees them
  * as a schema-attached external Row, exactly like the RDD formulation
  * it replaces. */
case class FoldAgg[B](
    children: Seq[Expression],
    inputSchema: StructType,
    zero: B,
    aggFn: (B, Row) => B,
    combineFn: (B, B) => B,
    enc: ExpressionEncoder[B],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[B] {

  override def dataType: DataType = enc.schema
  override def nullable: Boolean = false
  override def prettyName: String = "fold_agg"

  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(inputSchema)
  @transient private lazy val toCatalyst = enc.createSerializer()
  @transient private lazy val fromCatalyst = enc.resolveAndBind().createDeserializer()
  @transient private lazy val bufferProj = UnsafeProjection.create(enc.schema)

  // A fresh buffer per group: handing out the shared `zero` instance would
  // cross-contaminate groups when the user fold mutates in place (the RDD
  // formulation this replaced cloned the zero via serialization too).
  // clone() at init: for all-fixed-width schemas UnsafeRow.getBytes returns
  // the projection's REUSED backing array, which the next serialize() call
  // overwrites in place — caching the alias would corrupt the zero.
  @transient private lazy val zeroBytes: Array[Byte] =
    bufferProj(toCatalyst(zero)).getBytes.clone()
  override def createAggregationBuffer(): B = deserialize(zeroBytes.clone())

  override def update(buffer: B, input: InternalRow): B = {
    val vals = new Array[Any](children.length)
    var i = 0
    while (i < children.length) { vals(i) = children(i).eval(input); i += 1 }
    aggFn(buffer, toScala(InternalRow.fromSeq(vals.toSeq)).asInstanceOf[Row])
  }

  override def merge(buffer: B, other: B): B = combineFn(buffer, other)

  override def eval(buffer: B): Any = toCatalyst(buffer).copy()

  override def serialize(buffer: B): Array[Byte] =
    bufferProj(toCatalyst(buffer)).getBytes.clone() // detach from reused buffer

  override def deserialize(bytes: Array[Byte]): B = {
    val row = new UnsafeRow(enc.schema.length)
    row.pointTo(bytes, bytes.length)
    fromCatalyst(row)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FoldAgg[B] =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FoldAgg[B] =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FoldAgg[B] =
    copy(children = newChildren)
}

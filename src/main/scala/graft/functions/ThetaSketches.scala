package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Intersection, SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch set algebra (Apache DataSketches) — the mergeable-sketch
  * family HLL cannot provide: HLL unions, but only THETA sketches support
  * INTERSECTION and DIFFERENCE, the operations behind "how many documents
  * appear in BOTH shards / crawls / snapshots" and "how many are new in
  * today's batch" at 100 TB without a rescan or an exact distinct join.
  *
  * Shapes (all registered as SQL functions via [[graft.GraftExtensions]]):
  *  - `theta_sketch_agg(value[, lgK])`  — build a sketch column from raw
  *    values (aggregate; map-side partial = sketch union, so a hot group
  *    costs one bounded sketch, never a value buffer);
  *  - `theta_union_agg(sketch)` / `theta_intersect_agg(sketch)` — merge
  *    STORED sketch columns up to coarser keys (pure sketch algebra:
  *    cost O(sketches), independent of raw data volume);
  *  - `theta_estimate(sketch)` — distinct estimate;
  *  - `theta_difference(a, b)` — A-and-not-B sketch (scalar set op).
  *
  * The aggregates are `TypedImperativeAggregate`s — the same mechanism as
  * Spark's own hll_sketch_agg: the live sketch object rides in the
  * aggregation buffer and is serialized only at partial/final exchange
  * boundaries, not per row (a UDAF over a binary buffer would pay
  * deserialize+reserialize on EVERY row).
  *
  * Determinism/exactness contract: below the sketch's nominal-entry count
  * (2^lgK) a theta sketch is in EXACT mode — estimates are exact integers
  * and set ops are exact — which is what makes the declared query
  * oracle-checkable; above it, the relative standard error is
  * ≈ 1/√(2^lgK) (unit-asserted). Strings hash by UTF-8 BYTES (not chars)
  * so Spark's UTF8String and any other writer agree on the same sketch.
  */
object ThetaSketches {
  val DefaultLgK = 14 // 16384 nominal entries; ~0.8% RSE in estimation mode

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  private[functions] def newIntersection(): Intersection =
    SetOperation.builder().buildIntersection()
  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketch.wrap(Memory.wrap(bytes))

  // Column-level API (DataFrame twin of the SQL registrations).
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftSqlShim.{column, expression}
  def thetaSketch(value: Column, lgK: Int = DefaultLgK): Column =
    column(ThetaSketchAgg(expression(value), lgK).toAggregateExpression())
  def thetaUnion(sketch: Column): Column =
    column(ThetaUnionAgg(expression(sketch)).toAggregateExpression())
  def thetaIntersect(sketch: Column): Column =
    column(ThetaIntersectAgg(expression(sketch)).toAggregateExpression())
  def thetaEstimate(sketch: Column): Column =
    column(ThetaEstimate(expression(sketch)))
  def thetaDifference(a: Column, b: Column): Column =
    column(ThetaDifference(expression(a), expression(b)))
}

/** Build-from-values aggregate: `theta_sketch_agg(value[, lgK])`. */
case class ThetaSketchAgg(
    child: Expression, lgK: Int = ThetaSketches.DefaultLgK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"lgK=$lgK outside [4, 26]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DoubleType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"theta_sketch_agg: unsupported input type $dt")
    }

  override def createAggregationBuffer(): Union = ThetaSketches.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      // UTF-8 bytes, not java chars: any engine hashing the same bytes
      // builds an intersectable sketch
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType  => buffer.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketches.newUnion(lgK)
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Merge stored sketch columns: `theta_union_agg(sketch)`. */
case class ThetaUnionAgg(
    child: Expression, lgK: Int = ThetaSketches.DefaultLgK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union = ThetaSketches.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketches.newUnion(lgK)
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Intersect stored sketch columns: `theta_intersect_agg(sketch)` — NULL
  * over a group with no non-null sketches (an empty intersection has no
  * universe to be exact about, unlike an empty union). */
case class ThetaIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Intersection]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect_agg"

  override def createAggregationBuffer(): Intersection =
    ThetaSketches.newIntersection()

  override def update(buffer: Intersection, input: InternalRow): Intersection = {
    val v = child.eval(input)
    if (v != null)
      buffer.intersect(ThetaSketches.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Intersection, other: Intersection): Intersection = {
    if (other.hasResult) buffer.intersect(other.getResult)
    buffer
  }

  override def eval(buffer: Intersection): Any =
    if (buffer.hasResult) buffer.getResult.toByteArray else null

  override def serialize(buffer: Intersection): Array[Byte] =
    if (buffer.hasResult) buffer.getResult.toByteArray else Array.emptyByteArray
  override def deserialize(bytes: Array[Byte]): Intersection = {
    val i = ThetaSketches.newIntersection()
    if (bytes.nonEmpty) i.intersect(ThetaSketches.wrap(bytes))
    i
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaIntersectAgg =
    copy(child = newChildren.head)
}

/** `theta_estimate(sketch)` → distinct-count estimate (exact below the
  * sketch's nominal entries). Cold-path scalar: CodegenFallback. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(input: Any): Any =
    ThetaSketches.wrap(input.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_difference(a, b)` → sketch of A-and-not-B. */
case class ThetaDifference(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_difference"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(ThetaSketches.wrap(a.asInstanceOf[Array[Byte]]))
    op.notB(ThetaSketches.wrap(b.asInstanceOf[Array[Byte]]))
    op.getResult(true).toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDifference =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketch columns — the fourth pillar of
  * the mergeable-sketch family (distinct = HLL/theta, quantiles = KLL,
  * frequencies = THIS): which sources/domains/tokens dominate a shard,
  * answerable later over any union of shards by merging stored sketch
  * columns, never rescanning raw data. The exact twin ([[
  * graft.ops.TextAnalysis.vocabulary]]) re-aggregates the corpus per
  * question; a sketch column is built once.
  *
  * Registered SQL surface: `freq_sketch_agg(item[, maxMapSize])` (build,
  * string items), `freq_merge_agg(sketch[, maxMapSize])` (merge stored
  * columns), `freq_items(sketch)` → array<struct<item, estimate, lower,
  * upper>> sorted by estimate descending (NO_FALSE_NEGATIVES: nothing
  * frequent is missed; compose with explode + ORDER BY + LIMIT for a
  * deterministic top-k).
  *
  * Accuracy contract (unit-asserted in FreqSketchSpec): while the number
  * of distinct items stays under the sketch's map capacity
  * (0.75·maxMapSize) no purge ever happens, `getMaximumError` is 0 and
  * every count is EXACT — what makes the declared query oracle-checkable;
  * beyond that, counts carry the documented ±n/maxMapSize-style error
  * surfaced through the lower/upper bound fields rather than hidden. */
object FreqSketches {
  val DefaultMaxMapSize = 1024 // power of 2; exact below 768 distinct items

  private[functions] val serde = new ArrayOfStringsSerDe()
  private[functions] def newSketch(maxMapSize: Int): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  // Column-level API (DataFrame twin of the SQL registrations).
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftSqlShim.{column, expression}
  def freqSketch(item: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    column(FreqSketchAgg(expression(item), maxMapSize).toAggregateExpression())
  def freqMerge(sketch: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    column(FreqMergeAgg(expression(sketch), maxMapSize).toAggregateExpression())
  def freqItems(sketch: Column): Column =
    column(FreqItems(expression(sketch)))
}

/** Build-from-values aggregate: `freq_sketch_agg(item[, maxMapSize])`. */
case class FreqSketchAgg(
    child: Expression, maxMapSize: Int = FreqSketches.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize=$maxMapSize must be a power of 2 >= 8")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch_agg"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"freq_sketch_agg: unsupported input type $dt (string only)")
    }

  override def createAggregationBuffer(): ItemsSketch[String] =
    FreqSketches.newSketch(maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketches.serde)
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketches.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketches.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

/** Merge stored sketch columns: `freq_merge_agg(sketch[, maxMapSize])`. */
case class FreqMergeAgg(
    child: Expression, maxMapSize: Int = FreqSketches.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_merge_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    FreqSketches.newSketch(maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqSketches.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketches.serde)
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketches.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketches.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = newChildren.head)
}

/** `freq_items(sketch)` → array<struct<item, estimate, lower, upper>>
  * sorted by estimate descending (NO_FALSE_NEGATIVES). */
case class FreqItems(child: Expression)
  extends UnaryExpression with CodegenFallback
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items"

  override protected def nullSafeEval(input: Any): Any = {
    val sk = FreqSketches.heapify(input.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map(r => InternalRow(
      UTF8String.fromString(r.getItem), r.getEstimate,
      r.getLowerBound, r.getUpperBound)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

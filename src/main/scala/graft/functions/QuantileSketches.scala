package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KLL quantile sketch columns (Apache DataSketches) — the QUANTILE twin
  * of the theta/HLL distinct sketches: `approx_percentile` answers a
  * quantile question once, but its state is not a value you can store.
  * A KLL sketch column IS storable state — build per shard/day once,
  * write the binary next to the data, and answer any later quantile
  * question over any union of shards by merging sketches, never
  * rescanning raw values. That build-once/merge-later algebra is the
  * 100 TB telemetry pattern (per-file length distributions, per-crawl
  * quality score quantiles) this engine's write manifests pair with.
  *
  * Registered SQL surface: `kll_sketch_agg(value[, k])` (build),
  * `kll_merge_agg(sketch[, k])` (merge stored columns),
  * `kll_quantile(sketch, q)` (query; INCLUSIVE search criteria — the
  * smallest stored value whose inclusive rank ≥ q).
  *
  * Accuracy contract (unit-asserted in QuantileSketchSpec): with n ≤ k
  * retained values the sketch holds EVERY value and quantiles are exact
  * order statistics; beyond that, normalized RANK error is ~1.65/k·100%
  * (k=200 ⇒ ~0.8% of rank) with compaction randomness inside that bound.
  * Same TypedImperativeAggregate mechanics as [[ThetaSketches]]: the live
  * sketch rides the buffer, serialization happens only at exchange
  * boundaries. */
object QuantileSketches {
  val DefaultK = 200 // the library default: ~0.8% normalized rank error

  private[functions] def newSketch(k: Int): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  // Column-level API (DataFrame twin of the SQL registrations).
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftSqlShim.{column, expression}
  def kllSketch(value: Column, k: Int = DefaultK): Column =
    column(KllSketchAgg(expression(value), k).toAggregateExpression())
  def kllMerge(sketch: Column, k: Int = DefaultK): Column =
    column(KllMergeAgg(expression(sketch), k).toAggregateExpression())
  def kllQuantile(sketch: Column, q: Column): Column =
    column(KllQuantile(expression(sketch), expression(q)))
}

/** Build-from-values aggregate: `kll_sketch_agg(value[, k])`. */
case class KllSketchAgg(
    child: Expression, k: Int = QuantileSketches.DefaultK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k=$k outside [8, 65535]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | FloatType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"kll_sketch_agg: unsupported input type $dt")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    QuantileSketches.newSketch(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case LongType    => buffer.update(v.asInstanceOf[Long].toDouble)
      case FloatType   => buffer.update(v.asInstanceOf[Float].toDouble)
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    QuantileSketches.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Merge stored sketch columns: `kll_merge_agg(sketch[, k])`. */
case class KllMergeAgg(
    child: Expression, k: Int = QuantileSketches.DefaultK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    QuantileSketches.newSketch(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(QuantileSketches.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    QuantileSketches.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** `kll_quantile(sketch, q)` — NULL for an empty sketch (a quantile of
  * nothing is not a number, not an exception). Cold-path scalar. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  // Strict BinaryType on the sketch (a string column must fail at ANALYSIS,
  // not as a cryptic DataSketches error mid-job) while the rank accepts any
  // numeric — the documented SQL surface writes a bare 0.5, which Spark
  // parses as DECIMAL(1,1).
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: NumericType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"kll_quantile expects (binary sketch, numeric rank), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(sketchBytes: Any, q: Any): Any = {
    val rank = q match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
    }
    require(rank >= 0.0 && rank <= 1.0, s"quantile rank $rank outside [0, 1]")
    val sk = QuantileSketches.heapify(sketchBytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

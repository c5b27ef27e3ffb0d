package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path: dot product of two
  * numeric arrays, accumulated left-to-right in double.
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function chain,
  * which allocates a lambda frame per element — measured ~4× slower on the
  * sf0.1 near-dup scan. Same fold order ⇒ bit-identical results (and thus
  * still reproducible by the DuckDB list_reduce oracle).
  *
  * The reference's analog is its per-type compiled kernels (e.g. the SIMD
  * sum unrolling, /root/reference/AggregateFunctions/AggregateFunctionSum.h:50-70);
  * on Spark the idiomatic equivalent is exactly this: a whole-stage-codegen
  * expression the JIT can vectorize.
  *
  * Nulls: null array → null result; null ELEMENTS are not supported
  * (embeddings are dense); lengths are folded to the shorter array like
  * zip_with-without-nulls would.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // tinyint arrays are the QUANTIZED-embedding path (round 14): an int8
  // product sum is ≤ 127²·dim — exact in double at any realistic dim, so
  // quantized scores stay bit-reproducible (and DuckDB-replicable)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t =>
        t == FloatType || t == DoubleType || t == ByteType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<float|double|tinyint> args, got $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), lb.numElements())
    def get(e: Expression, arr: ArrayData, i: Int): Double =
      elemType(e) match {
        case FloatType => arr.getFloat(i).toDouble
        case ByteType => arr.getByte(i).toDouble
        case _ => arr.getDouble(i)
      }
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += get(left, la, i) * get(right, lb, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, v: String, i: String): String = elemType(e) match {
      case FloatType => s"((double) $v.getFloat($i))"
      case ByteType => s"((double) $v.getByte($i))"
      case _ => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED arrays (string or long) via linear
  * merge — the verification kernel for LSH-candidate Jaccard. Spark's
  * `array_intersect` builds a per-row hash set (alloc-heavy: measured 238 s
  * over 345k candidate pairs at sf0.1); a merge over pre-sorted shingle sets
  * is allocation-free and codegen-friendly. Arrays must be sorted and
  * duplicate-free (array_sort of collect_set output). The long variant is
  * the scale path: fixed-width sets cache/shuffle far cheaper than strings.
  */
case class SortedArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private lazy val isLongElems = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size needs two array<string> or two array<long> args, got $other")
  }

  // NULL ELEMENTS are a loud error, not a silent miscount: getLong on a
  // null slot would read 0 and count spurious matches. (Schemas may be
  // conservatively nullable — only actual null values are rejected;
  // collect_set / array_sort outputs, the intended inputs, never have any.)
  private def nullElement(): Nothing =
    throw new IllegalArgumentException(
      "sorted_intersect_size: null array elements are not supported")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    val (na, nb) = (la.numElements(), lb.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (la.isNullAt(i) || lb.isNullAt(j)) nullElement()
      val cmp =
        if (isLongElems) java.lang.Long.compare(la.getLong(i), lb.getLong(j))
        else la.getUTF8String(i).compareTo(lb.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (isLongElems) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_size: null array elements are not supported");
         |  }
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectSize =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper for [[SortedArrayIntersectSize]]. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftSqlShim.column(SortedArrayIntersectSize(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Column-level dot product backed by [[VectorDot]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlShim.column(VectorDot(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}

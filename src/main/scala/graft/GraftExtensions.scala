package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SortedArrayIntersectSize, VectorDot}

/** SparkSessionExtensions hook: registers the engine's native expressions as
  * SQL functions — the analog of the reference registering "ch.*" kernels in
  * the arrow FunctionRegistry (tests/ut_aggregator.cpp:20-31).
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; then
  * `SELECT vec_dot(a, b)`, `SELECT sorted_intersect_size(x, y)` work in SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedArrayIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedArrayIntersectSize(args(0), args(1))))
  }
}

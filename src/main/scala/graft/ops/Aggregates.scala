package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation extras beyond plain groupBy().agg() — the reference features
  * Catalyst has no direct equivalent for (SURVEY §2.3/§4).
  */
object Aggregates {

  /** GROUP BY row limit with overflow row — the reference's
    * `max_rows_to_group_by` + `OverflowMode::ANY` (Aggregator.cpp:531-550,
    * 468-495): at most `maxGroups` keys keep exact per-key aggregates and
    * every other row lands in one "overflow" group (NULL key).
    *
    * The reference keeps whichever keys it sees FIRST (order-dependent);
    * distributed execution makes that nondeterministic, so this variant
    * keeps the `maxGroups` SMALLEST keys — same resource-guard semantics,
    * deterministic and oracle-checkable.
    *
    * Plan shape: one aggregation pass, then TakeOrdered(maxGroups) on the
    * (small) group frame + a broadcast anti-join to fold the rest into the
    * overflow row — no global sort of the data, no second scan.
    *
    * @param grouped    already-aggregated frame: one row per key
    * @param keyCol     the group key column in `grouped`
    * @param maxGroups  max retained groups
    * @param mergeAggs  how to merge retained-stage aggregates into the
    *                   overflow row (aliases must match `grouped` columns)
    */
  def withOverflowRow(
      grouped: DataFrame, keyCol: String, maxGroups: Int,
      mergeAggs: Seq[Column]): DataFrame = {
    val kept = grouped.orderBy(col(keyCol).asc_nulls_first).limit(maxGroups)
    val overflowSrc = grouped.join(
      broadcast(kept.select(col(keyCol))), Seq(keyCol), "left_anti")
    val overflow = overflowSrc
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .withColumn(keyCol, lit(null).cast(grouped.schema(keyCol).dataType))
      .withColumn("__n", lit(1))
    // Emit the overflow row only if overflow actually happened (the
    // reference emits it only when rows spilled past the cap).
    val overflowNonEmpty = overflow.join(
      broadcast(overflowSrc.limit(1).select(lit(1).as("__n"))), Seq("__n"), "left_semi")
      .drop("__n")
    kept.unionByName(overflowNonEmpty.select(kept.columns.map(col): _*))
  }

  /** The reference's "any" aggregate (first non-null in stream order,
    * AggregateFunctionMinMaxAny.h:526-534) as a typed Aggregator — the
    * UDAF extension-point demo mirroring the arrow FunctionRegistry
    * registration pattern (tests/ut_aggregator.cpp:20-31). Order-dependent
    * under parallel merge, exactly like the reference. */
  class AnyLongAgg extends Aggregator[java.lang.Long, (Boolean, Long), java.lang.Long] {
    def zero: (Boolean, Long) = (false, 0L)
    def reduce(b: (Boolean, Long), a: java.lang.Long): (Boolean, Long) =
      if (b._1 || a == null) b else (true, a.longValue())
    def merge(a: (Boolean, Long), b: (Boolean, Long)): (Boolean, Long) =
      if (a._1) a else b
    def finish(r: (Boolean, Long)): java.lang.Long = if (r._1) r._2 else null
    def bufferEncoder: Encoder[(Boolean, Long)] = Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong)
    def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
  }

  /** Register the house aggregates on a session — the analog of the
    * reference registering "ch.any" etc. in the arrow FunctionRegistry. */
  def registerHouseFunctions(spark: SparkSession): Unit =
    spark.udf.register("graft_any_long", udaf(new AnyLongAgg))
}

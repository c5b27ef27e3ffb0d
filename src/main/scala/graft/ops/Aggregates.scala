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
    * Plan shape: ONE aggregation pass of the base table — the group frame
    * is persisted (memory-and-disk) before the fan-out, so `kept` and the
    * overflow fold both read the cache instead of re-running the
    * scan+shuffle (round 7 executed the base aggregation three times:
    * once per fan-out branch plus a `limit(1)` existence probe). On the
    * cached frame: TakeOrdered(maxGroups) + a broadcast anti-join — no
    * global sort of the data, no unpartitioned window (a `rank()` over
    * the whole group frame would funnel every key through one partition;
    * at 100 TB the key cardinality can be billions).
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
    // Cache the (small: one row per key) group frame — the expensive base
    // aggregation materializes exactly once. Lazy: no job runs here.
    // Lifetime contract (as for Dedup/Similarity/Packing's persisted
    // frames): the entry lives in the session's CacheManager until
    // `unpersist()`/`clearCache()` — long-lived sessions calling this per
    // batch should clear between calls (Verify and Bench both do). An
    // input the caller already persisted at another level is used as-is
    // rather than fighting over the storage level.
    val groupFrame = scala.util.Try(grouped.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)).getOrElse(grouped)
    val kept = groupFrame.orderBy(col(keyCol).asc_nulls_first).limit(maxGroups)
    // NULL-SAFE anti-join: a NULL group key is a legitimate group (and
    // sorts first, so it is always retained); plain equality would never
    // match it, leaving it in the overflow source too — double-counted in
    // the overflow row and emitting a spurious overflow when none occurred.
    val overflowSrc = groupFrame.join(
      broadcast(kept.select(col(keyCol).as("__kept_k"))),
      col(keyCol) <=> col("__kept_k"), "left_anti")
    // The overflow row is emitted only if overflow actually happened (the
    // reference emits it only when rows spilled past the cap) — the
    // existence test rides in the same aggregation as the merge (a
    // count(*) column filtered afterwards), not a separate probe pass.
    val overflow = overflowSrc
      .agg(count(lit(1)).as("__ovn"), mergeAggs: _*)
      .filter(col("__ovn") > 0)
      .drop("__ovn")
      .withColumn(keyCol, lit(null).cast(grouped.schema(keyCol).dataType))
    kept.unionByName(overflow.select(kept.columns.toIndexedSeq.map(col): _*))
  }

  /** GROUP BY overflow modes — the reference's `OverflowMode` enum
    * (arrow_clickhouse_types.h:24-34) applied to an aggregated frame
    * (Aggregator.cpp:531-550 checks the cap as new keys are admitted).
    * Distributed execution has no "first seen" order, so like
    * [[withOverflowRow]] the deterministic variant keeps the `maxGroups`
    * SMALLEST keys — same resource-guard contract, oracle-checkable. */
  sealed trait OverflowMode
  object OverflowMode {
    /** Excess keys fold into one overflow row (NULL key) — [[withOverflowRow]]. */
    case object Any extends OverflowMode
    /** Exceeding the cap is an error: the query fails at execution time. */
    case object Throw extends OverflowMode
    /** Stop admitting new keys past the cap; retained keys keep their full
      * aggregates, excess keys are dropped (no overflow row). Key order for
      * retention is `asc_nulls_first` — a NULL group key sorts SMALLEST and
      * is therefore always retained (contract, and what any oracle must
      * mirror with an explicit NULLS FIRST). */
    case object Break extends OverflowMode
  }

  /** Apply a group-count cap to an aggregated frame under the given
    * overflow mode. `mergeAggs` is only consulted for [[OverflowMode.Any]].
    *
    * THROW stays fully lazy and distributed: the group count rides in as a
    * broadcast scalar and a per-row guard raises once it exceeds the cap —
    * no driver-side action at plan-construction time. */
  def withGroupLimit(
      grouped: DataFrame, keyCol: String, maxGroups: Int,
      mode: OverflowMode, mergeAggs: Seq[Column] = Nil): DataFrame = mode match {
    case OverflowMode.Any =>
      withOverflowRow(grouped, keyCol, maxGroups, mergeAggs)
    case OverflowMode.Break =>
      grouped.orderBy(col(keyCol).asc_nulls_first).limit(maxGroups)
    case OverflowMode.Throw =>
      // Same single-materialization discipline (and cache-lifetime
      // contract) as withOverflowRow: the count probe and the guarded
      // pass-through both read the cache.
      val g = scala.util.Try(grouped.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)).getOrElse(grouped)
      val cnt = g.agg(count(lit(1)).as("__gcnt"))
      g.crossJoin(broadcast(cnt))
        .filter(
          when(col("__gcnt") <= maxGroups, lit(true))
            .otherwise(raise_error(concat(
              lit("GROUP BY overflow (OverflowMode.THROW): "),
              col("__gcnt").cast("string"),
              lit(s" groups > max_rows_to_group_by=$maxGroups"))).cast("boolean")))
        .drop("__gcnt")
  }

  /** The reference's "any" aggregate (first non-null in stream order,
    * AggregateFunctionMinMaxAny.h:526-534) as a typed Aggregator — the
    * UDAF extension-point demo mirroring the arrow FunctionRegistry
    * registration pattern (tests/ut_aggregator.cpp:20-31). Order-dependent
    * under parallel merge, exactly like the reference, and type-generic
    * like the reference's template (instantiated per boxed element type so
    * null flows through encoders unharmed). */
  class AnyAgg[T >: Null <: AnyRef](elem: Encoder[T])
      extends Aggregator[T, (Boolean, T), T] {
    def zero: (Boolean, T) = (false, null)
    def reduce(b: (Boolean, T), a: T): (Boolean, T) =
      if (b._1 || a == null) b else (true, a)
    def merge(a: (Boolean, T), b: (Boolean, T)): (Boolean, T) =
      if (a._1) a else b
    def finish(r: (Boolean, T)): T = if (r._1) r._2 else null
    def bufferEncoder: Encoder[(Boolean, T)] =
      Encoders.tuple(Encoders.scalaBoolean, elem)
    def outputEncoder: Encoder[T] = elem
  }

  /** Deterministic per-group k-sample as a MERGEABLE aggregate: keep the k
    * elements with the smallest md5-derived hash ("bottom-k sketch"). Fully
    * order-independent — reduce/merge keep a sorted bounded buffer — so it
    * runs as partial/final hash aggregation with NO per-group sort shuffle;
    * the window-function formulation (`row_number over (order by hash)`)
    * sorts every group's full contents instead, which is exactly what you
    * cannot afford per key at corpus scale. The hash is the same md5-based
    * 32-bit construction used everywhere else, so a SQL oracle reproduces
    * the selection bit-for-bit. Returns the sampled values sorted by
    * (hash, value) for a deterministic output order.
    *
    * SET semantics: duplicate input VALUES collapse into one slot (the
    * buffer is `.sorted.distinct`), so for non-unique columns this is a
    * distinct-value (KMV-style) sample of up to k DISTINCT values, not a
    * multiset sample — the property that makes merge idempotent and the
    * sketch order-independent. */
  class BottomKByHashAgg(k: Int, salt: String)
      extends Aggregator[java.lang.Long, Seq[(Long, Long)], Seq[Long]] {
    require(k > 0)
    // One digest instance per task (the aggregator is serialized to
    // executors; transient lazy re-creates it there) — not one per row.
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    private def hashOf(v: Long): Long = {
      md.update((salt + v.toString).getBytes("UTF-8"))
      val h = md.digest()
      ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) | ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    }
    def zero: Seq[(Long, Long)] = Vector.empty
    def reduce(b: Seq[(Long, Long)], a: java.lang.Long): Seq[(Long, Long)] = {
      if (a == null) return b
      val e = (hashOf(a.longValue()), a.longValue())
      // Hot path: a full buffer rejects non-improving rows without any
      // allocation or re-sort (the common case once the sketch warms up).
      if (b.size >= k && implicitly[Ordering[(Long, Long)]].gteq(e, b.last)) b
      else ((e +: b).sorted.distinct).take(k)
    }
    def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (a ++ b).sorted.distinct.take(k)
    def finish(r: Seq[(Long, Long)]): Seq[Long] = r.map(_._2)
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * Spark's `hll_sketch_agg`) — the incremental-analytics pattern at
    * 100 TB: build per-shard/per-day sketch COLUMNS once, store them as
    * binary, and answer any later union (per week, per language, overall)
    * by merging sketches — never rescanning the raw data. The reference's
    * aggregate states are process-local pointers (SURVEY §1.2:
    * serialization stubbed); Spark sketches are the distributed answer to
    * the same partial-state idea.
    *
    * @param lgK log2 of the sketch's K parameter: error ≈ 1.04/√2^lgK
    *            (lgK 12 ⇒ ~1.6% relative standard error, 4 KB sketches) */
  def hllSketches(
      df: DataFrame, keys: Seq[String], valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge stored sketches up to a coarser key set and estimate. Pure
    * sketch algebra — input rows are (keys, hll binary), cost is
    * O(sketches), independent of the original data volume. */
  def hllMergeEstimate(
      sketches: DataFrame, keys: Seq[String], sketchCol: String = "hll"): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("nd_estimate"))

  /** The full atomic-type instantiation table for [[AnyAgg]] — the analog
    * of the reference's type-generic single-value template
    * (AggregateFunctionMinMaxAny.h:18-159, instantiated per fixed-width
    * type plus the string state). Keyed by the SQL-facing suffix used in
    * `graft_any_<suffix>`; each entry pairs the boxed external encoder the
    * typed Aggregator needs (null must flow through unharmed, so primitive
    * encoders are out). Decimal rides Spark's UDAF input cast to the
    * system default DecimalType — exact for any narrower column. */
  private def anyAggInstances: Seq[(String, org.apache.spark.sql.expressions.UserDefinedFunction)] = {
    def inst[T >: Null <: AnyRef : scala.reflect.runtime.universe.TypeTag](
        e: Encoder[T]) = udaf(new AnyAgg[T](e))
    Seq(
      "boolean" -> inst(Encoders.BOOLEAN),
      "byte" -> inst(Encoders.BYTE),
      "short" -> inst(Encoders.SHORT),
      "int" -> inst(Encoders.INT),
      "long" -> inst(Encoders.LONG),
      "float" -> inst(Encoders.FLOAT),
      "double" -> inst(Encoders.DOUBLE),
      "string" -> inst(Encoders.STRING),
      "decimal" -> inst(Encoders.DECIMAL),
      "date" -> inst(Encoders.DATE),
      "timestamp" -> inst(Encoders.TIMESTAMP),
      "binary" -> inst(Encoders.BINARY))
  }

  /** Register the house aggregates on a session — the analog of the
    * reference registering "ch.any" etc. in the arrow FunctionRegistry.
    * One instantiation per atomic element type, covering the same surface
    * as the reference's SingleValueData template family. */
  def registerHouseFunctions(spark: SparkSession): Unit = {
    anyAggInstances.foreach { case (suffix, fn) =>
      spark.udf.register(s"graft_any_$suffix", fn)
    }
    spark.udf.register("graft_bottom_k", udaf(new BottomKByHashAgg(3, "bk")))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / merge / dedup surface of the reference (SURVEY §2.4).
  *
  * The reference's SortingBlockInputStream / MergeSortingBlockInputStream /
  * MergingSortedInputStream collapse to Spark sorts: Catalyst's SortExec
  * spills (the reference's external-sort path throws "Not implemented",
  * DataStreams/MergeSortingBlockInputStream.cpp:39-56), TakeOrderedAndProject
  * covers sorted-limit, and a union of sorted runs re-sorted by Catalyst is
  * the k-way merge. What needs real code is the replace-key dedup semantics.
  */
object Sorts {

  /** One sort key: column + direction. Reference SortDescription
    * (Common/SortDescription.h:11-22). Nulls sort FIRST in the reference
    * (CompositeKey.h:265-273) — Spark's asc_nulls_first / desc_nulls_first
    * reproduce that exactly. */
  final case class SortKey(name: String, ascending: Boolean = true) {
    def column: Column =
      if (ascending) col(name).asc_nulls_first else col(name).desc_nulls_first
    def reversed: SortKey = copy(ascending = !ascending)
  }

  /** Total sort (reference MergeSortingBlockInputStream — buffer + k-way
    * merge; here: range-partitioned distributed sort with spill). */
  def sort(df: DataFrame, keys: Seq[SortKey]): DataFrame =
    df.orderBy(keys.map(_.column): _*)

  /** Per-partition sort, the analog of the reference's batch-local
    * SortingBlockInputStream (YdbModes/SortingBlockInputStream.cpp:8-23):
    * no shuffle, each partition independently ordered. */
  def sortWithinPartitions(df: DataFrame, keys: Seq[SortKey]): DataFrame =
    df.sortWithinPartitions(keys.map(_.column): _*)

  /** Reverse read order (reference ReplaceSortDescription.reverse +
    * Inverse(), YdbModes/ReplaceSortDescription.h:41-46). */
  def reverseSort(df: DataFrame, keys: Seq[SortKey]): DataFrame =
    sort(df, keys.map(_.reversed))

  /** Replace-key dedup — ReplacingMergeTree/MVCC semantics: keep only the
    * FIRST row per replace-key in sort order (reference MergeImpl,
    * YdbModes/MergingSortedInputStream.cpp:227-289; proven semantics
    * ut_modes.cpp:529-569 — sort {pk ASC, snap DESC}, replace by pk ⇒ the
    * latest snapshot survives).
    *
    * Implementation: row_number over Window.partitionBy(replaceKey)
    * .orderBy(sortKeys) — a single hash-shuffle on the replace key, no
    * global sort needed. At 100 TB the shuffle partitions by replaceKey
    * hash, so skew only matters for pathologically hot keys (AQE skew
    * handling applies; keys here are PK-like by construction).
    *
    * `sortKeys` must order rows WITHIN a replace-key group (e.g. snapshot
    * DESC); include a unique tiebreaker for full determinism.
    */
  def replaceDedup(df: DataFrame, replaceKey: Seq[String], sortKeys: Seq[SortKey]): DataFrame = {
    val w = Window.partitionBy(replaceKey.map(col): _*).orderBy(sortKeys.map(_.column): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Sorted-merge of pre-sorted runs (reference MergingSortedInputStream,
    * k-way heap merge): in Spark, union-all then a total sort — Catalyst
    * owns the merge strategy. Optionally applies replace-key dedup like the
    * reference's merge does. */
  def mergeSorted(
      runs: Seq[DataFrame],
      sortKeys: Seq[SortKey],
      replaceKey: Seq[String] = Nil): DataFrame = {
    val unioned = runs.reduce(_ unionAll _)
    if (replaceKey.isEmpty) sort(unioned, sortKeys)
    else sort(replaceDedup(unioned, replaceKey, sortKeys), sortKeys)
  }

  /** Top-k: orderBy + limit compiles to TakeOrderedAndProject — each
    * partition keeps k rows, driver merges; no full sort at scale. */
  def topK(df: DataFrame, keys: Seq[SortKey], k: Int): DataFrame =
    sort(df, keys).limit(k)

  /** Skew-safe two-stage replace-dedup for 100 TB corpora (SURVEY §7 risk 4):
    * stage 1 dedups within (replaceKey, salt) partitions — shrinking a hot
    * key's rows by the duplication factor before any single reducer sees it —
    * stage 2 dedups the per-salt winners. Identical result to
    * [[replaceDedup]] for any salt count (dedup is idempotent and the final
    * stage sees one candidate per salt). */
  def replaceDedupSalted(
      df: DataFrame, replaceKey: Seq[String], sortKeys: Seq[SortKey],
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(sortKeys.map(k => col(k.name)): _*), lit(salts)))
    val stage1 = {
      val w = Window.partitionBy((replaceKey.map(col) :+ col("__salt")): _*)
        .orderBy(sortKeys.map(_.column): _*)
      salted.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    replaceDedup(stage1, replaceKey, sortKeys).drop("__salt")
  }

  /** MergeBatchColumns analog (reference YdbModes/helpers.cpp:368-450): zip
    * two frames of identical row count and disjoint columns positionally.
    * Positional zip is only meaningful with aligned partitions — the RDD
    * zip contract; use a join on a real key wherever one exists. */
  def zipColumns(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "zipColumns requires disjoint column names")
    val spark = a.sparkSession
    val zipped = a.rdd.zip(b.rdd).map { case (ra, rb) =>
      org.apache.spark.sql.Row.fromSeq(ra.toSeq ++ rb.toSeq)
    }
    spark.createDataFrame(zipped,
      org.apache.spark.sql.types.StructType(a.schema.fields ++ b.schema.fields))
  }

  /** Test utility mirroring CheckSortedBlockInputStream
    * (YdbModes/CheckSortedBlockInputStream.cpp:26-56): is `df` globally
    * sorted by `keys`? Collects — test-only, like the reference's. */
  def isSorted(df: DataFrame, keys: Seq[SortKey]): Boolean = {
    val cols = keys.map(_.name)
    val rows = df.select(cols.map(col): _*).collect()
    val sorted = sort(df, keys).select(cols.map(col): _*).collect()
    rows.sameElements(sorted)
  }

  /** IsSortedAndUnique analog (YdbModes/helpers.cpp:74-134), test-only. */
  def isSortedAndUnique(df: DataFrame, keys: Seq[SortKey]): Boolean =
    isSorted(df, keys) &&
      df.select(keys.map(k => col(k.name)): _*).distinct().count() == df.count()
}

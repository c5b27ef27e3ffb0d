package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (beyond-reference surface): assign
  * documents, in a stable key order, to fixed token-budget bins — the
  * "pack documents into context-length sequences" step every pretraining
  * data pipeline runs over its full corpus.
  *
  * The global running token count is a PREFIX SUM — the naive Spark
  * formulation (`sum over Window.orderBy(key)` with no partitioning) drags
  * the whole corpus through ONE partition. This implementation is the
  * scalable two-phase form:
  *
  *  1. range-partition by the key (order-preserving across partition
  *     indices);
  *  2. per-partition token totals → a cumulative offset per partition
  *     (a window over `numPartitions` ROWS — trivially small);
  *  3. broadcast the offsets back; each partition computes its LOCAL
  *     running sum in parallel and adds its offset.
  *
  * The result is the exact global prefix sum with all heavy work
  * partition-parallel. Output is independent of the partition count (the
  * offsets telescope), so the SQL oracle can replay it with a plain
  * `SUM() OVER (ORDER BY key)` — integer arithmetic, bit-exact.
  */
object Packing {

  /** @param df       input frame
    * @param idCol    unique ordering key (documents are packed in this order)
    * @param tokCol   per-row token count (long)
    * @param budget   bin capacity in tokens
    * @param partitions range-partition count; 0 = spark.sql.shuffle.partitions
    * @param cacheRanged materialization barrier for the ranged frame (see
    *         below); pass false to trade a second upstream scan for zero
    *         cache footprint
    * @return input columns + `cum_tokens` (inclusive running total) +
    *         `bin` (0-based): the bin is the budget-window of the row's
    *         STARTING offset, bin = (cum_tokens − tok) / budget. Bins
    *         partition the concatenated token stream, so a document
    *         straddling a boundary belongs to the bin it starts in and
    *         spills into the next — the concat-then-chunk discipline
    *         pretraining uses (documents are split across sequences), NOT
    *         a strict ≤ budget-per-bin guarantee.
    *
    * LIFECYCLE (same contract as Dedup.jaccardDocs): the persisted ranged
    * frame lives until `unpersist()`/`clearCache()` — Spark's CacheManager
    * dedupes identical plans, so repeated calls with the same inputs share
    * ONE entry (bounded, block-evictable), but long-lived sessions running
    * MANY distinct packings should release between jobs or pass
    * `cacheRanged = false`. */
  def packBins(
      df: DataFrame, idCol: String, tokCol: String, budget: Long,
      partitions: Int = 0, cacheRanged: Boolean = true): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Persisted: `ranged` feeds BOTH the offsets aggregation and the final
    // join — without a materialization barrier the whole upstream (often a
    // full-text tokenization scan) runs twice. The frame is the slim
    // (input cols + pid) projection, ~tens of bytes per row, so the cache
    // is cheap; the downstream window's hash exchange then only ever moves
    // this slim frame, never the source scan.
    val ranged0 = df.repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val ranged =
      if (cacheRanged)
        ranged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else ranged0
    // Phase 1: per-partition totals (n rows — tiny).
    val sums = ranged.groupBy(col("__pid")).agg(sum(col(tokCol)).as("__psum"))
    // Phase 2: exclusive prefix over the partition totals. Single-partition
    // window over n rows — the ONLY serial step, and it is O(partitions).
    val offW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums
      .withColumn("__off", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    // Phase 3: partition-local running sums + broadcast offsets.
    val localW = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), "__pid")
      .withColumn("cum_tokens", sum(col(tokCol)).over(localW) + col("__off"))
      .withColumn("bin", floor((col("cum_tokens") - col(tokCol)) / lit(budget)).cast("long"))
      .drop("__pid", "__off")
  }
}

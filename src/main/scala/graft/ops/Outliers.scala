package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outlier handling for numeric quality signals: per-group winsorization
  * (clip at exact percentile cutoffs) — the standard guard before feeding
  * heavy-tailed features (lengths, scores, prices) into mixtures or
  * training-weight formulas. Beyond-reference surface.
  *
  * The percentile is the NEAREST-RANK definition (value at rank
  * ⌈p·n⌉, ties broken by explicit tiebreak columns), not an interpolated
  * quantile: rank arithmetic is integer-exact, so any engine reproduces the
  * cutoffs bit-for-bit — interpolation formulas differ across engines and
  * would break oracle comparison for no statistical gain at corpus scale.
  *
  * Shape: ONE window sort per group computes ranks, a small per-group
  * aggregate extracts the two cutoff values, and the cutoff frame (one row
  * per group, assumed ≪ rows) broadcasts back onto the raw scan — the probe
  * side never carries window state. The exact variant is for bounded groups
  * where the sort fits a partition spill budget; at 100 TB with unbounded
  * groups use [[Outliers.approxWinsorize]] — `approx_percentile` cutoffs
  * (mergeable sketch, no per-group sort at all) with the same downstream
  * contract.
  */
object Outliers {

  /** Clip `valueCol` to the [pLo, pHi] nearest-rank percentile band per
    * group; emits `lo_cut`/`hi_cut`, the `clipped` value, and outlier
    * flags. `tieCols` must make (value, ties) unique within a group for a
    * deterministic result.
    *
    * NULL contract: percentiles are computed over the NON-NULL values of
    * each group (a NULL would otherwise occupy a low rank under Spark's
    * nulls-first sort and silently disable the lower clip); NULL-value
    * rows pass through with `clipped` NULL and both flags false. A group
    * with no non-null values keeps NULL cutoffs. */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCols: Seq[String], pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val gs = groupCols.map(col)
    val rankW = Window.partitionBy(gs: _*)
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gs: _*)))
    val loRank = greatest(ceil(lit(pLo) * col("__n")), lit(1L))
    val hiRank = ceil(lit(pHi) * col("__n"))
    val cuts = ranked.groupBy(gs: _*).agg(
      min(when(col("__rn") === loRank, col(valueCol))).as("lo_cut"),
      min(when(col("__rn") === hiRank, col(valueCol))).as("hi_cut"))
    clipBack(df, groupCols, valueCol, cuts)
  }

  /** [[winsorize]] with `approx_percentile` cutoffs — the unbounded-group
    * scale path: cutoffs come from a mergeable quantile sketch (map-side
    * partials, one small shuffle of sketches, NO per-group sort of the
    * data), so a group of any size costs one sketch instead of a
    * partition-sized sort. Same output contract (lo_cut/hi_cut/clipped/
    * is_lo/is_hi, identical NULL semantics — the sketch ignores nulls).
    *
    * `accuracy` bounds the cutoff's RANK error at n/accuracy rows (Spark's
    * Greenwald-Khanna contract): with the default 10⁴, a cutoff on a 10⁶-
    * row group sits within ±100 ranks of the exact nearest-rank value —
    * asserted against the exact form in OutliersSpec. Unlike the exact
    * variant it needs no tie-break columns (sketches don't order ties). */
  def approxWinsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double, pHi: Double, accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    require(accuracy >= 1, s"accuracy=$accuracy must be positive")
    val cuts = df.groupBy(groupCols.map(col): _*).agg(
      percentile_approx(col(valueCol), lit(pLo), lit(accuracy)).as("lo_cut"),
      percentile_approx(col(valueCol), lit(pHi), lit(accuracy)).as("hi_cut"))
    clipBack(df, groupCols, valueCol, cuts)
  }

  /** Broadcast the (one row per group) cutoff frame back onto the raw scan
    * and clip. NULL-SAFE join: a NULL group key forms a group in `cuts`
    * but a plain-equality join would never match it — its outliers would
    * pass through unclipped and unflagged. Cut keys are renamed so the
    * output keeps the original group columns. */
  private def clipBack(df: DataFrame, groupCols: Seq[String],
      valueCol: String, cuts: DataFrame): DataFrame = {
    val cutsR = groupCols.zipWithIndex.foldLeft(cuts) { case (d, (c, i)) =>
      d.withColumnRenamed(c, s"__g$i")
    }
    val joinCond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__g$i") }
      .reduce(_ && _)
    df.join(broadcast(cutsR), joinCond, "left")
      .drop(groupCols.indices.map(i => s"__g$i"): _*)
      .withColumn("clipped",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("lo_cut")), col("hi_cut"))))
      .withColumn("is_lo", coalesce(col(valueCol) < col("lo_cut"), lit(false)))
      .withColumn("is_hi", coalesce(col(valueCol) > col("hi_cut"), lit(false)))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality health check every
  * ingestion run emits before anything downstream trusts the batch:
  * per-column non-null count, exact distinct count, min and max, against
  * the total row count. Beyond-reference surface.
  *
  * Shape: ONE aggregation over the scan produces a single wide row (Spark
  * plans the multi-column distinct counts as one Expand + two-phase
  * aggregate — one shuffle total, map-side partials intact), then a
  * `stack` unpivots it into one tidy row per column. At 100 TB swap
  * `count_distinct` for `approx_count_distinct` (HLL sketch, same plan
  * minus the Expand factor) — exact distinct is for audit-grade profiles
  * of bounded batches.
  */
object Profiling {

  /** Profile numeric columns: (col_name, n_rows, n_nonnull, n_distinct,
    * min_v, max_v), one row per column, ordered by name. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols == cols.distinct, "need distinct columns")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      count_distinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_v, max_v)")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }
}

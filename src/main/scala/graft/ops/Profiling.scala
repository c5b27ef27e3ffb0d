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
    * min_v, max_v), one row per column, ordered by name.
    *
    * Column names are DATA here, never code: inputs resolve through
    * backtick-escaped refs (a name with dots/spaces/quotes profiles fine)
    * and internal aliases are positional, so nothing user-supplied is
    * spliced into a parsed expression except the quoted name literal. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols == cols.distinct, "need distinct columns")
    def qc(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(qc(c)).as(s"nn_$i"),
      count_distinct(qc(c)).as(s"nd_$i"),
      min(qc(c)).cast("double").as(s"mn_$i"),
      max(qc(c)).cast("double").as(s"mx_$i")) }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      val nameLit = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$nameLit', nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_v, max_v)")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }
}

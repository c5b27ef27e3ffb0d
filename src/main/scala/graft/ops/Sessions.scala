package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (beyond-reference surface —
  * the standard event-analytics operator).
  *
  * A session breaks when the gap to the previous event of the same user
  * exceeds `gapSeconds`. Implementation is the canonical two-window form:
  * lag → new-session flag → running sum = session index. One hash-shuffle
  * on the user key; windows are per-user so skew follows user activity
  * (salt hot users upstream if needed).
  */
object Sessions {

  /** Assign `session_seq` (1-based per user) to every event. */
  def sessionize(
      events: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val orderCols = (col(tsCol) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    // Exact µs arithmetic (unix_micros ↔ DuckDB epoch_us) — no
    // second-truncation ambiguity at gap boundaries.
    val isNew = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, exact value sum. */
  def sessionStats(
      sessionized: DataFrame, userCol: String, valueCol: String,
      tsCol: String = "ts"): DataFrame =
    sessionized.groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(14, 4)))
          .cast("double").as("sum_value"))
}

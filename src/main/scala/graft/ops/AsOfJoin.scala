package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each probe row (key, ts), the most
  * recent quote row of the same key with quote.ts ≤ probe.ts. Spark has no
  * native ASOF JOIN; the naive formulations are a per-probe range subquery
  * (O(probes·quotes) nested loop) or a range join that explodes on wide
  * gaps. This is the scalable composition: UNION both sides tagged, ONE
  * shuffle on the key, and a running `last_value(ignoreNulls)` ordered by
  * (ts, tag) — quotes sort before probes at equal ts, so the match is
  * inclusive. Cost: one exchange + one sort, independent of time-gap
  * distribution — the plan you want at any scale.
  *
  * The quote side must be unique per (key, ts) for deterministic output
  * (pre-aggregate duplicates upstream, as time-series stores do).
  *
  * @param probes probe side; all its columns are preserved
  * @param quotes quote side: (keyCol, tsCol, valCol)
  * @return probes + `asof_ts` / `asof_val` of the matched quote (null when
  *         no quote precedes the probe — left-join semantics)
  */
object AsOfJoin {
  def asOf(
      probes: DataFrame, quotes: DataFrame,
      keyCol: String, tsCol: String, valCol: String): DataFrame = {
    val probeCols = probes.columns.toIndexedSeq
    val tagged = probes
      .withColumn("__tag", lit(1))
      .withColumn("__qts", lit(null).cast(quotes.schema(tsCol).dataType))
      .withColumn("__qval", lit(null).cast(quotes.schema(valCol).dataType))
      .unionByName(
        quotes.select(
          col(keyCol), col(tsCol),
          lit(0).as("__tag"), col(tsCol).as("__qts"), col(valCol).as("__qval")),
        allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_ts", last(col("__qts"), ignoreNulls = true).over(w))
      .withColumn("asof_val", last(col("__qval"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probeCols.map(col) :+ col("asof_ts") :+ col("asof_val"): _*)
  }
}

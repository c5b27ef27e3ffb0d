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
  * (pre-aggregate duplicates upstream, as time-series stores do). Quote
  * rows with a NULL timestamp are DROPPED: "as of when?" is unanswerable,
  * and under the window's nulls-first sort such a row would otherwise
  * become a phantom fallback match for every probe of its key — with
  * asof_ts NULL but asof_val set, indistinguishable from a real match.
  *
  * @param probes probe side; all its columns are preserved (must not
  *               already contain the internal/output column names —
  *               rejected loudly, not silently shadowed)
  * @param quotes quote side: (keyCol, tsCol, valCol)
  * @return probes + `asof_ts` / `asof_val` of the matched quote (null when
  *         no quote precedes the probe — left-join semantics)
  */
object AsOfJoin {
  def asOf(
      probes: DataFrame, quotes: DataFrame,
      keyCol: String, tsCol: String, valCol: String): DataFrame = {
    val probeCols = probes.columns.toIndexedSeq
    val reserved = Seq("__tag", "__q", "__m", "asof_ts", "asof_val")
    val clash = probeCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOf: probe columns ${clash.mkString(", ")} collide with internal/output names ($reserved)")
    // The quote rides as ONE struct (null on probe rows): a single
    // last(ignoreNulls) then yields a (ts, val) pair from the SAME quote
    // row even when the quote's value is NULL — two independent last()
    // calls would pair the latest ts with an EARLIER row's value.
    val qStructType = org.apache.spark.sql.functions.struct(
      lit(null).cast(quotes.schema(tsCol).dataType).as("qts"),
      lit(null).cast(quotes.schema(valCol).dataType).as("qval"))
    val tagged = probes
      .withColumn("__tag", lit(1))
      .withColumn("__q", when(lit(false), qStructType))   // typed NULL struct
      .unionByName(
        quotes.filter(col(tsCol).isNotNull).select(
          col(keyCol), col(tsCol),
          lit(0).as("__tag"),
          struct(col(tsCol).as("qts"), col(valCol).as("qval")).as("__q")),
        allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__m", last(col("__q"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probeCols.map(col) :+
        col("__m.qts").as("asof_ts") :+ col("__m.qval").as("asof_val"): _*)
  }
}

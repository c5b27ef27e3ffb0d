package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiling

/** One-pass numeric profiling semantics, incl. null handling. */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-column counts, distincts and extremes; nulls excluded from all") {
    val df = Seq((Option(1.0), 10L), (Option(2.0), 10L), (Option.empty[Double], 20L))
      .toDF("a", "b")
    val rows = Profiling.numericProfile(df, Seq("b", "a")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows("a") === ((3L, 2L, 2L, 1.0, 2.0))) // null not counted anywhere
    assert(rows("b") === ((3L, 3L, 2L, 10.0, 20.0)))
    // output ordered by column name regardless of input order
    val names = Profiling.numericProfile(df, Seq("b", "a")).collect().map(_.getString(0))
    assert(names.toSeq === Seq("a", "b"))
  }

  test("column names are data: dots and quotes profile fine") {
    val df = Seq((1.0, Some(2.0)), (3.0, Some(4.0)), (3.0, None))
      .toDF("price.usd", "it's odd")
    val out = graft.ops.Profiling.numericProfile(df, Seq("price.usd", "it's odd"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_distinct")))
      .toMap
    assert(out("price.usd") === ((3L, 2L)))
    assert(out("it's odd") === ((2L, 2L)))
  }

  test("one aggregation job: the plan has a single pair of exchanges") {
    val df = (1 to 100).map(i => (i.toDouble, (i % 7).toLong)).toDF("x", "y")
    val plan = Profiling.numericProfile(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // Expand-based multi-distinct: exactly one shuffle for the aggregation
    // (plus nothing else) — a second scan/shuffle would mean per-column jobs
    assert("Exchange".r.findAllIn(plan.replace("ReusedExchange", "")).size <= 2,
      s"profile should be one aggregation pipeline:\n$plan")
  }
}

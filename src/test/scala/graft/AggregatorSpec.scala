package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference Aggregator end-to-end tests
  * (/root/reference/tests/ut_aggregator.cpp:230-359, fixture F1): 1000 rows
  * with modular generators ⇒ exact group cardinalities, across key
  * permutations, single-phase and two-phase. */
class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // F1: i16 = i%9, ui32 = i%7, s1 = strs[i%5], s2 = strs[i%3]
  private val strs = Seq("abc", "def", "abcd", "defg", "ac")
  private lazy val f1 = (0 until 1000)
    .map(i => (i % 9, i % 7, strs(i % 5), strs(i % 3)))
    .toDF("i16", "ui32", "s1", "s2")

  test("group counts match reference cardinality products") {
    assert(f1.groupBy("i16", "ui32").count().count() === 63)  // 9·7
    assert(f1.groupBy("i16", "s1").count().count() === 45)    // 9·5
    assert(f1.groupBy("s1", "s2").count().count() === 15)     // 5·3
    assert(f1.groupBy("i16", "ui32", "s1", "s2").count().count() === 315)
  }

  test("count/sum/min/max/avg values on keyed groups") {
    val row = f1.groupBy("i16").agg(
      count(lit(1)).as("cnt"), sum($"ui32").as("s"),
      min($"ui32").as("mn"), max($"ui32").as("mx"), avg($"ui32").as("av"))
      .filter($"i16" === 0).head()
    // i ≡ 0 (mod 9): 112 rows (0,9,…,999)
    assert(row.getAs[Long]("cnt") === 112)
    assert(row.getAs[Int]("mn") === 0)
    assert(row.getAs[Int]("mx") === 6)
    val expectedSum = (0 until 1000).filter(_ % 9 == 0).map(_ % 7).sum
    assert(row.getAs[Long]("s") === expectedSum)
    assert(row.getAs[Double]("av") === expectedSum.toDouble / 112)
  }

  test("two-phase: repartitioned groupBy equals single-partition groupBy") {
    // Reference partial→final wiring (ut_aggregator.cpp:133-149):
    // Catalyst's Partial/Final pair must be invariant to partitioning.
    val a = f1.repartition(7, $"s1").groupBy("s1").agg(sum($"i16").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = f1.coalesce(1).groupBy("s1").agg(sum($"i16").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("keyless agg on empty input yields one row: count 0, sums null") {
    // Reference Aggregator.cpp:571-577.
    val r = f1.filter($"i16" < 0).agg(count(lit(1)), sum($"i16"), min($"s1")).head()
    assert(r.getLong(0) === 0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("keyed agg on empty input yields zero rows") {
    // Reference ut_ssa_step.cpp:232-236 (F2 EMPTY variant).
    assert(f1.filter($"i16" < 0).groupBy("s1").count().count() === 0)
  }

  test("null group key forms its own group; count(col) skips nulls") {
    // Reference ut_ssa_step.cpp:261-287 (F2 null-key rows).
    val df = Seq[(Option[Int], Option[Int])](
      (Some(-1), Some(1)), (None, None), (None, None), (Some(-1), Some(1)))
      .toDF("x", "y")
    val rows = df.groupBy("x")
      .agg(sum($"y").as("sy"), count($"y").as("cy"), count(lit(1)).as("c"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows === Set(
      (Some(-1), Some(2L), 2L, 2L),
      (None, None, 0L, 2L)))
  }

  test("'any' (first non-null) returns a member of the group") {
    // Order-dependent in reference too — assert membership only (SURVEY §7).
    val vals = f1.groupBy("i16").agg(first($"s1", ignoreNulls = true).as("a"))
      .collect().map(_.getString(1))
    assert(vals.forall(strs.contains))
  }
}

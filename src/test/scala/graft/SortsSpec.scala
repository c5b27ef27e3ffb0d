package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sorts
import graft.ops.Sorts.SortKey

/** Mirrors the reference sort/merge/dedup tests
  * (/root/reference/YdbModes/tests/ut_modes.cpp, fixtures F3/F4):
  * composite-key sort reconstruction, k-way merge of overlapping sorted
  * slices, reversed order, and replace-key (snapshot) dedup. */
class SortsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // F3: v = 0..999 decomposed into (i8, i16, i32) = (v/100, v%100/10, v%10).
  private def f3(range: Range) =
    range.map(v => (v / 100, (v % 100) / 10, v % 10)).toDF("i8", "i16", "i32")
  private val keys = Seq(SortKey("i8"), SortKey("i16"), SortKey("i32"))
  private def recompose(r: org.apache.spark.sql.Row) =
    r.getInt(0) * 100 + r.getInt(1) * 10 + r.getInt(2)

  test("composite sort reconstructs v = row index (ut_modes.cpp:275-398)") {
    val shuffled = f3(0 until 1000).orderBy(rand(42))
    val sorted = Sorts.sort(shuffled, keys).collect().map(recompose)
    assert(sorted.toSeq === (0 until 1000))
  }

  test("k-way merge of overlapping sorted slices (ut_modes.cpp:454-489)") {
    // Slices [0,100) [100,300) [200,600) [500,550) [600,601) — duplicates kept.
    val slices = Seq(0 until 100, 100 until 300, 200 until 600, 500 until 550, 600 until 601)
    val merged = Sorts.mergeSorted(slices.map(r => Sorts.sort(f3(r), keys)), keys)
    val vals = merged.collect().map(recompose).toSeq
    val expected = slices.flatten.sorted
    assert(vals === expected)
    assert(vals.size === 751)
  }

  test("reverse read emits descending order (ut_modes.cpp:491-527)") {
    val out = Sorts.reverseSort(f3(0 until 200), keys).collect().map(recompose)
    assert(out.toSeq === (199 to 0 by -1))
  }

  test("replace-key dedup: latest snapshot wins, histogram 200/200/200/400 (F4)") {
    // Slices with snap: [0,400)@0, [200,600)@1, [400,800)@2, [600,1000)@3.
    val slices = Seq((0 until 400, 0L), (200 until 600, 1L), (400 until 800, 2L), (600 until 1000, 3L))
    val df = slices.map { case (r, snap) =>
      r.map(v => (v / 100, (v % 100) / 10, v % 10, snap)).toDF("i8", "i16", "i32", "snap")
    }.reduce(_ unionAll _)
    val deduped = Sorts.replaceDedup(df,
      replaceKey = Seq("i8", "i16", "i32"),
      sortKeys = Seq(SortKey("snap", ascending = false)))
    assert(deduped.count() === 1000)
    val hist = deduped.groupBy("snap").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(0L -> 200L, 1L -> 200L, 2L -> 200L, 3L -> 400L))
  }

  test("nulls sort first in both directions (reference CompositeKey.h:265-273)") {
    val df = Seq(Some(2), None, Some(1), Some(3)).toDF("x")
    val asc = Sorts.sort(df, Seq(SortKey("x"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(asc.toSeq === Seq(None, Some(1), Some(2), Some(3)))
    val desc = Sorts.sort(df, Seq(SortKey("x", ascending = false))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(desc.toSeq === Seq(None, Some(3), Some(2), Some(1)))
  }

  test("isSorted / isSortedAndUnique utilities (helpers.cpp:74-134)") {
    val sorted = Sorts.sort(f3(0 until 100), keys).coalesce(1)
    assert(Sorts.isSorted(sorted, keys))
    assert(Sorts.isSortedAndUnique(sorted, keys))
    val dup = sorted.unionAll(sorted.limit(1))
    assert(!Sorts.isSortedAndUnique(Sorts.sort(dup, keys).coalesce(1), keys))
  }

  test("topK equals sort-then-take (TakeOrderedAndProject path)") {
    val df = f3(0 until 1000).orderBy(rand(7))
    val top = Sorts.topK(df, keys, 25).collect().map(recompose)
    assert(top.toSeq === (0 until 25))
  }

  test("sortWithinPartitions: batch-local order per partition, no exchange (ut_modes.cpp:275-398)") {
    // Composite keys, like the reference's batch-local SortingBlockInputStream
    // test: every partition independently ordered; global order NOT required.
    val df = f3((0 until 1000).reverse).repartition(5)
    val sorted = Sorts.sortWithinPartitions(df, keys)
    val parts = sorted.rdd.glom().collect()
    assert(parts.length === 5)
    parts.foreach { p =>
      val xs = p.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
      assert(xs === xs.sorted, "partition not locally sorted")
    }
    // Batch-local means NO shuffle for the sort itself: the only exchange in
    // the plan is the repartition below it.
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, s"unexpected exchanges:\n$plan")
    // ...and the global order is genuinely not established (5 interleaved runs).
    val flat = parts.flatMap(_.map(recompose)).toSeq
    assert(flat.sorted === (0 until 1000))
  }
}

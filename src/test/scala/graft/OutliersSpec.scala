package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Outliers

/** Winsorization semantics: nearest-rank cutoffs, clipping, flags. */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearest-rank cutoffs clip and flag per group") {
    val df = (1 to 10).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val r = Outliers.winsorize(df, Seq("g"), "v", Seq("id"), 0.2, 0.8)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Double]("clipped"), x.getAs[Boolean]("is_lo"), x.getAs[Boolean]("is_hi")))
      .toMap
    // ranks: lo = ceil(0.2*10)=2 → cut 2.0; hi = ceil(0.8*10)=8 → cut 8.0
    assert(r(1L) === ((2.0, true, false)))
    assert(r(2L) === ((2.0, false, false)))
    assert(r(8L) === ((8.0, false, false)))
    assert(r(9L) === ((8.0, false, true)))
    assert(r(10L) === ((8.0, false, true)))
  }

  test("NULL values are excluded from cutoffs and pass through unflagged") {
    val df = Seq(
      ("a", 0L, None), ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("a", 4L, Some(40.0)), ("a", 5L, Some(50.0)),
      ("n", 6L, None)).toDF("g", "id", "v")
    val r = Outliers.winsorize(df, Seq("g"), "v", Seq("id"), 0.2, 0.8)
      .collect().map { x =>
        val clipped =
          if (x.isNullAt(x.fieldIndex("clipped"))) None
          else Some(x.getAs[Double]("clipped"))
        x.getAs[Long]("id") ->
          ((clipped, x.getAs[Boolean]("is_lo"), x.getAs[Boolean]("is_hi")))
      }.toMap
    // cutoffs over the 5 NON-null values: lo = rank 1 → 10, hi = rank 4 → 40
    assert(r(1L) === ((Some(10.0), false, false)))
    assert(r(5L) === ((Some(40.0), false, true)))
    // NULL row: passes through, never clipped, never flagged
    assert(r(0L) === ((None, false, false)))
    // all-NULL group survives with NULL cutoffs
    assert(r(6L) === ((None, false, false)))
  }

  test("a NULL group key is a group: its outliers are clipped like any other") {
    val df = (1 to 10).map(i => (if (i <= 5) Some("a") else None, i.toLong,
      (i % 5 + 1) * 10.0)).toDF("g", "id", "v")
    val r = Outliers.winsorize(df, Seq("g"), "v", Seq("id"), 0.2, 0.8)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[Double]("clipped"), x.getAs[Boolean]("is_lo") || x.getAs[Boolean]("is_hi"))))
      .toMap
    // NULL group = ids 6..10 with v = (20,30,40,50,10): cutoffs over ITS
    // 5 values (lo rank 1 → 10, hi rank 4 → 40); 50 must clip to 40
    assert(r(9L) === ((40.0, true)), s"NULL-group outlier must clip: $r")
    assert(r(10L) === ((10.0, false)), "at-the-cut value is kept, not flagged")
  }

  test("groups are independent and pLo=0 keeps rank 1 as the low cut") {
    val df = Seq(
      ("a", 1L, 100.0), ("a", 2L, 200.0), ("a", 3L, 300.0),
      ("b", 4L, 1.0), ("b", 5L, 2.0), ("b", 6L, 3.0)).toDF("g", "id", "v")
    val r = Outliers.winsorize(df, Seq("g"), "v", Seq("id"), 0.0, 1.0)
      .collect()
    // ceil(0*n)=0 clamps to rank 1; hi = rank n — nothing clips at [0,1]
    assert(r.forall(x => x.getAs[Double]("clipped") === x.getAs[Double]("v")))
    val cutsByG = r.map(x => x.getAs[String]("g") ->
      (x.getAs[Double]("lo_cut"), x.getAs[Double]("hi_cut"))).toMap
    assert(cutsByG("a") === ((100.0, 300.0)) && cutsByG("b") === ((1.0, 3.0)))
  }

  test("approxWinsorize: cutoffs within the sketch's rank-error bound of exact") {
    // 2000 distinct values (so value == rank): exact nearest-rank cutoffs
    // at p=(0.05, 0.95) are 100 and 1900; the GK sketch guarantees rank
    // error ≤ n/accuracy. Output contract must mirror the exact form.
    val n = 2000
    val df = (1 to n).map(i => ("a", i.toLong, i.toDouble)).toDF("g", "id", "v")
    for (accuracy <- Seq(100, 10000)) {
      val bound = n.toDouble / accuracy + 1 // +1: nearest-rank vs sketch convention
      val r = Outliers.approxWinsorize(df, Seq("g"), "v", 0.05, 0.95, accuracy)
      val row = r.head()
      val (lo, hi) = (row.getAs[Double]("lo_cut"), row.getAs[Double]("hi_cut"))
      assert(math.abs(lo - 100.0) <= bound, s"lo_cut=$lo at accuracy=$accuracy")
      assert(math.abs(hi - 1900.0) <= bound, s"hi_cut=$hi at accuracy=$accuracy")
      // clip/flag semantics are consistent with whatever cutoffs it chose
      val flagged = r.filter(col("is_hi")).agg(min("v")).head().getDouble(0)
      assert(flagged > hi)
      assert(r.filter(col("v") > col("hi_cut"))
        .filter(col("clipped") =!= col("hi_cut")).count() === 0)
    }
  }

  test("approxWinsorize keeps the exact form's NULL contract") {
    val df = Seq(
      ("a", 0L, None), ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("n", 4L, None)).toDF("g", "id", "v")
    val r = Outliers.approxWinsorize(df, Seq("g"), "v", 0.2, 0.8)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.isNullAt(x.fieldIndex("clipped")), x.getAs[Boolean]("is_lo"),
          x.getAs[Boolean]("is_hi")))).toMap
    assert(r(0L) === ((true, false, false)), "NULL value passes through unflagged")
    assert(r(4L) === ((true, false, false)), "all-NULL group keeps NULL cutoffs")
    assert(!r(2L)._1, "non-null values are clipped normally")
  }

  test("duplicate values resolve deterministically via tiebreak columns") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 9.0))
      .toDF("g", "id", "v")
    // lo rank ceil(0.25*4)=1 → 5.0; hi rank ceil(0.75*4)=3 → 5.0 (3rd dup)
    val r = Outliers.winsorize(df, Seq("g"), "v", Seq("id"), 0.25, 0.75)
      .collect()
    assert(r.forall(x => x.getAs[Double]("lo_cut") === 5.0))
    assert(r.forall(x => x.getAs[Double]("hi_cut") === 5.0))
    assert(r.filter(_.getAs[Long]("id") == 4L).head.getAs[Boolean]("is_hi"))
  }
}

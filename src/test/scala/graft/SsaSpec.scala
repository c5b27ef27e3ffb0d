package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.ssa._

/** Mirrors the reference SSA step tests
  * (/root/reference/YdbModes/tests/ut_ssa_step.cpp, fixtures F2/F7):
  * scalar ops over (x,y,z) triples, string match family with ignore-case,
  * filters, projections, keyed aggregation through the Program ADT. */
class SsaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import EOperation._

  private lazy val xyz = Seq((10L, 3L, 2L), (7L, 7L, 0L), (-4L, 2L, 8L)).toDF("x", "y", "z")

  private def run1(df: org.apache.spark.sql.DataFrame, step: ProgramStep) =
    Program(Seq(step)).applyTo(df)

  test("binary op chain: res1 = op1(x,y); res2 = op2(res1,z); project") {
    // F7 shape: assigns referencing earlier assigns in the same step.
    val out = run1(xyz, ProgramStep(
      assignes = Seq(
        Assign("res1", Add, Seq("x", "y")),
        Assign("res2", Multiply, Seq("res1", "z"))),
      projection = Seq("res1", "res2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((13L, 26L), (14L, 0L), (-2L, -16L)))
  }

  test("comparisons, boolean ops, filter on named mask columns") {
    val out = run1(xyz, ProgramStep(
      assignes = Seq(
        Assign("gt", Greater, Seq("x", "y")),
        Assign("eq", Equal, Seq("x", "y")),
        Assign("keep", Or, Seq("gt", "eq"))),
      filters = Seq("keep"),
      projection = Seq("x")))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(10L, 7L))  // -4 > 2 false, -4 == 2 false
  }

  test("abs / negate / div / checked-div null on zero divisor") {
    val out = run1(xyz, ProgramStep(
      assignes = Seq(
        Assign("a", Abs, Seq("x")),
        Assign("n", Negate, Seq("x")),
        Assign("d", DivideNotNull, Seq("x", "z"))),
      projection = Seq("a", "n", "d")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out === Set(
      (10L, -10L, Some(5.0)), (7L, -7L, None), (4L, 4L, Some(-0.5))))
  }

  test("string match family incl. ignore-case (F7 patterns)") {
    val strs = Seq("Hello World", "hello there", "WORLD peace").toDF("s")
    val out = run1(strs, ProgramStep(
      assignes = Seq(
        Assign("sw", StartsWith, Seq("s"), const = Some("hello"), ignoreCase = true),
        Assign("ew", EndsWith, Seq("s"), const = Some("World")),
        Assign("ms", MatchSubstring, Seq("s"), const = Some("world"), ignoreCase = true),
        Assign("lk", MatchLike, Seq("s"), const = Some("%o%e%"))),
      projection = Seq("s", "sw", "ew", "ms", "lk")))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(out === Set(
      ("Hello World", true, true, true, false),  // no 'e' after an 'o'
      ("hello there", true, false, false, true),
      ("WORLD peace", false, false, true, false)))
  }

  test("constant scalar attach + cast family") {
    val out = run1(xyz, ProgramStep(
      assignes = Seq(
        Assign("c", Constant, const = Some(5L)),
        Assign("xc", Add, Seq("x", "c")),
        Assign("xi", CastInt32, Seq("x")),
        Assign("xs", CastString, Seq("x")),
        Assign("xd", CastDouble, Seq("x"))),
      projection = Seq("xc", "xi", "xs", "xd")))
      .head()
    assert(out === Row(15L, 10, "10", 10.0))
  }

  test("keyed groupBy through the Program ADT (F2 DEFAULT variant)") {
    // x = [-1, 0, 0, -1], y = [1, 0, 0, 1] ⇒ by x: {-1: sum_y=2}, {0: 0}
    val f2 = Seq((-1, 1), (0, 0), (0, 0), (-1, 1)).toDF("x", "y")
    val out = run1(f2, ProgramStep(
      groupBy = Seq(
        AggregateAssign("sum_y", EAggregate.Sum, Some("y")),
        AggregateAssign("cnt", EAggregate.Count)),
      groupByKeys = Seq("x")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((-1, 2L, 2L), (0, 0L, 2L)))
  }

  test("one-value group: sum of single null row is null (F2 ONE_VALUE)") {
    val df = Seq((Some(1), Option.empty[Int])).toDF("x", "y")
    val r = run1(df, ProgramStep(
      groupBy = Seq(AggregateAssign("sum_y", EAggregate.Sum, Some("y"))),
      groupByKeys = Seq("x"))).head()
    assert(r.getInt(0) === 1 && r.isNullAt(1))
  }

  test("future ops enabled: modulo, sqrt, banker's rounding, is_in") {
    val out = run1(xyz, ProgramStep(
      assignes = Seq(
        Assign("c3", Constant, const = Some(3L)),
        Assign("m", Modulo, Seq("x", "c3")),
        Assign("sx", Sqrt, Seq("z")),
        Assign("inset", IsIn, Seq("x"), const = Some(Seq(7L, -4L)))),
      projection = Seq("x", "m", "sx", "inset")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(out === Set(
      (10L, 1L, math.sqrt(2.0), false),
      (7L, 1L, 0.0, true),
      (-4L, -1L, math.sqrt(8.0), true)))  // remainder keeps dividend sign
    val rb = Seq(2.5, 3.5, -2.5).toDF("v")
    val got = run1(rb, ProgramStep(
      assignes = Seq(Assign("b", RoundBankers, Seq("v"))),
      projection = Seq("b"))).collect().map(_.getDouble(0)).toSet
    assert(got === Set(2.0, 4.0, -2.0))  // half-even
  }

  test("ignore-case match uses Unicode case folding, not lowercasing (ß/İ)") {
    // İ (U+0130) String-lowercases to "i̇" (two codepoints), so a
    // lower-vs-lower comparison misses İ≈i; character-level case folding
    // ((?iu), same family as the reference's RE2 kernels) catches it.
    // ẞ (U+1E9E) folds to ß the same way.
    val strs = Seq("istanbul", "GROSSE STRAẞE").toDF("s")
    val out = run1(strs, ProgramStep(
      assignes = Seq(
        Assign("dotted", MatchSubstring, Seq("s"), const = Some("İstanbul"), ignoreCase = true),
        Assign("sharp", MatchSubstring, Seq("s"), const = Some("straße"), ignoreCase = true),
        Assign("lk", MatchLike, Seq("s"), const = Some("%straße"), ignoreCase = true),
        Assign("ew", EndsWith, Seq("s"), const = Some("straße"), ignoreCase = true)),
      projection = Seq("s", "dotted", "sharp", "lk", "ew")))
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out("istanbul") === ((true, false, false, false)))
    assert(out("GROSSE STRAẞE") === ((false, true, true, true)))
  }

  test("checked arithmetic: default NULLs, parity mode raises (add_checked)") {
    val edge = Seq((Long.MaxValue, 1L, 0L), (5L, 2L, 1L)).toDF("x", "y", "z")
    val step = ProgramStep(
      assignes = Seq(
        Assign("s", AddNotNull, Seq("x", "y")),
        Assign("d", DivideNotNull, Seq("x", "z"))),
      projection = Seq("s", "d"))
    // Default: NULL on overflow and on zero division, NULL inputs stay NULL.
    val relaxed = step.apply(edge).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(relaxed === Set((None, None), (Some(7L), Some(5.0))))
    // Parity mode: the same program RAISES like the reference checked
    // kernels (SsaProgram.cpp:244-253)...
    val e = intercept[Exception] {
      step.apply(edge, checkedErrors = true).collect()
    }
    assert(e.getMessage.contains("checked-kernel parity"))
    // ...but NULL INPUTS still propagate as NULL (not an error) — only
    // the overflow/zero-division case is promoted.
    val nulls = Seq((Option.empty[Long], Some(1L))).toDF("x", "y")
    val ok = ProgramStep(
      assignes = Seq(Assign("s", AddNotNull, Seq("x", "y"))),
      projection = Seq("s")).apply(nulls, checkedErrors = true).head()
    assert(ok.isNullAt(0))
  }

  test("duplicate assign name rejected (reference applyAssignes contract)") {
    intercept[IllegalArgumentException] {
      run1(xyz, ProgramStep(assignes = Seq(
        Assign("x", Add, Seq("x", "y")))))
    }
  }

  test("multi-step program: filter step then aggregate step") {
    val out = Program(Seq(
      ProgramStep(
        assignes = Seq(Assign("pos", Greater, Seq("x", "z"))),
        filters = Seq("pos")),
      ProgramStep(
        groupBy = Seq(AggregateAssign("sx", EAggregate.Sum, Some("x"))),
        groupByKeys = Seq()))).applyTo(xyz)
    assert(out.head().getLong(0) === 17L)  // 10 + 7 pass, -4 filtered
  }
}

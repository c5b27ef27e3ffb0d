package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** As-of join semantics: most recent quote at or before each probe, per
  * key; left-join nulls when nothing precedes. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("matches the latest preceding quote, inclusive at equal timestamps") {
    val probes = Seq(
      (1L, 1L, ts(10)),   // after q@5 → 100
      (2L, 1L, ts(15)),   // exactly at q@15 → inclusive → 200
      (3L, 1L, ts(3)),    // before any quote → null
      (4L, 2L, ts(30)),   // other key, sees only its own quotes
      (5L, 3L, ts(30)))   // key with no quotes at all → null
      .toDF("probe_id", "k", "ts")
    val quotes = Seq(
      (1L, ts(5), 100.0), (1L, ts(15), 200.0), (1L, ts(20), 300.0),
      (2L, ts(1), 7.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(probes, quotes, "k", "ts", "v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[java.lang.Double]("asof_val"))))
      .toMap
    assert(out(1L) === ((Some(ts(5)), Some(100.0))))
    assert(out(2L) === ((Some(ts(15)), Some(200.0))))
    assert(out(3L) === ((None, None)))
    assert(out(4L) === ((Some(ts(1)), Some(7.0))))
    assert(out(5L) === ((None, None)))
  }

  test("a matched quote with NULL value yields (its ts, NULL), never a mixed pair") {
    val probes = Seq((1L, 1L, ts(20))).toDF("probe_id", "k", "ts")
    val quotes = Seq(
      (1L, ts(5), Option(100.0)),
      (1L, ts(15), Option.empty[Double]))  // latest quote has NULL value
      .toDF("k", "ts", "v")
    val r = AsOfJoin.asOf(probes, quotes, "k", "ts", "v").head()
    assert(r.getAs[Timestamp]("asof_ts") === ts(15), "must match the latest quote row")
    assert(r.isNullAt(r.fieldIndex("asof_val")), "its NULL value must not borrow an older one")
  }

  test("NULL-timestamp quotes are dropped, not phantom fallback matches") {
    val probes = Seq((1L, 1L, ts(10)), (2L, 1L, ts(3))).toDF("probe_id", "k", "ts")
    val quotes = Seq(
      (1L, Option(ts(5)), Option(100.0)),
      (1L, Option.empty[Timestamp], Option(999.0)))  // "as of when?" — dropped
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(probes, quotes, "k", "ts", "v")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[java.lang.Double]("asof_val"))))
      .toMap
    assert(out(1L) === ((Some(ts(5)), Some(100.0))))
    // Without the filter this probe would get (asof_ts=NULL, asof_val=999).
    assert(out(2L) === ((None, None)))
  }

  test("probe columns colliding with internal/output names are rejected") {
    val probes = Seq((1L, ts(10), 0)).toDF("k", "ts", "asof_val")
    val quotes = Seq((1L, ts(5), 1.0)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(probes, quotes, "k", "ts", "v")
    }
    assert(e.getMessage.contains("asof_val"))
  }

  test("bucketed range join equals the brute-force BETWEEN join, any bucket width") {
    val rnd = new scala.util.Random(29)
    val points = (0L until 400L).map(i => (i, rnd.nextInt(4).toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "k", "pt")
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(800).toLong)
    }.toDF("k", "lo", "hi")
    def brute = points.join(intervals, Seq("k"))
      .filter($"pt" >= $"lo" && $"pt" <= $"hi")
      .select("pid", "k", "pt", "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    for (w <- Seq(100L, 500L, 4096L)) {
      val out = graft.ops.RangeJoin.pointInInterval(
        points, intervals, "k", "pt", "lo", "hi", bucketWidth = w)
        .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSet
      assert(out === brute, s"bucketWidth=$w")
    }
  }

  test("agrees with a brute-force per-probe scan on random data") {
    val rnd = new scala.util.Random(17)
    val probes = (0L until 300L).map(i => (i, rnd.nextInt(5).toLong, ts(rnd.nextInt(50))))
      .toDF("probe_id", "k", "ts")
    val quoteRows = (0 until 100).map { i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(50)), i.toDouble)
    }.distinct
    // unique per (k, ts): keep max v
    val dedup = quoteRows.groupBy(q => (q._1, q._2)).map { case (_, vs) => vs.maxBy(_._3) }.toSeq
    val quotes = dedup.toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(probes, quotes, "k", "ts", "v")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("asof_val"))).toMap
    val probeRows = probes.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    probeRows.foreach { case (pid, k, pts) =>
      val expected = dedup.filter(q => q._1 == k && !q._2.after(pts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(pid) === expected, s"probe $pid")
    }
  }
}

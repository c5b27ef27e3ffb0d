package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sessions

/** Gap-based sessionization semantics. */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gaps > threshold, per user") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 10:05:00"), 2.0),  // +5m same session
      (1L, 3L, ts("2024-01-01 10:20:00"), 3.0),  // +15m > 10m → new session
      (1L, 4L, ts("2024-01-01 10:25:00"), 4.0),
      (2L, 5L, ts("2024-01-01 09:00:00"), 5.0))  // other user independent
      .toDF("user_id", "event_id", "ts", "value")
    val out = Sessions.sessionize(events, "user_id", "ts", 600, Seq("event_id"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("exact gap boundary stays in-session (> not >=)") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 0.0),
      (1L, 2L, ts("2024-01-01 10:10:00"), 0.0))  // exactly 600s
      .toDF("user_id", "event_id", "ts", "value")
    val out = Sessions.sessionize(events, "user_id", "ts", 600, Seq("event_id"))
      .collect().map(_.getAs[Long]("session_seq")).toSet
    assert(out === Set(1L))
  }

  test("session stats: counts, bounds, exact sums") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.5),
      (1L, 2L, ts("2024-01-01 10:05:00"), 2.25),
      (1L, 3L, ts("2024-01-01 11:00:00"), 4.0))
      .toDF("user_id", "event_id", "ts", "value")
    val sess = Sessions.sessionize(events, "user_id", "ts", 600, Seq("event_id"))
    val stats = Sessions.sessionStats(sess, "user_id", "value")
      .collect().map(r => r.getAs[Long]("session_seq") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(stats === Map(1L -> ((2L, 3.75)), 2L -> ((1L, 4.0))))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventIn

/** Structured Streaming semantics driven through MemoryStream — windowed
  * aggregation under watermark and incremental latest-per-key state. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("windowed stats over a stream: per-window counts and exact sums") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = EventStreams.windowedStats(in.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(
        EventIn(1, "click", ts(1), 1.5),
        EventIn(1, "click", ts(5), 2.5),
        EventIn(2, "view", ts(12), 4.0))
      q.processAllAvailable()
      val rows = spark.table("winstats")
        .collect().map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_value"))).toSet
      assert(rows === Set(
        (ts(0), "click", 2L, 4.0),
        (ts(10), "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("latest-per-key state updates incrementally across batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = EventStreams.latestPerKey(in.toDS())
      .writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(EventIn(1, "click", ts(1), 1.0))
      q.processAllAvailable()
      in.addData(EventIn(1, "click", ts(5), 2.0))   // newer → replaces
      q.processAllAvailable()
      in.addData(EventIn(1, "click", ts(3), 9.0))   // older → state survives
      q.processAllAvailable()
      val last = spark.table("latest").collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Timestamp]("ts"), r.getAs[Double]("value")))
      // Update-mode memory sink appends each batch's emission; the final
      // emission for the key must carry the newest event (ts 10:05).
      assert(last.last === ((1L, "click", ts(5), 2.0)))
    } finally q.stop()
  }

  test("session_window merges events within gap, inclusive at the boundary") {
    val batch = Seq(
      EventIn(1, "a", ts(0), 1.0),
      EventIn(1, "a", ts(9), 2.0),    // +9m < 10m → same session
      EventIn(1, "a", ts(19), 3.0),   // +10m = gap → boundary is inclusive: extends
      EventIn(2, "a", ts(0), 5.0))
      .toDF().select($"user_id", $"ts", $"value")
    val out = EventStreams.sessionWindowStats(batch, "10 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet
    // ts(19) lands exactly at session end (ts(9)+10m): inclusive → merged
    assert(out === Set((1L, 3L, 6.0), (2L, 1L, 5.0)))
  }

  test("stream dedup: redelivered ids within the watermark are suppressed") {
    implicit val sql = spark.sqlContext
    final case class Ev(event_id: Long, ts: Timestamp, value: Double)
    val in = MemoryStream[(Long, Timestamp, Double)]
    val df = in.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupEvents(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(1), 1.0), (2L, ts(2), 2.0))
      q.processAllAvailable()
      // same ids redelivered in a later batch, inside the watermark delay
      in.addData((1L, ts(1), 1.0), (3L, ts(3), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L), "duplicate event_id must be emitted once")
    } finally q.stop()
  }

  test("batch and streaming dedup agree on the result set") {
    val ev = Seq((1L, ts(1), 1.0), (2L, ts(2), 2.0), (1L, ts(1), 1.0))
      .toDF("event_id", "ts", "value")
    val out = EventStreams.dedupEvents(ev, Seq("event_id"), "10 minutes")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("stream-static enrichment: broadcast dim attaches on a stream, left-join NULLs pass") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("event_id", "user_id")
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val q = EventStreams.enrich(events, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((100L, 1L), (101L, 2L), (102L, 9L))  // user 9 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[String]("name")))).toSet
      assert(rows === Set(
        (100L, Some("alice")), (101L, Some("bob")), (102L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with preceding purchases") {
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val clicks = lIn.toDF().toDF("click_id", "user_id", "c_ts")
    val purchases = rIn.toDF().toDF("p_id", "user_id", "p_ts")
    val q = EventStreams.intervalJoin(
      clicks, purchases, Seq("user_id"), "c_ts", "p_ts", "60 minutes", "30 minutes")
      .select(col("click_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      rIn.addData((100L, 1L, ts(0)))   // purchase 10:00
      lIn.addData((200L, 1L, ts(30)))  // click 10:30 → pairs with 100
      lIn.addData((201L, 2L, ts(30)))  // other user → no pair
      q.processAllAvailable()
      rIn.addData((101L, 1L, ts(40)))  // purchase 10:40 (after click 200)
      lIn.addData((202L, 1L, ts(50)))  // click 10:50 → pairs with 100 AND 101
      q.processAllAvailable()
      val pairs = spark.table("ssj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((200L, 100L), (202L, 100L), (202L, 101L)))
    } finally q.stop()
  }

  test("interval join boundaries are inclusive (batch frame)") {
    def hm(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val clicks = Seq((1L, 7L, hm(11, 0))).toDF("click_id", "user_id", "c_ts")
    val purchases = Seq(
      (10L, 7L, hm(10, 0)),   // exactly c_ts - 1h → inclusive, pairs
      (11L, 7L, hm(11, 0)),   // exactly c_ts → inclusive, pairs
      (12L, 7L, hm(9, 59)),   // one minute too old → excluded
      (13L, 7L, hm(11, 1)))   // after the click → excluded
      .toDF("p_id", "user_id", "p_ts")
    val out = EventStreams.intervalJoin(
      clicks, purchases, Seq("user_id"), "c_ts", "p_ts", "1 hour", "30 minutes")
      .select(col("p_id")).collect().map(_.getLong(0)).toSet
    assert(out === Set(10L, 11L))
  }

  test("checkpointed query recovers exactly-once across a kill-and-restart") {
    // The production ingest property none of the MemoryStream cases prove:
    // a file-backed sink + checkpointLocation, stopped cold and restarted,
    // must (a) not re-emit rows from already-committed source offsets and
    // (b) restore dedup STATE so a duplicate arriving after the restart is
    // still suppressed — WAL offsets + state store recovery end to end.
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    import org.apache.spark.sql.SaveMode
    def feed(events: EventIn*): Unit =
      events.toDS().coalesce(1).write.mode(SaveMode.Append).parquet(src)
    def runOnePass(): Unit = {
      val in = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventIn]].schema)
        .parquet(src)
      val q = EventStreams.dedupEvents(in, Seq("user_id"), "30 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    feed(EventIn(1, "click", ts(1), 1.0), EventIn(2, "view", ts(2), 2.0))
    runOnePass()
    val afterFirst = spark.read.parquet(out).collect()
    assert(afterFirst.map(_.getAs[Long]("user_id")).sorted.toSeq === Seq(1L, 2L))
    // cold restart: user 2 redelivered (must stay suppressed via recovered
    // state), user 3 new (must appear exactly once)
    feed(EventIn(2, "view", ts(3), 2.0), EventIn(3, "click", ts(4), 3.0))
    runOnePass()
    val afterSecond = spark.read.parquet(out)
      .collect().map(_.getAs[Long]("user_id")).sorted.toSeq
    assert(afterSecond === Seq(1L, 2L, 3L),
      s"exactly-once violated: $afterSecond (re-emitted or lost rows)")
    // third restart with NO new data: nothing may be re-emitted
    runOnePass()
    assert(spark.read.parquet(out).count() === 3L)
  }

  test("batch and streaming transforms agree (windowedStats on batch frame)") {
    val batch = Seq(
      EventIn(1, "click", ts(1), 1.5),
      EventIn(1, "click", ts(5), 2.5)).toDF()
    val out = EventStreams.windowedStats(batch, "10 minutes", "10 minutes").collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("cnt") === 2L)
    assert(out(0).getAs[Double]("sum_value") === 4.0)
  }
}

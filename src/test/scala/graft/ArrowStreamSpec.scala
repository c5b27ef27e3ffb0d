package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowMaintenance

/** Micro-batch face of the Arrow IPC source: a directory other jobs keep
  * appending to, consumed as a Structured Streaming source with
  * exactly-once file semantics (set-difference offsets, checkpointed). */
class ArrowStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed directory: appends arrive once each; restart replays nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream").toString
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")

    def feed(from: Long, until: Long): Unit =
      spark.range(from, until).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(src)

    def runOnePass(): Unit = {
      val q = spark.readStream.format("arrow-ipc").load(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }

    feed(0, 100)
    runOnePass()
    assert(spark.read.parquet(out).count() === 100)

    // two more committed append jobs → exactly their union, no re-emits
    feed(100, 150)
    feed(150, 180)
    runOnePass()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(ids.length === 180, s"got ${ids.length}")
    assert(ids.toSeq === (0L until 180L), "duplicated or lost rows")

    // restart with NO new files: nothing may be re-emitted
    runOnePass()
    assert(spark.read.parquet(out).count() === 180)
  }

  test("filtered/projected stream is exact; post-scan filtering is the observed contract") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream2").toString
    val src = s"$base/src"
    // two files with disjoint id ranges (coalesce(1) per write)
    spark.range(0, 1000).select(col("id"), concat(lit("p"), col("id")).as("pay"))
      .coalesce(1).write.format("arrow-ipc").mode("append").save(src)
    spark.range(1000, 2000).select(col("id"), concat(lit("p"), col("id")).as("pay"))
      .coalesce(1).write.format("arrow-ipc").mode("append").save(src)

    val q = spark.readStream.format("arrow-ipc").load(src)
      .filter(col("id") < 500).select("id")
      .writeStream.format("memory").queryName("graft_arrow_pruned").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_arrow_pruned").as[Long].collect().sorted
    assert(got.toSeq === (0L until 500L))

    // Spark's V2 pushdown rules run only on BATCH relations: the
    // micro-batch scan is built at analysis time with no filters, so both
    // files are read and the filter applies post-scan. This assertion
    // DOCUMENTS that contract — if it ever fails with 1000, Spark grew
    // streaming pushdown and the stats skip in planInputPartitions went
    // live (update the scaladoc in ArrowIpcStreaming.scala).
    val inputRows = q.recentProgress.map(_.numInputRows).sum
    assert(inputRows === 2000, s"expected post-scan filtering (2000), got $inputRows")
  }

  test("maxFilesPerTrigger drains a backlog as bounded micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream3").toString
    val src = s"$base/src"
    // four committed files of 25 rows each — a "backlog" before the stream starts
    (0 until 4).foreach { i =>
      spark.range(i * 25, (i + 1) * 25).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(src)
    }
    val q = spark.readStream.format("arrow-ipc")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream.format("memory").queryName("graft_arrow_paced").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("graft_arrow_paced").count() === 100)
    // one file per batch: four non-empty batches of exactly 25 rows
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes === Seq(25L, 25L, 25L, 25L),
      s"expected 4 bounded batches, got $sizes")
  }

  test("compaction between runs is absorbed: a drained stream re-emits nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream5").toString
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    def feed(from: Long, until: Long): Unit =
      spark.range(from, until).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(src)
    def runOnePass(): Unit = {
      val q = spark.readStream.format("arrow-ipc").load(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    (0 until 4).foreach(i => feed(i * 25, (i + 1) * 25))
    runOnePass()
    assert(spark.read.parquet(out).count() === 100)

    // maintenance rewrites the four drained files into one
    assert(ArrowMaintenance.compact(spark, src).get.newFiles === 1)

    // restart: the compacted file is absorbed — zero rows re-emitted
    runOnePass()
    assert(spark.read.parquet(out).count() === 100, "compaction re-emitted rows")

    // later appends still arrive exactly once, and a second compaction
    // (folding the absorbed file with the drained append) absorbs again
    feed(100, 130)
    runOnePass()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      === (0L until 130L))
    assert(ArrowMaintenance.compact(spark, src).get.oldFiles === 2)
    runOnePass()
    assert(spark.read.parquet(out).count() === 130)
  }

  test("offsets compact to the live set: checkpoints track file count, not ingest history") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream6").toString
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    def feed(from: Long, until: Long): Unit =
      spark.range(from, until).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(src)
    def runOnePass(): Unit = {
      val q = spark.readStream.format("arrow-ipc").load(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def latestOffsetNames(): Seq[String] = {
      // newest offsets file in the checkpoint: one JSON array per source
      val dir = java.nio.file.Paths.get(ckpt, "offsets")
      val newest = java.nio.file.Files.list(dir).toArray.map(_.toString)
        .filter(p => new java.io.File(p).getName.forall(_.isDigit))
        .maxBy(p => new java.io.File(p).getName.toLong)
      val line = scala.io.Source.fromFile(newest).getLines()
        .find(_.trim.startsWith("[")).getOrElse("[]")
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(line) match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      }
    }

    // 8 small ingest commits → offset = 8 names
    (0 until 8).foreach(i => feed(i * 10, (i + 1) * 10))
    runOnePass()
    assert(latestOffsetNames().size === 8)

    // compaction folds 8 → 1; the next DRAINED poll absorbs the new file
    // and compacts the offset down to the live set — the 8 historical
    // names are gone from the checkpoint, not carried forever
    assert(ArrowMaintenance.compact(spark, src).get.newFiles === 1)
    feed(80, 90) // a data-carrying trigger so a batch (and offset) lands
    runOnePass()
    assert(spark.read.parquet(out).count() === 90)
    val afterCompact = latestOffsetNames()
    assert(afterCompact.size === 2,
      s"offset must shrink to the live set, got $afterCompact")

    // exactly-once survives the shrink: restart + more appends
    feed(90, 120)
    runOnePass()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      === (0L until 120L))
  }

  test("autoCompactEvery: the sink maintains its own directory; exactly-once holds end to end") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream7").toString
    val (dir, ckpt) = (s"$base/out", s"$base/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().select(col("value").as("id")).coalesce(1)
      .writeStream.format("arrow-ipc")
      .option("checkpointLocation", ckpt)
      .option("autoCompactEvery", "3")
      .start(dir)
    try {
      (0 until 9).foreach { i =>
        mem.addData((i * 50L) until ((i + 1) * 50L))
        q.processAllAvailable()
      }
      // compaction is asynchronous single-flight: wait for the debt to fold
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val deadline = System.currentTimeMillis() + 120000
      def live() = graft.sources.ArrowSnapshots.listDataFiles(
        fs, new org.apache.hadoop.fs.Path(dir)).size
      while (live() > 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(live() <= 4, s"auto-compact never folded the debt: ${live()} files")
      // one more epoch AFTER maintenance: the ledger still accepts commits
      mem.addData(450L until 500L); q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 500)
    assert(back.select("id").distinct().count() === 500)
    // a fresh downstream streaming reader absorbs the sink's own
    // maintenance: every row exactly once
    val ck2 = java.nio.file.Files.createTempDirectory("graft_as7_ck2").toString
    val echo = spark.readStream.format("arrow-ipc").load(dir)
      .writeStream.format("memory").queryName("auto_compact_echo")
      .option("checkpointLocation", ck2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    echo.awaitTermination(120000)
    assert(spark.table("auto_compact_echo").count() === 500)
    assert(spark.table("auto_compact_echo")
      .select("id").distinct().count() === 500)
    // the option is streaming-only: a batch append refuses loudly
    val e = intercept[Exception] {
      spark.range(5).toDF("id").write.format("arrow-ipc")
        .option("autoCompactEvery", "4").mode("append").save(s"$base/other")
    }
    assert(e.getMessage.contains("streaming-sink option") ||
      Option(e.getCause).exists(_.getMessage.contains("streaming-sink option")))
  }

  test("Trigger.AvailableNow processes the start-time snapshot in bounded batches, then stops") {
    val base = java.nio.file.Files.createTempDirectory("graft_arrowstream4").toString
    val src = s"$base/src"
    (0 until 3).foreach { i =>
      spark.range(i * 10, (i + 1) * 10).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(src)
    }
    val q = spark.readStream.format("arrow-ipc")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream.format("memory").queryName("graft_arrow_avnow")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow terminates on its own once the snapshot is drained
    assert(q.awaitTermination(60000), "query did not self-terminate")
    assert(spark.table("graft_arrow_avnow").count() === 30)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes === Seq(10L, 10L, 10L), s"expected 3 bounded batches, got $sizes")
  }
}

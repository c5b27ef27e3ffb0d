package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowMaintenance

/** The change feed as a Structured Streaming SOURCE: snapshot-id offsets,
  * net file deltas per micro-batch, insert/delete rows with
  * `_change_type`, exactly-once across checkpointed restarts, and loud
  * refusal when the window's history expired. */
class ArrowChangeStreamSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.ArrowCatalog].getName)
    s
  }
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(name: String): Seq[(Long, String, String)] =
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[String]("_change_type"))).sorted.toSeq

  test("bootstrap emits the standing set as inserts; live mutations stream as deltas") {
    val base = tmp("graft_cdc")
    val dir = s"$base/t"
    (0 until 2).foreach { i =>
      Seq((i * 10L, s"a$i"), (i * 10 + 1L, s"b$i")).toDF("id", "v")
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .save(dir)
    }
    val q = spark.readStream.format("arrow-ipc")
      .option("changeFeed", true).load(dir)
      .writeStream.format("memory").queryName("cdc_live")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // bootstrap: both appends' rows arrive as inserts
      assert(rows("cdc_live") === Seq((0L, "a0", "insert"), (1L, "b0", "insert"),
        (10L, "a1", "insert"), (11L, "b1", "insert")))
      // a live append streams in
      Seq((20L, "c2")).toDF("id", "v")
        .write.format("arrow-ipc").mode("append").save(dir)
      q.processAllAvailable()
      assert(rows("cdc_live").count(_._3 == "insert") === 5)
      // a metadata DELETE streams out as delete rows (old image from trash)
      ArrowMaintenance.deleteWhere(spark, dir,
        Array(org.apache.spark.sql.sources.EqualTo("v", "c2")))
      q.processAllAvailable()
      assert(rows("cdc_live").filter(_._3 == "delete") === Seq((20L, "c2", "delete")))
    } finally q.stop()
  }

  test("a checkpointed restart resumes at the next snapshot, exactly once") {
    val base = tmp("graft_cdc_ckpt")
    val dir = s"$base/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").coalesce(1)
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    def drain(): Unit = {
      val q = spark.readStream.format("arrow-ipc")
        .option("changeFeed", true).load(dir)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.parquet(s"$base/out").count() === 2)
    // UPDATE between runs: COW amplification = old-image delete + new insert
    spark.sql(s"UPDATE graft.`$dir` SET v = 'yy' WHERE id = 2")
    drain()
    val out = spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[String]("_change_type"))).sorted.toSeq
    // the rewritten FILE carried both rows, so both old images delete and
    // both survivors re-insert (file-granular amplification — net state
    // reconciles by key)
    assert(out.count(_._3 == "delete") === 2)
    assert(out.filter(e => e._1 == 2L && e._3 == "insert").map(_._2) === Seq("y", "yy"))
    // net state by key (latest insert minus deletes) matches the table
    assert(spark.read.format("arrow-ipc").load(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "yy")))
  }

  test("hive layouts feed with partition values; admission caps snapshots per batch") {
    val base = tmp("graft_cdc_hive")
    val dir = s"$base/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"g${i % 2}")).toDF("id", "part")
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .option("hivePartitionKeys", "part").save(dir)
    }
    val q = spark.readStream.format("arrow-ipc")
      .option("changeFeed", true)
      .option("maxSnapshotsPerTrigger", 1).load(dir)
      .writeStream.format("memory").queryName("cdc_hive")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cdc_hive").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("part"),
        r.getAs[String]("_change_type"))).sorted.toSeq
    assert(got === Seq((0L, "g0", "insert"), (1L, "g1", "insert"),
      (2L, "g0", "insert")))
    // one snapshot per micro-batch: three non-empty batches
    assert(q.recentProgress.count(_.numInputRows > 0) === 3)
  }

  test("a pure maintenance rewrite (compact, cluster) is absorbed — zero feed rows") {
    val base = tmp("graft_cdc_absorb")
    val dir = s"$base/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .save(dir)
    }
    def drain(): Long = {
      val q = spark.readStream.format("arrow-ipc")
        .option("changeFeed", true).load(dir)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$base/out").count()
    }
    assert(drain() === 3) // bootstrap
    // rows only MOVE: neither rewrite may emit a single feed row
    assert(ArrowMaintenance.compact(spark, dir).isDefined)
    assert(drain() === 3)
    assert(ArrowMaintenance.cluster(spark, dir, Seq("id")).isDefined)
    assert(drain() === 3)
    // while a genuine append still streams
    Seq((9L, "v9")).toDF("id", "v")
      .write.format("arrow-ipc").mode("append").save(dir)
    assert(drain() === 4)
    val out = spark.read.parquet(s"$base/out")
    assert(out.filter(col("_change_type") === "delete").count() === 0)
  }

  test("a dataset whose schema claims _change_type refuses the feed loudly") {
    val base = tmp("graft_cdc_clash")
    val dir = s"$base/t"
    Seq((1L, "insert")).toDF("id", "_change_type")
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      spark.readStream.format("arrow-ipc")
        .option("changeFeed", true).load(dir)
    }
    assert(e.getMessage.contains("_change_type"))
  }

  test("startingTimestamp starts the feed at the first snapshot at-or-after t") {
    val base = tmp("graft_cdc_ts")
    val dir = s"$base/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .save(dir)
      Thread.sleep(5) // distinct snapshot tsMillis
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = graft.sources.ArrowSnapshots.read(fs,
      new org.apache.hadoop.fs.Path(dir))
    // pick t = snapshot 2's own commit time: 2 and 3 are at-or-after
    val t = snaps.find(_.id == 2).get.tsMillis
    val q = spark.readStream.format("arrow-ipc")
      .option("changeFeed", true)
      .option("startingTimestamp", t.toString).load(dir)
      .writeStream.format("memory").queryName("cdc_ts")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("cdc_ts").select("id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    // both options together refuse
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("arrow-ipc")
        .option("changeFeed", true)
        .option("startingTimestamp", t.toString)
        .option("startingSnapshot", 1).load(dir)
        .writeStream.format("memory").queryName("cdc_ts2")
        .option("checkpointLocation", s"$base/ckpt2").start()
      try { q2.processAllAvailable(); q2.awaitTermination(10000) }
      finally q2.stop()
    }
    def msgs(th: Throwable): Seq[String] =
      if (th == null) Nil else Option(th.getMessage).toSeq ++ msgs(th.getCause)
    assert(msgs(e).exists(_.contains("mutually exclusive")))
  }

  test("streaming-sink epochs feed the CDC stream one batch per epoch") {
    val base = tmp("graft_cdc_epochs")
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Long)]
    val sink = in.toDF().toDF("part", "v")
      .writeStream.format("arrow-ipc")
      .option("hivePartitionKeys", "part")
      .option("checkpointLocation", s"$base/ckpt_in")
      .start(s"$base/lake")
    try {
      in.addData(("x", 1L)); sink.processAllAvailable()
      in.addData(("y", 2L)); sink.processAllAvailable()
      in.addData(("x", 3L)); sink.processAllAvailable()
    } finally sink.stop()
    // each committed epoch wrote one snapshot entry; the CDC consumer
    // replays them one micro-batch per epoch, partition values intact
    val q = spark.readStream.format("arrow-ipc")
      .option("changeFeed", true)
      .option("maxSnapshotsPerTrigger", 1).load(s"$base/lake")
      .writeStream.format("memory").queryName("cdc_epochs")
      .option("checkpointLocation", s"$base/ckpt_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) === 3)
    assert(spark.table("cdc_epochs").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("v"),
        r.getAs[String]("_change_type"))).sorted.toSeq ===
      Seq(("x", 1L, "insert"), ("x", 3L, "insert"), ("y", 2L, "insert")))
  }

  test("expired history refuses a checkpointed window instead of serving a partial delta") {
    val base = tmp("graft_cdc_exp")
    val dir = s"$base/t"
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .save(dir)
    }
    // a consumer checkpointed at snapshot 1
    def drain(): Unit = {
      val q = spark.readStream.format("arrow-ipc")
        .option("changeFeed", true)
        .option("startingSnapshot", 1).load(dir)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.parquet(s"$base/out").count() === 2) // snaps 2..3
    // history collapses past the consumer's start; a NEW consumer pinned
    // at the expired snapshot refuses loudly
    ArrowMaintenance.expireSnapshots(spark, dir, keepFrom = 3)
    val e = intercept[Exception] {
      val q = spark.readStream.format("arrow-ipc")
        .option("changeFeed", true)
        .option("startingSnapshot", 1).load(dir)
        .writeStream.format("parquet")
        .option("path", s"$base/out2")
        .option("checkpointLocation", s"$base/ckpt2")
        .start()
      try { q.processAllAvailable(); q.awaitTermination(10000) }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("no snapshot 1")))
    // while the surviving consumer (start already checkpointed PAST the
    // expiry base) keeps draining fine
    Seq((9L, "v9")).toDF("id", "v")
      .write.format("arrow-ipc").mode("append").save(dir)
    drain()
    assert(spark.read.parquet(s"$base/out").count() === 3)
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowSnapshots, ArrowStreamCommits}


/** Streaming INTO a hive-partitioned layout: epoch files land inside
  * `key=value/` directories under the same exactly-once ledger contract
  * as the flat sink, the layout declaration precedes the first commit,
  * nested orphans sweep, and the snapshot log records nested paths. */
class ArrowStreamHiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("epochs land in value directories; reads, pruning and history compose") {
    val base = java.nio.file.Files.createTempDirectory("graft_shive").toString
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("part", "v")
      .writeStream.format("arrow-ipc")
      .option("hivePartitionKeys", "part")
      .option("checkpointLocation", ckpt)
      .start(out)
    try {
      in.addData(("x", 1L), ("y", 2L), ("x", 3L))
      q.processAllAvailable()
      in.addData(("y", 4L), ("z", 5L))
      q.processAllAvailable()
    } finally q.stop()

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // files are nested, stream-named, and the layout is declared
    assert(fs.exists(new org.apache.hadoop.fs.Path(out, "part=x")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(out, "part=z")))
    val rels = ArrowSnapshots.listDataFiles(fs, new org.apache.hadoop.fs.Path(out))
    assert(rels.nonEmpty && rels.forall(_.contains("/")))
    assert(rels.forall(r => ArrowStreamCommits.isStreamName(
      new org.apache.hadoop.fs.Path(r).getName)))

    val back = spark.read.format("arrow-ipc").load(out)
    assert(back.count() === 5)
    assert(back.groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 2L, "y" -> 2L, "z" -> 1L))
    // partition pruning through the directory values
    val pruned = back.filter(col("part") === "x")
    assert(pruned.select("v").as[Long].collect().sorted.toSeq === Seq(1L, 3L))

    // the snapshot log recorded NESTED relative paths, one entry per epoch
    val snaps = ArrowSnapshots.read(fs, new org.apache.hadoop.fs.Path(out))
    assert(snaps.length === 2)
    assert(snaps.flatMap(_.adds).toSet === rels.toSet)
    // time travel to epoch 1's snapshot
    val v1 = spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(out)
    assert(v1.count() === 3)
  }

  test("a hive-partitioned directory streams back out with partition values spliced") {
    val base = java.nio.file.Files.createTempDirectory("graft_shive_src").toString
    val src = s"$base/src"
    // two committed batch appends → two generations of nested files
    Seq(("a", 1L), ("b", 2L)).toDF("part", "v")
      .write.format("arrow-ipc").mode("overwrite")
      .option("hivePartitionKeys", "part").save(src)
    Seq(("a", 3L), ("c", 4L)).toDF("part", "v")
      .write.format("arrow-ipc").mode("append").save(src)

    // a restart-capable sink (parquet) so one checkpoint spans both runs
    def drain(): Unit = {
      val q = spark.readStream.format("arrow-ipc").load(src)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).sorted.toSeq ===
      Seq(("a", 1L), ("a", 3L), ("b", 2L), ("c", 4L)))

    // a third append lands while the stream is down; the restart emits
    // ONLY the difference (exactly-once across the checkpoint)
    Seq(("b", 5L)).toDF("part", "v")
      .write.format("arrow-ipc").mode("append").save(src)
    drain()
    assert(spark.read.parquet(s"$base/out").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).sorted.toSeq ===
      Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 5L), ("c", 4L)))
  }

  test("hive streams compose: a streamed-in lake streams back out, admission-capped") {
    val base = java.nio.file.Files.createTempDirectory("graft_shive_loop").toString
    implicit val sql = spark.sqlContext
    // stage 1: stream INTO a hive layout (the ingestion sink)
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("part", "v")
      .writeStream.format("arrow-ipc")
      .option("hivePartitionKeys", "part")
      .option("checkpointLocation", s"$base/ckpt_in")
      .start(s"$base/lake")
    try {
      in.addData(("x", 1L), ("y", 2L))
      q.processAllAvailable()
      in.addData(("x", 3L))
      q.processAllAvailable()
    } finally q.stop()
    // stage 2: stream OUT of it, one file per micro-batch
    val q2 = spark.readStream.format("arrow-ipc")
      .option("maxFilesPerTrigger", 1).load(s"$base/lake")
      .writeStream.format("memory").queryName("shive_loop")
      .option("checkpointLocation", s"$base/ckpt_out")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("shive_loop").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).sorted.toSeq ===
      Seq(("x", 1L), ("x", 3L), ("y", 2L)))
    // admission control really split the drain into one-file batches
    assert(q2.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("a checkpointed hive stream absorbs a compaction without re-emitting") {
    val base = java.nio.file.Files.createTempDirectory("graft_shive_cpt").toString
    val src = s"$base/src"
    (0 until 2).foreach { i =>
      Seq(("p", i * 10L), ("q", i * 10L + 1)).toDF("part", "v")
        .write.format("arrow-ipc").mode(if (i == 0) "overwrite" else "append")
        .option("hivePartitionKeys", "part").save(src)
    }
    def drain(): Long = {
      val q = spark.readStream.format("arrow-ipc").load(src)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$base/out").count()
    }
    assert(drain() === 4)
    // maintenance between runs: value dirs compact, lineage records it
    assert(graft.sources.ArrowMaintenance.compact(spark, src).isDefined)
    // one genuinely new append after the compaction
    Seq(("p", 99L)).toDF("part", "v")
      .write.format("arrow-ipc").mode("append").save(src)
    // the restart emits ONLY the append: the compacted files' ancestry is
    // fully covered by the checkpoint, so they are absorbed silently
    assert(drain() === 5)
    val out = spark.read.parquet(s"$base/out")
    assert(out.groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("p" -> 3L, "q" -> 2L))
  }

  test("a mismatched stream layout refuses; a crashed epoch's nested orphans sweep") {
    val base = java.nio.file.Files.createTempDirectory("graft_shive2").toString
    val out = s"$base/out"
    val ckpt1 = s"$base/ckpt1"
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("part", "v")
      .writeStream.format("arrow-ipc")
      .option("hivePartitionKeys", "part")
      .option("checkpointLocation", ckpt1)
      .start(out)
    try { in.addData(("x", 1L)); q.processAllAvailable() } finally q.stop()

    // a new stream declaring a DIFFERENT layout refuses at run start
    val in2 = MemoryStream[(String, Long)]
    val q2 = in2.toDF().toDF("part", "v")
      .writeStream.format("arrow-ipc")
      .option("checkpointLocation", s"$base/ckpt2")
      .option("hivePartitionKeys", "")
      .start(out)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      in2.addData(("x", 9L)); q2.processAllAvailable(); q2.awaitTermination(10000)
    }
    assert((e.getMessage + Option(e.getCause).fold("")(c =>
      Option(c.getMessage).getOrElse(""))).contains("standing layout"))

    // manufacture a crashed epoch: an uncommitted stream-named file
    // inside a value directory — invisible to reads, swept at run start
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(out,
      "part=x/part-00000-g0000-e9-99999999-9999-9999-9999-999999999999.arrows")
    val os = fs.create(orphan, true); os.write(Array[Byte](1, 2, 3)); os.close()
    assert(spark.read.format("arrow-ipc").load(out).count() === 1)
    // the sweep is staleness-gated under OCC (a fresh uncommitted file
    // may be a live epoch); collapse the window to simulate a dead run
    spark.conf.set("spark.graft.arrow.occStaleMs", "-1")
    val swept =
      try ArrowStreamCommits.cleanOrphans(fs, new org.apache.hadoop.fs.Path(out))
      finally spark.conf.unset("spark.graft.arrow.occStaleMs")
    assert(swept.exists(_.contains("part=x/")))
    assert(!fs.exists(orphan))
  }
}

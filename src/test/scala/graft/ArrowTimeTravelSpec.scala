package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowMaintenance, ArrowSnapshots}

/** Time travel: every committed mutation appends a delta entry to
  * the `_snapshots/` log; removed files retire to `.trash/` instead of
  * dying; `VERSION AS OF` / `TIMESTAMP AS OF` / the `asOfSnapshot` read
  * option reconstruct any retained snapshot;
  * [[ArrowMaintenance.expireSnapshots]] bounds history. */
class ArrowTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.ArrowCatalog].getName)
    s
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snaps(dir: String) =
    ArrowSnapshots.read(fsOf(dir), new org.apache.hadoop.fs.Path(dir))

  test("append + COW delete are snapshots; every version reconstructs") {
    val dir = tmp("graft_tt_basic")
    spark.range(0, 100).select(col("id"))
      .repartitionByRange(2, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)       // snap 1
    spark.range(100, 150).select(col("id"))
      .write.format("arrow-ipc").mode("append").save(dir)          // snap 2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 2 = 0")        // snap 3 (COW)
    assert(snaps(dir).map(_.id) === Seq(1L, 2L, 3L))

    def asOf(v: Int) = spark.read.format("arrow-ipc")
      .option("asOfSnapshot", v).load(dir)
    assert(asOf(1).count() === 100)
    assert(asOf(2).count() === 150)
    assert(asOf(3).count() === 75)
    // live read matches the latest snapshot and ignores the trash
    assert(spark.read.format("arrow-ipc").load(dir).count() === 75)
    // SQL VERSION AS OF goes through the catalog
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir` VERSION AS OF 2")
      .head.getLong(0) === 150)
    // TIMESTAMP AS OF resolves the latest snapshot at/before the instant
    val ts2 = snaps(dir).find(_.id == 2).get.tsMillis
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .format(java.time.Instant.ofEpochMilli(ts2)
        .atZone(java.time.ZoneOffset.UTC))
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$dir` TIMESTAMP AS OF '$lit'")
      .head.getLong(0) === 150)
    // an unknown snapshot refuses loudly
    val e = intercept[Exception] { asOf(9).count() }
    assert(e.getMessage.contains("no snapshot 9") ||
      Option(e.getCause).exists(_.getMessage.contains("no snapshot 9")))
  }

  test("metadata-level DELETE is a snapshot too; trash serves the old files") {
    val dir = tmp("graft_tt_meta")
    import spark.implicits._
    val df = (0 until 300).map(i => (Seq("A", "B", "C")(i % 3), i.toLong))
      .toDF("k", "v")
    graft.sources.Sinks.writeKeyGrouped(df, dir, Seq("k"))          // snap 1
    spark.sql(s"DELETE FROM graft.`$dir` WHERE k = 'B'")            // snap 2
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
    val v1 = spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir)
    assert(v1.count() === 300)
    assert(v1.filter(col("k") === "B").count() === 100)
    // the B files really live in the trash now
    val fs = fsOf(dir)
    val trash = new org.apache.hadoop.fs.Path(dir, ".trash")
    assert(fs.exists(trash) && fs.listStatus(trash).nonEmpty)
  }

  test("hive layout: time travel reconstructs partition values (from trash paths)") {
    val dir = tmp("graft_tt_hive")
    import spark.implicits._
    (0 until 600).map(i => (Seq("x", "y")(i % 2), i.toLong)).toDF("part", "v")
      .write.format("arrow-ipc").option("hivePartitionKeys", "part")
      .mode("overwrite").save(dir)                                  // snap 1
    spark.sql(s"UPDATE graft.`$dir` SET part = 'z' WHERE part = 'y' AND v % 4 = 1") // snap 2
    val now = spark.read.format("arrow-ipc").load(dir)
    assert(now.filter(col("part") === "z").count() === 150)
    val v1 = spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir)
    assert(v1.count() === 600)
    assert(v1.filter(col("part") === "z").count() === 0)
    assert(v1.filter(col("part") === "y").count() === 300)
    // partition-column values decode from the archived paths exactly
    assert(v1.groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 300L, "y" -> 300L))
  }

  test("compaction keeps history: the pre-compaction snapshot still reads") {
    val dir = tmp("graft_tt_compact")
    spark.range(0, 100).coalesce(1)
      .write.format("arrow-ipc").mode("overwrite").save(dir)        // snap 1
    spark.range(100, 200).coalesce(1)
      .write.format("arrow-ipc").mode("append").save(dir)           // snap 2
    val r = ArrowMaintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(r.isDefined)                                             // snap 3
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
    assert(spark.read.format("arrow-ipc").option("asOfSnapshot", 2)
      .load(dir).count() === 200)
    assert(spark.read.format("arrow-ipc").option("asOfSnapshot", 1)
      .load(dir).count() === 100)
  }

  test("expireSnapshots collapses history and GCs the trash") {
    val dir = tmp("graft_tt_expire")
    spark.range(0, 100).select(col("id"))
      .repartitionByRange(2, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)        // snap 1
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 2 = 0")         // snap 2 (COW)
    spark.range(100, 110).write.format("arrow-ipc").mode("append").save(dir) // snap 3
    assert(spark.read.format("arrow-ipc").option("asOfSnapshot", 1)
      .load(dir).count() === 100)

    val res = ArrowMaintenance.expireSnapshots(spark, dir, keepFrom = 2L)
    assert(res.dropped === 1)
    assert(res.trashDeleted > 0)
    // the trash is empty (snapshot 2's and 3's files are all live)
    val fs = fsOf(dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ".trash")))
    // retained snapshots still reconstruct bit-identically
    assert(spark.read.format("arrow-ipc").option("asOfSnapshot", 2)
      .load(dir).count() === 50)
    assert(spark.read.format("arrow-ipc").option("asOfSnapshot", 3)
      .load(dir).count() === 60)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 60)
    // the expired snapshot refuses loudly
    val e = intercept[Exception] {
      spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir).count()
    }
    assert((e.getMessage + Option(e.getCause).fold("")(_.getMessage))
      .contains("no snapshot 1"))
  }

  test("a rewritten shard envelope never prunes a snapshot's trashed files") {
    val dir = tmp("graft_tt_envelope")
    val key = "spark.graft.arrow.statsShardFiles"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      import spark.implicits._
      val df = (0 until 300).map(i => (Seq("A", "B", "C")(i % 3), i.toLong))
        .toDF("k", "v")
      graft.sources.Sinks.writeKeyGrouped(df, dir, Seq("k"))        // snap 1, sharded
      spark.sql(s"DELETE FROM graft.`$dir` WHERE k = 'C'")          // snap 2 (metadata)
      // the LIVE shard envelope now spans only A..B — it would refute
      // k='C' — but snapshot 1's C files live in the trash and the
      // filtered as-of read must still find them (per-file stats only)
      val v1 = spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir)
      assert(v1.filter(col("k") === "C").count() === 100)
      assert(v1.count() === 300)
      // the live read still gets the envelope skip
      assert(spark.read.format("arrow-ipc").load(dir)
        .filter(col("k") === "C").count() === 0)
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("time travel is batch-only and pruning stays sound on mixed sets") {
    val dir = tmp("graft_tt_guard")
    spark.range(0, 400).select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)        // snap 1
    spark.sql(s"UPDATE graft.`$dir` SET v = -1 WHERE id < 50")      // snap 2
    // a filtered as-of read: live files (immutable) still prune by
    // stats; the trashed original of the rewritten file is simply kept
    val v1 = spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir)
    assert(v1.filter(col("id") >= 390).count() === 10)
    assert(v1.filter(col("v") === -1).count() === 0)
    // streaming refuses the option (raised on the stream thread)
    val q = spark.readStream.format("arrow-ipc").option("asOfSnapshot", 1)
      .load(dir).writeStream.format("noop").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(30000)
    }
    assert(e.getMessage.contains("batch-only") ||
      Option(e.getCause).exists(c =>
        Option(c.getMessage).exists(_.contains("batch-only"))))
  }

  test("tip pointer: O(1) id assignment, crash-stale and garbage tips heal, history intact") {
    val dirPath = new org.apache.hadoop.fs.Path(tmp("graft_tip"))
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tip = new org.apache.hadoop.fs.Path(dirPath, "_snapshots/_tip")
    def forceTip(body: String): Unit = {
      val out = fs.create(tip, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    assert(ArrowSnapshots.currentTip(fs, dirPath) === 0L)
    assert(ArrowSnapshots.append(fs, dirPath, Seq("a"), Nil) === 1L)
    assert(ArrowSnapshots.append(fs, dirPath, Seq("b"), Nil) === 2L)
    assert(fs.exists(tip), "appends must materialize the tip pointer")
    // crash shape: entry 2 landed but the tip write did not — the
    // forward probe heals without a listing
    forceTip("""{"id":1}""")
    assert(ArrowSnapshots.currentTip(fs, dirPath) === 2L)
    assert(ArrowSnapshots.append(fs, dirPath, Seq("c"), Nil) === 3L)
    // garbage tip degrades to the full listing, never a wrong id
    forceTip("not json")
    assert(ArrowSnapshots.currentTip(fs, dirPath) === 3L)
    // a crash-replayed identical delta is absorbed, not re-appended
    assert(ArrowSnapshots.append(fs, dirPath, Seq("c"), Nil) === 3L)
    // the log itself is untouched by all tip traffic
    assert(ArrowSnapshots.resolve(
      ArrowSnapshots.read(fs, dirPath), 3L).get === Set("a", "b", "c"))
    // a base checkpoint (expiry) keeps the tip consistent
    ArrowSnapshots.writeBase(fs, dirPath,
      ArrowSnapshots.Snapshot(2L, 0L, Seq("a", "b"), Nil))
    assert(ArrowSnapshots.currentTip(fs, dirPath) === 3L)
    assert(ArrowSnapshots.listIds(fs, dirPath) === Seq(2L, 3L))
    assert(ArrowSnapshots.append(fs, dirPath, Nil, Seq("a")) === 4L)
  }

  test("idsAfter/readRange serve the admission window O(delta); expiry refuses") {
    val dir = tmp("graft_tt_idsafter")
    (0 until 5).foreach { i =>                                 // snaps 1..5
      spark.range(i * 10, (i + 1) * 10).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(dir)
    }
    val fs = fsOf(dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    // steady state: the window constructs directly, no listing
    assert(ArrowSnapshots.idsAfter(fs, dirPath, 2L, 5L) ===
      Some(Seq(3L, 4L, 5L)))
    // bootstrap falls back (the base checkpoint's role needs the listing)
    assert(ArrowSnapshots.idsAfter(fs, dirPath, 0L, 5L) === None)
    assert(ArrowSnapshots.idsAfter(fs, dirPath, 5L, 5L) === None)
    val window = ArrowSnapshots.readRange(fs, dirPath, 2L, 4L, "a test")
    assert(window.map(_.id) === Seq(3L, 4L))
    assert(window.flatMap(_.adds).size === 2)
    // expire before snapshot 4: ids 1..3 collapse into the base
    ArrowMaintenance.expireSnapshots(spark, dir, 4L)
    assert(ArrowSnapshots.idsAfter(fs, dirPath, 2L, 5L) === None,
      "an expired `from` must fall back so the planner can refuse")
    assert(ArrowSnapshots.idsAfter(fs, dirPath, 4L, 5L) === Some(Seq(5L)))
    assert(ArrowSnapshots.readRange(fs, dirPath, 4L, 5L, "a test")
      .map(_.id) === Seq(5L))
    val e = intercept[IllegalArgumentException] {
      ArrowSnapshots.readRange(fs, dirPath, 2L, 5L, "a test")
    }
    assert(e.getMessage.contains("expired"))
    // bootstrap over the collapsed log folds the base's cumulative adds
    val boot = ArrowSnapshots.readRange(fs, dirPath, 0L, 5L, "a test")
    assert(boot.map(_.id) === Seq(4L, 5L))
    assert(ArrowSnapshots.resolve(boot, 5L).get.size === 5)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowBloom, ArrowFileStats, BloomStats}

/** Bloom-filter file pruning (`option("bloomColumns", …)`) — the
  * point-lookup shape interval stats cannot serve: after a hash
  * repartition every file's min/max spans nearly the whole key domain, so
  * `id = X` keeps every file on intervals alone; the per-file Bloom
  * filter skips the files that provably never saw X. False positives
  * only keep files (advisory contract); false negatives are structurally
  * excluded (builder refuses — emits nothing — rather than under-record).
  */
class ArrowBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head.scan.description()

  private def keptOf(desc: String): (Int, Int) = {
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
    (m.group(1).toInt, m.group(2).toInt)
  }

  // ── unit: builder / membership / serialization ────────────────────────

  test("builder: every added key is contained; absent keys mostly not") {
    val b = new ArrowBloom.Builder
    val present = (0 until 5000).map(i => s"doc-$i")
    present.foreach(b.add)
    val bf = b.result().get
    assert(present.forall(ArrowBloom.mightContain(bf, _)), "false negative")
    val absentHits = (0 until 5000)
      .count(i => ArrowBloom.mightContain(bf, s"nope-$i"))
    assert(absentHits < 250, s"fpp way over target: $absentHits/5000") // ~0.8% expected
  }

  test("builder: duplicate adds count one distinct; empty yields no bloom") {
    val b = new ArrowBloom.Builder
    (0 until 1000).foreach(_ => b.add("same"))
    assert(b.distinct === 1)
    assert((new ArrowBloom.Builder).result().isEmpty)
  }

  test("b64 roundtrip is exact; malformed payloads degrade to None") {
    val b = new ArrowBloom.Builder
    (0 until 100).foreach(i => b.add(i.toString))
    val bf = b.result().get
    val back = ArrowBloom.fromB64(bf.k, ArrowBloom.toB64(bf)).get
    assert(back.k === bf.k && back.bits.sameElements(bf.bits))
    assert(ArrowBloom.fromB64(bf.k, "!!!not-base64!!!").isEmpty)
    assert(ArrowBloom.fromB64(0, ArrowBloom.toB64(bf)).isEmpty) // bad k
    // 24 bytes = 3 longs: not a power of two → refuse (mask math breaks)
    assert(ArrowBloom.fromB64(3, java.util.Base64.getEncoder
      .encodeToString(new Array[Byte](24))).isEmpty)
  }

  test("merge: identical geometry ORs; mismatched geometry refuses") {
    def bloomOf(keys: Seq[String]): BloomStats = {
      val b = new ArrowBloom.Builder
      keys.foreach(b.add)
      b.result().get
    }
    // same distinct count → same sizing → mergeable
    val b1 = bloomOf((0 until 100).map(i => s"a-$i"))
    val b2 = bloomOf((0 until 100).map(i => s"b-$i"))
    val m = ArrowBloom.merge(Seq(b1, b2)).get
    assert((0 until 100).forall(i => ArrowBloom.mightContain(m, s"a-$i")))
    assert((0 until 100).forall(i => ArrowBloom.mightContain(m, s"b-$i")))
    // 100 vs 10000 distinct → different m → refuse
    val big = bloomOf((0 until 10000).map(i => s"c-$i"))
    assert(ArrowBloom.merge(Seq(b1, big)).isEmpty)
  }

  test("manifest JSON carries the bloom through toJson/parse") {
    val b = new ArrowBloom.Builder
    (0 until 50).foreach(i => b.add(i.toString))
    val st = graft.sources.FileStats(50, Map("id" -> graft.sources.ColStats(
      "long", Some("0"), Some("49"), 0, None, b.result())))
    val back = ArrowFileStats.parse(ArrowFileStats.toJson(Map("f" -> st)))
    val c = back("f").cols("id")
    assert(c.bloom.isDefined)
    assert(ArrowBloom.mightContain(c.bloom.get, "7"))
  }

  // ── end-to-end: DSv2 write option + scan pruning ──────────────────────

  test("point lookup on a hash-partitioned id prunes via bloom, not interval") {
    val dir = tmp("graft_bloom_point")
    // hash repartition: every file's id interval spans ~the full domain,
    // so interval pruning is structurally useless here
    spark.range(0, 8000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8, col("id"))
      .write.format("arrow-ipc").option("bloomColumns", "id")
      .mode("overwrite").save(dir)

    val df = spark.read.format("arrow-ipc").load(dir).filter(col("id") === 4242L)
    assert(df.count() === 1) // correctness first
    val (kept, total) = keptOf(scanDesc(df))
    assert(total === 8)
    assert(kept <= 2, s"bloom should keep ~1 of 8 files, kept $kept")

    // absent key: every file refuted (fpp may keep a stray one)
    val none = spark.read.format("arrow-ipc").load(dir)
      .filter(col("id") === 999999L)
    assert(none.count() === 0)
    assert(keptOf(scanDesc(none))._1 <= 1)

    // no false negatives across a sample of present keys
    val sample = Seq(0L, 17L, 1234L, 4095L, 7999L)
    sample.foreach { id =>
      val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") === id)
      assert(q.count() === 1, s"present id $id wrongly pruned")
    }
  }

  test("standing bloom inheritance: option-less appends keep blooming; truncate resets") {
    val dir = tmp("graft_bloom_inherit")
    spark.range(0, 2000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(2, col("id"))
      .write.format("arrow-ipc").option("bloomColumns", "id")
      .mode("overwrite").save(dir)
    // the forgetful ingest job: an APPEND with no bloom option must
    // inherit the standing set — its files bloom `id` too
    spark.range(2000, 4000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(2, col("id"))
      .write.format("arrow-ipc").mode("append").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = graft.sources.ArrowFileStats.read(
      fs, new org.apache.hadoop.fs.Path(dir))
    assert(stats.size === 4)
    assert(stats.values.forall(_.cols("id").bloom.isDefined),
      "appended files must inherit the standing bloom declaration")
    // a point lookup in the APPENDED range prunes through the new blooms
    val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") === 3333L)
    assert(q.count() === 1)
    assert(keptOf(scanDesc(q))._1 <= 2)
    // the streaming sink inherits too
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bloom_ckpt").toString
    val sq = mem.toDF().select(col("value").as("id"), (col("value") % 7).as("v"))
      .writeStream.format("arrow-ipc")
      .option("checkpointLocation", ckpt).start(dir)
    try { mem.addData(4000L until 4100L); sq.processAllAvailable() }
    finally sq.stop()
    val stats2 = graft.sources.ArrowFileStats.read(
      fs, new org.apache.hadoop.fs.Path(dir))
    val streamed = stats2.keys.filter(
      graft.sources.ArrowStreamCommits.isStreamName)
    assert(streamed.nonEmpty &&
      streamed.forall(n => stats2(n).cols("id").bloom.isDefined),
      "stream-epoch files must inherit the standing bloom declaration")
    // overwrite resets the declaration: fresh files carry no blooms
    spark.range(10).select(col("id"), (col("id") % 7).as("v"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val stats3 = graft.sources.ArrowFileStats.read(
      fs, new org.apache.hadoop.fs.Path(dir))
    assert(stats3.values.forall(_.cols("id").bloom.isEmpty))
  }

  test("IN-list prunes to the union of member files") {
    val dir = tmp("graft_bloom_in")
    spark.range(0, 4000).select(col("id"))
      .repartition(4, col("id"))
      .write.format("arrow-ipc").option("bloomColumns", "id")
      .mode("overwrite").save(dir)
    val present = spark.read.format("arrow-ipc").load(dir)
      .filter(col("id").isin(100L, 2000L))
    assert(present.count() === 2)
    assert(keptOf(scanDesc(present))._1 <= 3)
    val absent = spark.read.format("arrow-ipc").load(dir)
      .filter(col("id").isin(100000L, 200000L))
    assert(absent.count() === 0)
    assert(keptOf(scanDesc(absent))._1 <= 1)
  }

  test("string bloom outlives an invalidated interval (>256-byte values)") {
    val dir = tmp("graft_bloom_longstr")
    val pad = "x" * 300 // > 256 bytes → interval stats refuse the column
    val rows = (0 until 1000).map(i => (i.toLong, s"$pad-$i"))
    import spark.implicits._
    rows.toDF("id", "text").repartition(4, col("text"))
      .write.format("arrow-ipc").option("bloomColumns", "text")
      .mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = ArrowFileStats.read(fs, new org.apache.hadoop.fs.Path(dir))
    assert(stats.values.forall(_.cols("text").min.isEmpty), "interval should refuse")
    assert(stats.values.forall(_.cols("text").bloom.isDefined), "bloom should stand")

    val hit = spark.read.format("arrow-ipc").load(dir)
      .filter(col("text") === s"$pad-123")
    assert(hit.count() === 1)
    assert(keptOf(scanDesc(hit))._1 <= 2)
    val miss = spark.read.format("arrow-ipc").load(dir)
      .filter(col("text") === s"$pad-99999")
    assert(miss.count() === 0)
    assert(keptOf(scanDesc(miss))._1 <= 1)
  }

  test("decimal literals probe scale-free: 9.5 finds a stored 9.50") {
    val dir = tmp("graft_bloom_dec")
    import spark.implicits._
    Seq(("a", BigDecimal("9.50")), ("b", BigDecimal("12.75")))
      .toDF("k", "price")
      .select(col("k"), col("price").cast("decimal(12,2)").as("price"))
      .write.format("arrow-ipc").option("bloomColumns", "price")
      .mode("overwrite").save(dir)
    val q = spark.read.format("arrow-ipc").load(dir)
      .filter(col("price") === lit(BigDecimal("9.5")))
    assert(q.count() === 1, "trailing-zero scale difference must not split the bloom")
  }

  test("bloom on a double column is refused loudly at write") {
    val dir = tmp("graft_bloom_dbl")
    val e = intercept[Exception] {
      spark.range(10).select(col("id").cast("double").as("d"))
        .write.format("arrow-ipc").option("bloomColumns", "d")
        .mode("overwrite").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("bloomColumns")))
  }

  test("nulls stay out of the bloom; point lookups still work alongside them") {
    val dir = tmp("graft_bloom_null")
    spark.range(0, 100)
      .select(when(col("id") % 3 === 0, col("id")).as("id"))
      .repartition(2)
      .write.format("arrow-ipc").option("bloomColumns", "id")
      .mode("overwrite").save(dir)
    val df = spark.read.format("arrow-ipc").load(dir).filter(col("id") === 33L)
    assert(df.count() === 1)
    val nulls = spark.read.format("arrow-ipc").load(dir).filter(col("id").isNull)
    assert(nulls.count() === 66)
  }

  test("uniform sharded commits carry an envelope bloom; lookups skip whole commits") {
    val dir = tmp("graft_bloom_shard")
    val key = "spark.graft.arrow.statsShardFiles"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      // two sharded commits, ids hash-spread within each (intervals overlap
      // across commits too — only blooms can tell them apart)
      spark.range(0, 4000).select(col("id"))
        .repartition(4, col("id"))
        .write.format("arrow-ipc").option("bloomColumns", "id")
        .mode("overwrite").save(dir)
      spark.range(100000, 104000).select(col("id"))
        .repartition(4, col("id"))
        .write.format("arrow-ipc").option("bloomColumns", "id")
        .mode("append").save(dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val idx = ArrowFileStats.readIndex(fs, new org.apache.hadoop.fs.Path(dir))
      assert(idx.size === 2)
      assert(idx.values.forall(_.cols("id").bloom.isDefined),
        "uniform per-file sizing should merge into an envelope bloom")

      val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") === 101234L)
      assert(q.count() === 1)
      // second commit: 1 of its 4 files; first commit refuted at envelope
      assert(keptOf(scanDesc(q))._1 <= 2)
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("saturation: past MaxDistinct the builder refuses (no false negatives)") {
    val b = new ArrowBloom.Builder
    var i = 0
    val n = ArrowBloom.MaxDistinct + 2
    while (i < n) { b.add(i.toString); i += 1 }
    assert(b.result().isEmpty, "saturated builder must emit nothing")
  }
}

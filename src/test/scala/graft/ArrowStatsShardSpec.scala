package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowFileStats

/** Sharded stats manifests — the 100 TB shape of `_stats.json`. A commit
  * at/above `spark.graft.arrow.statsShardFiles` writes its own
  * `_stats-<queryId>.json` plus an envelope row in `_stats_index.json`;
  * planning skips whole commits whose envelope refutes the pushed filters
  * WITHOUT loading their per-file stats (membership derives from the file
  * name, which embeds the commit's queryId). */
class ArrowStatsShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withShardThreshold[T](n: Int)(body: => T): T = {
    val key = "spark.graft.arrow.statsShardFiles"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head.scan.description()

  test("a large commit shards its stats; a small one merges into the base") {
    val dir = tmp("graft_shard_split")
    withShardThreshold(3) {
      spark.range(0, 1000).select(col("id"))
        .repartition(4) // 4 files ≥ threshold → shard
        .write.format("arrow-ipc").mode("overwrite").save(dir)
      val fs = fsOf(dir)
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      assert(ArrowFileStats.shardIds(fs, dirPath).size === 1)
      assert(ArrowFileStats.readIndex(fs, dirPath).size === 1)
      assert(ArrowFileStats.readBase(fs, dirPath).isEmpty)
      // full read folds the shard in; every data file covered
      val full = ArrowFileStats.read(fs, dirPath)
      assert(full.size === 4 && full.values.map(_.rows).sum === 1000L)

      // below-threshold append goes to the base manifest
      spark.range(1000, 1100).select(col("id"))
        .repartition(2) // 2 files < threshold → base merge
        .write.format("arrow-ipc").mode("append").save(dir)
      assert(ArrowFileStats.readBase(fs, dirPath).size === 2)
      assert(ArrowFileStats.read(fs, dirPath).size === 6)

      // the index envelope carries the commit-wide interval
      val env = ArrowFileStats.readIndex(fs, dirPath).values.head
      assert(env.rows === 1000L)
      assert(env.cols("id").min.contains("0") && env.cols("id").max.contains("999"))
    }
  }

  test("envelope refutation skips a whole commit without loading its shard") {
    val dir = tmp("graft_shard_skip")
    withShardThreshold(2) {
      // two sharded commits with disjoint id ranges
      spark.range(0, 10000).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id"))
        .write.format("arrow-ipc").mode("overwrite").save(dir)
      spark.range(10000, 20000).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id"))
        .write.format("arrow-ipc").mode("append").save(dir)
      val fs = fsOf(dir)
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val shards = ArrowFileStats.shardIds(fs, dirPath)
      assert(shards.size === 2)

      // control: a filter touching both ranges reads from both commits
      val both = spark.read.format("arrow-ipc").load(dir)
        .filter(col("id") >= 9000 && col("id") < 11000)
      assert(both.count() === 2000)

      // find the shard covering the high range and make it UNREADABLE —
      // a query refuted by its envelope must succeed anyway, which proves
      // the per-file stats of a skipped commit are never parsed
      val idx = ArrowFileStats.readIndex(fs, dirPath)
      val hi = idx.collectFirst {
        case (q, env) if env.cols("id").min.contains("10000") => q
      }.get
      val shardPath = new org.apache.hadoop.fs.Path(dir, ArrowFileStats.shardFile(hi))
      val out = fs.create(shardPath, true)
      out.write("NOT JSON".getBytes); out.close()

      val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") < 5000)
      assert(q.count() === 5000)
      // and the skipped commit's files are pruned from the scan itself
      val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(scanDesc(q)).get
      assert(m.group(2).toInt === 8 && m.group(1).toInt <= 4,
        s"high-range commit should be pruned wholesale: ${m.matched}")
    }
  }

  test("a shard without an index row loads fully: per-file pruning survives") {
    // the degradation shape of the index's last-writer-wins concurrency
    // (or a deleted index): commit-level skip is lost, per-file interval
    // pruning is NOT
    val dir = tmp("graft_shard_noindex")
    withShardThreshold(2) {
      spark.range(0, 10000).select(col("id"))
        .repartitionByRange(4, col("id"))
        .write.format("arrow-ipc").mode("overwrite").save(dir)
      val fs = fsOf(dir)
      fs.delete(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.IndexFile), false)
      // filter well inside the first range partition — repartitionByRange
      // boundaries jitter with sampling, so assert pruning happened (< 4)
      // rather than an exact file count
      val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") < 1000)
      assert(q.count() === 1000)
      val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(scanDesc(q)).get
      assert(m.group(1).toInt <= 2 && m.group(2).toInt === 4,
        s"per-file pruning should survive a lost index: ${m.matched}")
    }
  }

  test("aggregate pushdown and SPJ read the full sharded manifest") {
    val dir = tmp("graft_shard_agg")
    withShardThreshold(2) {
      spark.range(0, 500).select(col("id"), (col("id") % 5).as("k"))
        .repartition(4).write.format("arrow-ipc").mode("overwrite").save(dir)
      // corrupt the data files: a right answer = manifest-only
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).foreach { f =>
          val o = new java.io.FileOutputStream(f)
          o.write(Array.fill(8)(0x11.toByte)); o.close()
        }
      val agg = spark.read.format("arrow-ipc").load(dir)
        .agg(expr("count(*)").as("n"), sum(col("id")).as("s"),
          min(col("id")).as("mn"), max(col("id")).as("mx"))
      assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregation"))
      val r = agg.collect().head
      assert(r.getLong(0) === 500L && r.getLong(1) === (0L until 500L).sum)
      assert(r.getLong(2) === 0L && r.getLong(3) === 499L)
    }
  }

  test("global aggregate push answers from envelopes: a corrupt SHARD never blocks it") {
    // planning-cost contract at 10^6 files: a GLOBAL count/min/max/sum
    // reads base + index envelopes only — proven by corrupting the
    // per-file shard JSON (parsing it would throw) and still pushing
    val dir = tmp("graft_env_agg")
    withShardThreshold(2) {
      spark.range(0, 400).select(col("id"))
        .repartition(4).write.format("arrow-ipc").mode("overwrite").save(dir)
      spark.range(400, 500).select(col("id"))
        .repartition(2).write.format("arrow-ipc").mode("append").save(dir)
      val fs = fsOf(dir)
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val ids = ArrowFileStats.shardIds(fs, dirPath)
      assert(ids.size === 2)
      ids.foreach { q =>
        val o = fs.create(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.shardFile(q)), true)
        o.write("NOT JSON".getBytes); o.close()
      }
      val agg = spark.read.format("arrow-ipc").load(dir)
        .agg(expr("count(*)").as("n"), sum(col("id")).as("s"),
          min(col("id")).as("mn"), max(col("id")).as("mx"))
      assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        "envelopes alone must answer the global aggregate")
      val r = agg.collect().head
      assert(r.getLong(0) === 500L && r.getLong(1) === (0L until 500L).sum)
      assert(r.getLong(2) === 0L && r.getLong(3) === 499L)
    }
  }

  test("corrupt index refuses the push and the scan still answers exactly") {
    val dir = tmp("graft_env_badidx")
    withShardThreshold(2) {
      spark.range(0, 300).select(col("id"))
        .repartition(3).write.format("arrow-ipc").mode("overwrite").save(dir)
      val fs = fsOf(dir)
      val o = fs.create(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.IndexFile), true)
      o.write("NOT JSON".getBytes); o.close()
      // global agg: index unreadable → per-file fallback still pushes
      val agg = spark.read.format("arrow-ipc").load(dir).agg(sum(col("id")).as("s"))
      assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregation"))
      assert(agg.collect().head.getLong(0) === (0L until 300L).sum)
      // and with the SHARD also corrupt, planning must refuse (not throw)
      // and the data scan still answers
      val q = ArrowFileStats.shardIds(fs, new org.apache.hadoop.fs.Path(dir)).head
      val o2 = fs.create(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.shardFile(q)), true)
      o2.write("ALSO NOT JSON".getBytes); o2.close()
      val agg2 = spark.read.format("arrow-ipc").load(dir).agg(sum(col("id")).as("s"))
      assert(!agg2.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        "unanswerable metadata must refuse the push, not fail planning")
      assert(agg2.collect().head.getLong(0) === (0L until 300L).sum)
    }
  }

  test("NTZ timestamp filters prune files (norm handles LocalDateTime)") {
    val dir = tmp("graft_ntz_prune")
    val df = spark.range(0, 4000).select(col("id"),
      timestamp_seconds(col("id") * 3600).cast("timestamp_ntz").as("ts"))
    df.repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val cut = java.time.LocalDateTime.ofEpochSecond(500L * 3600, 0,
      java.time.ZoneOffset.UTC)
    val q = spark.read.format("arrow-ipc").load(dir).filter(col("ts") < lit(cut))
    assert(q.count() === 500)
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(scanDesc(q)).get
    assert(m.group(1).toInt < 4 && m.group(2).toInt === 4,
      s"an NTZ predicate must prune files: ${m.matched}")
  }

  test("deleteShards is selective: an uncaptured shard keeps its file and index row") {
    // the compaction-concurrency contract: consolidation deletes exactly
    // the snapshot it folded, so a commit landing mid-compaction keeps
    // both its shard and its envelope
    val dir = tmp("graft_shard_selective")
    withShardThreshold(2) {
      spark.range(0, 100).repartition(2)
        .write.format("arrow-ipc").mode("overwrite").save(dir)
      spark.range(100, 200).repartition(2)
        .write.format("arrow-ipc").mode("append").save(dir)
      val fs = fsOf(dir)
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val ids = ArrowFileStats.shardIds(fs, dirPath)
      assert(ids.size === 2)
      ArrowFileStats.deleteShards(fs, dirPath, Seq(ids.head))
      assert(ArrowFileStats.shardIds(fs, dirPath) === ids.tail)
      assert(ArrowFileStats.readIndex(fs, dirPath).keySet === ids.tail.toSet)
      // deleting the rest empties and removes the index file
      ArrowFileStats.deleteShards(fs, dirPath, ids.tail)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.IndexFile)))
    }
  }

  test("integral SUM pushdown refuses under ANSI mode; decimal stays pushable") {
    val dir = tmp("graft_shard_ansi")
    spark.range(0, 100)
      .select(col("id"), col("id").cast(org.apache.spark.sql.types
        .DecimalType(10, 2)).as("p"))
      .repartition(2).write.format("arrow-ipc").mode("overwrite").save(dir)
    val saved = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val longSum = spark.read.format("arrow-ipc").load(dir).agg(sum(col("id")))
      assert(!longSum.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        "wrapping long partials must not answer an ANSI-mode sum")
      assert(longSum.collect().head.getLong(0) === (0L until 100L).sum)
      val decSum = spark.read.format("arrow-ipc").load(dir).agg(sum(col("p")))
      assert(decSum.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        "exact decimal partials stay pushable under ANSI")
      assert(decSum.collect().head.getDecimal(0) ===
        new java.math.BigDecimal((0L until 100L).sum).setScale(2))
    } finally saved.fold(spark.conf.unset("spark.sql.ansi.enabled"))(
      spark.conf.set("spark.sql.ansi.enabled", _))
  }

  test("compaction consolidates shards into the base manifest and drops them") {
    val dir = tmp("graft_shard_compact")
    withShardThreshold(2) {
      spark.range(0, 300).select(col("id"))
        .repartition(3).write.format("arrow-ipc").mode("overwrite").save(dir)
      spark.range(300, 600).select(col("id"))
        .repartition(3).write.format("arrow-ipc").mode("append").save(dir)
      val fs = fsOf(dir)
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      assert(ArrowFileStats.shardIds(fs, dirPath).size === 2)

      graft.sources.ArrowMaintenance.compact(spark, dir, targetBytes = 1L << 20)
      assert(ArrowFileStats.shardIds(fs, dirPath).isEmpty)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ArrowFileStats.IndexFile)))
      // stats survive in the base and cover exactly the compacted files
      val base = ArrowFileStats.readBase(fs, dirPath)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getName).toSet
      assert(base.keySet === files)
      assert(base.values.map(_.rows).sum === 600L)
      // and the directory still answers exactly
      assert(spark.read.format("arrow-ipc").load(dir).count() === 600L)
    }
  }
}

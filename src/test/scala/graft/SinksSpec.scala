package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Write layouts and the plans they buy: bucketed co-located joins
  * (no shuffle), partitioned layout (partition pruning). */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sink").toString

  test("partitioned write prunes partitions on read") {
    val path = tmp()
    val df = (0 until 100).map(i => (i, s"p${i % 4}")).toDF("x", "part")
    Sinks.writePartitioned(df, path, Seq("part"))
    val read = spark.read.parquet(path).filter($"part" === "p1")
    assert(read.count() === 25)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("isnotnull(part") || plan.contains("part#")),
      s"expected partition filters in:\n$plan")
  }

  test("sharded write: bounded file sizes, deterministic order, manifest integrity") {
    val path = tmp()
    val df = (0 until 10000).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    Sinks.writeSharded(df, path, Seq("id"), shards = 8, maxRecordsPerFile = 1000)
    val man = Sinks.manifest(spark, path)
    val rows = man.collect()
    assert(rows.map(_.getAs[Long]("rows")).sum === 10000L)
    assert(rows.forall(_.getAs[Long]("rows") <= 1000L), "maxRecordsPerFile must cap files")
    assert(rows.length >= 10, s"expected >=10 capped files, got ${rows.length}")
    // content determinism: a second write carries the SAME total content
    // (shard cut points come from range sampling and may shift a few rows,
    // so per-file manifests aren't compared — the whole-dataset fold is)
    val path2 = tmp()
    Sinks.writeSharded(df, path2, Seq("id"), shards = 8, maxRecordsPerFile = 1000)
    def totalSig(p: String): (Long, BigDecimal) = {
      val m = Sinks.manifest(spark, p).collect()
      (m.map(_.getAs[Long]("rows")).sum,
        m.map(r => BigDecimal(r.getAs[java.math.BigDecimal]("content_sum"))).sum)
    }
    assert(totalSig(path) === totalSig(path2))
    // integrity: the whole-dataset sum equals the fold of per-file sums
    // (sum, not XOR — a duplicated row pair must NOT self-cancel)
    val whole = spark.read.parquet(path)
    val total = BigDecimal(whole
      .agg(sum(xxhash64(whole.columns.map(col): _*).cast("decimal(20,0)")))
      .head().getAs[java.math.BigDecimal](0))
    assert(rows.map(r => BigDecimal(r.getAs[java.math.BigDecimal]("content_sum"))).sum === total)
  }

  test("hash-sharded write: per-shard content is byte-stable across re-writes") {
    import graft.ops.Sampling
    val df = Sampling.epochShuffle(
      (0 until 10000).map(i => (i.toLong, s"doc$i")).toDF("id", "text"),
      $"id", epoch = 1)
    // per-shard signature, independent of physical file names (which carry
    // task UUIDs): shard dir → (rows, content_sum)
    def shardSig(p: String): Map[String, (Long, BigDecimal)] =
      Sinks.manifest(spark, p).collect().map { r =>
        val shard = "shard=\\d+".r.findFirstIn(r.getAs[String]("file")).get
        shard -> ((r.getAs[Long]("rows"),
          BigDecimal(r.getAs[java.math.BigDecimal]("content_sum"))))
      }.toMap
    val (p1, p2, p3) = (tmp(), tmp(), tmp())
    Sinks.writeShardedByHash(df, p1, "pos_hash", Seq("id"), shards = 8)
    Sinks.writeShardedByHash(df, p2, "pos_hash", Seq("id"), shards = 8)
    // also stable under a different INPUT partitioning — boundaries are a
    // function of content, not of scan layout or range sampling
    Sinks.writeShardedByHash(df.repartition(17), p3, "pos_hash", Seq("id"), shards = 8)
    val s1 = shardSig(p1)
    assert(s1.size === 8, s"every shard nonempty at 10k rows: ${s1.keys}")
    assert(s1 === shardSig(p2), "re-write must produce identical per-shard manifests")
    assert(s1 === shardSig(p3), "input partitioning must not move shard boundaries")
    assert(s1.values.map(_._1).sum === 10000L)
    // balance: fixed hash ranges on a uniform hash → no shard over 2× mean
    assert(s1.values.map(_._1).max <= 2500L, s"shard balance: ${s1.values.map(_._1)}")
    // rows within a shard file are sorted by the hash order (resumability)
    val one = spark.read.parquet(p1 + "/shard=0")
    val hashes = one.select("pos_hash").collect().map(_.getLong(0))
    assert(hashes.sameElements(hashes.sorted), "shard file must be hash-sorted")
  }

  test("z-ordered layout bounds per-file ranges on BOTH dimensions") {
    // 64×64 uniform grid; 16 z-range files should each cover ~a 16×16
    // block (256 consecutive z codes = one square of the Morton curve),
    // so BOTH per-file ranges stay ~16 of a global 63. A single-column
    // sort leaves the other column's per-file range at ~global.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    val zPath = tmp()
    Sinks.writeZOrdered(grid, zPath, "a", "b", bits = 6, partitions = 16)
    def avgRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"))
        .agg(avg($"ra"), avg($"rb")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (za, zb) = avgRanges(zPath)
    assert(za < 24 && zb < 24, s"z-order per-file ranges must bound both dims: ($za, $zb)")
    // control: plain range-sort by `a` clusters only `a`
    val aPath = tmp()
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(aPath)
    val (_, cb) = avgRanges(aPath)
    assert(cb > 48, s"single-dim control should leave b unclustered, got $cb")
  }

  test("zValueN reproduces zValue2 at N=2 and bounds all N dims at N=3") {
    // bit-for-bit N=2 equivalence on the full 6-bit grid
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    val both = grid.select(
      Sinks.zValue2($"a", $"b", 6).as("z2"),
      Sinks.zValueN(Seq($"a", $"b"), 6).as("zn"))
    assert(both.filter($"z2" =!= $"zn").count() === 0)
    // 3-D: 16 z-range files over a 16^3 grid each cover a small cube —
    // per-file ranges bounded on ALL THREE dims (a 1-D sort would leave
    // two of them ~global)
    val cube = (for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a, b, c)).toDF("a", "b", "c")
    val p = tmp()
    cube.withColumn("z", Sinks.zValueN(Seq($"a", $"b", $"c"), 4))
      .repartitionByRange(16, $"z").sortWithinPartitions($"z").drop("z")
      .write.mode("overwrite").parquet(p)
    val r = spark.read.parquet(p)
      .groupBy(input_file_name())
      .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"),
        (max($"c") - min($"c")).as("rc"))
      .agg(avg($"ra"), avg($"rb"), avg($"rc")).head()
    Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2)).foreach(rng =>
      assert(rng < 10, s"3-D z-order must bound every dim, got $r"))
    // guard rails: degenerate dims and overflow refuse loudly
    intercept[IllegalArgumentException](Sinks.zValueN(Seq($"a"), 4))
    intercept[IllegalArgumentException](Sinks.zValueN(Seq($"a", $"b", $"c"), 22))
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    val a = (0 until 1000).map(i => (i.toLong, i * 2)).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, i * 3)).toDF("k", "vb")
    Sinks.writeBucketed(a, "bkt_a", "k", 4, sortCol = Some("k"))
    Sinks.writeBucketed(b, "bkt_b", "k", 4, sortCol = Some("k"))
    val joined = Sinks.readTable(spark, "bkt_a")
      .join(Sinks.readTable(spark, "bkt_b"), "k")
    assert(joined.count() === 1000)
    val plan = joined.queryExecution.executedPlan.toString
    // Co-located bucketed join: no ShuffleExchange on either side.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
  }

  test("clustered write produces range-disjoint sorted files") {
    val path = tmp()
    val df = (0 until 1000).map(i => (i * 7919 % 1000, i)).toDF("key", "v")
    Sinks.writeClustered(df, path, Seq("key"), partitions = 4)
    val back = spark.read.parquet(path)
    assert(back.count() === 1000)
    // row-group stats selectivity: a narrow range filter reads fine
    assert(back.filter($"key".between(10, 20)).count() ===
      (0 until 1000).map(i => i * 7919 % 1000).count(k => k >= 10 && k <= 20))
  }

  test("sketch manifest: corpus quantile/distinct answered from the manifest alone") {
    import graft.functions.{QuantileSketches => QS, ThetaSketches => TS}
    val path = tmp()
    val df = (1 to 900).map(i => (i.toLong, (i * 31) % 500 + 10))
      .toDF("doc_id", "n_chars")
      .withColumn("__h", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"doc_id"), lit(4294967296L)))
    Sinks.writeShardedWithManifest(df, path, "__h", Seq("doc_id"), shards = 4,
      kllCols = Seq("n_chars"), thetaCols = Seq("doc_id"))
    val man = Sinks.readShardManifest(spark, path)
    assert(man.count() === 4)
    assert(man.columns.toSet ===
      Set("shard", "rows", "content_sum", "kll_n_chars", "theta_doc_id"))
    // merged manifest answers == exact answers over raw data (exact regime)
    val got = man.agg(
      sum($"rows").as("n"),
      org.apache.spark.sql.functions.round(
        TS.thetaEstimate(TS.thetaUnion($"theta_doc_id"))).cast("long").as("nd"),
      QS.kllQuantile(QS.kllMerge($"kll_n_chars", 8192), lit(0.9)).as("p90")).head()
    assert(got.getLong(0) === 900L)
    assert(got.getLong(1) === 900L)
    val exactP90 = {
      val vals = (1 to 900).map(i => (i * 31) % 500 + 10).sorted
      vals.find(v => vals.count(_ <= v).toDouble / vals.size >= 0.9).get.toDouble
    }
    assert(got.getDouble(2) === exactP90)
    // manifest is invisible to a plain read of the data path
    assert(spark.read.parquet(path).columns.toSet ===
      Set("doc_id", "n_chars", "__h", "shard"))
  }

  test("N:1 and N:N parquet sinks round-trip") {
    val p1 = tmp(); val p2 = tmp()
    val df = (0 until 64).toDF("x").repartition(8)
    Sinks.writeParquet(df, p1, single = true)
    Sinks.writeParquet(df, p2, single = false)
    assert(spark.read.parquet(p1).count() === 64)
    assert(spark.read.parquet(p2).count() === 64)
    // N:1 wrote exactly one data file
    val files1 = new java.io.File(p1).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files1 === 1)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowLayout, ArrowMaintenance, Sinks}

/** Storage-partitioned joins over the Arrow DSv2 source: two directories
  * written key-grouped (`Sinks.writeKeyGrouped`) join with ZERO shuffle
  * and ZERO sort — the scan proves single-valued files from the stats
  * manifest and reports `KeyGroupedPartitioning` + a trivial key ordering.
  * Every degradation path (foreign append, compaction, missing stats)
  * falls back to a plain shuffled read with identical results. */
class ArrowSpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `body` with SPJ preconditions pinned (v2 bucketing on, broadcast
    * joins off so co-location is load-bearing, AQE off for deterministic
    * plan asserts) and every conf restored after. */
  private def withSpjConfs[T](body: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "-1")
    spark.conf.set(keys(2), "false")
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def shufflesAndSorts(df: DataFrame): (Int, Int) = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (plan.collect { case e: ShuffleExchangeExec => e }.size,
      plan.collect { case s: SortExec => s }.size)
  }

  private def left = spark.range(0, 2000)
    .select((col("id") % 23).as("k"), col("id").as("lv"))
  private def right = spark.range(0, 900)
    .select((col("id") % 23).as("k"), (col("id") * 10).as("rv"))

  test("keyed-dir join runs with zero shuffle and zero sort; result exact") {
    val (dl, dr) = (tmp("graft_spj_l"), tmp("graft_spj_r"))
    Sinks.writeKeyGrouped(left, dl, Seq("k"), partitions = 4)
    Sinks.writeKeyGrouped(right, dr, Seq("k"), partitions = 4)
    assert(ArrowLayout.read(fsOf(dl), new org.apache.hadoop.fs.Path(dl)) === Seq("k"))

    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, sorts) = shufflesAndSorts(j)
      // the join itself is exchange-free AND sort-free; the groupBy runs
      // on the same key grouping, so the whole plan needs no exchange
      assert(shuffles === 0, s"expected a storage-partitioned join, got $shuffles shuffles:\n${j.queryExecution.executedPlan}")
      assert(sorts === 0, s"reported key ordering should kill SMJ sorts, got $sorts:\n${j.queryExecution.executedPlan}")

      val want = left.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }

  test("DECIMAL keys group a layout and join shuffle-free (round-8 stats kinds)") {
    // a decimal price-band column as the layout key: stats canonicalize as
    // plain decimal strings, single-valuedness is proved numerically, and
    // the partition values materialize as Decimal internals
    import org.apache.spark.sql.types.DecimalType
    val dLeft = spark.range(0, 2000).select(
      (col("id") % 13).cast(DecimalType(8, 2)).as("band"), col("id").as("lv"))
    val dRight = spark.range(0, 700).select(
      (col("id") % 13).cast(DecimalType(8, 2)).as("band"), (col("id") * 7).as("rv"))
    val (dl, dr) = (tmp("graft_spj_dec_l"), tmp("graft_spj_dec_r"))
    Sinks.writeKeyGrouped(dLeft, dl, Seq("band"), partitions = 4)
    Sinks.writeKeyGrouped(dRight, dr, Seq("band"), partitions = 4)

    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "band")
        .groupBy("band").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, sorts) = shufflesAndSorts(j)
      assert(shuffles === 0,
        s"decimal-keyed SPJ should be exchange-free, got $shuffles:\n${j.queryExecution.executedPlan}")
      assert(sorts === 0)
      val want = dLeft.join(dRight, "band")
        .groupBy("band").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
        .orderBy("band").collect().map(_.toString).toSeq
      assert(j.orderBy("band").collect().map(_.toString).toSeq === want)
    }
  }

  test("mismatched key sets co-locate via pushed partition values; result exact") {
    // left holds keys 0..22, right only 0..10 — Spark fills the missing
    // groups with empty partitions (pushPartValues) instead of shuffling
    val (dl, dr) = (tmp("graft_spj_mm_l"), tmp("graft_spj_mm_r"))
    Sinks.writeKeyGrouped(left, dl, Seq("k"), partitions = 4)
    Sinks.writeKeyGrouped(
      spark.range(0, 400).select((col("id") % 11).as("k"), (col("id") * 10).as("rv")),
      dr, Seq("k"), partitions = 4)

    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val (shuffles, _) = shufflesAndSorts(j)
      assert(shuffles === 0,
        s"mismatched key sets should still co-locate:\n${j.queryExecution.executedPlan}")
      val want = left
        .join(spark.range(0, 400).select((col("id") % 11).as("k"), (col("id") * 10).as("rv")), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }

  test("a plain (unkeyed) append degrades to a shuffled read with identical results") {
    val (dl, dr) = (tmp("graft_spj_app_l"), tmp("graft_spj_app_r"))
    Sinks.writeKeyGrouped(left, dl, Seq("k"), partitions = 4)
    Sinks.writeKeyGrouped(right, dr, Seq("k"), partitions = 4)
    // a FOREIGN writer drops one multi-key file in (no stats entry, no
    // clustering — a DSv2 append would now cluster into the standing
    // layout): the layout claim stays but per-file verification fails →
    // fall back, never wrong co-location
    val foreign = tmp("graft_spj_app_foreign")
    spark.range(5000, 5004).select((col("id") % 23).as("k"), col("id").as("lv"))
      .coalesce(1).write.format("arrow-ipc").mode("overwrite").save(foreign)
    val conf = spark.sparkContext.hadoopConfiguration
    val ffs = new org.apache.hadoop.fs.Path(foreign).getFileSystem(conf)
    val src = ffs.globStatus(new org.apache.hadoop.fs.Path(foreign, "part-*.arrows")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(ffs, src,
      ffs, new org.apache.hadoop.fs.Path(dl, "part-foreign.arrows"), false, conf)

    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val (shuffles, _) = shufflesAndSorts(j)
      assert(shuffles > 0, "multi-key file cannot keep the grouping claim")

      val lAll = left.unionAll(spark.range(5000, 5004)
        .select((col("id") % 23).as("k"), col("id").as("lv")))
      val want = lAll.join(right, "k").groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }

  test("compaction destroys grouping by construction and drops the claim") {
    val dl = tmp("graft_spj_compact")
    Sinks.writeKeyGrouped(left, dl, Seq("k"), partitions = 4)
    assert(ArrowMaintenance.compact(spark, dl).isDefined)
    assert(ArrowLayout.read(fsOf(dl), new org.apache.hadoop.fs.Path(dl)) === Nil)
    withSpjConfs {
      // no claim → plain read; rows survive the rewrite exactly
      assert(spark.read.format("arrow-ipc").load(dl).count() === 2000)
    }
  }

  test("read option partitionKeys activates grouping on an undeclared directory") {
    val dl = tmp("graft_spj_opt")
    Sinks.writeKeyGrouped(left, dl, Seq("k"), partitions = 4)
    ArrowLayout.delete(fsOf(dl), new org.apache.hadoop.fs.Path(dl))

    withSpjConfs {
      val want = left.groupBy("k").agg(sum("lv").as("s"))
        .collect().map(_.toString).sorted.toSeq

      // with aggregate pushdown live (default), the keyed groupBy+sum is
      // answered from the MANIFEST (round 8's sum stats): better than the
      // grouping path — zero data files read, one exchange of per-file
      // partial rows
      val l = spark.read.format("arrow-ipc").option("partitionKeys", "k").load(dl)
      val pushed = l.groupBy("k").agg(sum("lv").as("s"))
      assert(pushed.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        s"keyed sum should answer from the manifest:\n${pushed.queryExecution.executedPlan}")
      assert(pushed.collect().map(_.toString).sorted.toSeq === want)

      // with pushdown off (the documented escape hatch), the scan reports
      // the key grouping and the aggregation is exchange-free over data
      spark.conf.set("spark.graft.arrow.aggPushdown", "false")
      try {
        val raw = spark.read.format("arrow-ipc").option("partitionKeys", "k").load(dl)
          .groupBy("k").agg(sum("lv").as("s"))
        val (shuffles, _) = shufflesAndSorts(raw)
        assert(shuffles === 0,
          s"groupBy on the partition key should reuse the grouping:\n${raw.queryExecution.executedPlan}")
        assert(raw.collect().map(_.toString).sorted.toSeq === want)
      } finally spark.conf.unset("spark.graft.arrow.aggPushdown")
    }
  }

  test("multi-file key groups (skew shape) join shuffle-free, partially-clustered too") {
    val (dl, dr) = (tmp("graft_spj_skew_l"), tmp("graft_spj_skew_r"))
    // three keyed APPEND jobs: every key ends up with three single-valued
    // files — the file-per-partition shape partial clustering can split
    (0 until 3).foreach { i =>
      spark.range(i * 1000, (i + 1) * 1000)
        .select((col("id") % 5).as("k"), col("id").as("lv"))
        .repartition(2, col("k")).sortWithinPartitions("k")
        .write.format("arrow-ipc").option("partitionKeys", "k")
        .mode(if (i == 0) "overwrite" else "append").save(dl)
    }
    assert(ArrowLayout.read(fsOf(dl), new org.apache.hadoop.fs.Path(dl)) === Seq("k"))
    Sinks.writeKeyGrouped(
      spark.range(0, 50).select((col("id") % 5).as("k"), (col("id") * 10).as("rv")),
      dr, Seq("k"), partitions = 2)

    val want = spark.range(0, 3000)
      .select((col("id") % 5).as("k"), col("id").as("lv"))
      .join(spark.range(0, 50).select((col("id") % 5).as("k"), (col("id") * 10).as("rv")), "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      .orderBy("k").collect().map(_.toString).toSeq

    withSpjConfs {
      def joined = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, _) = shufflesAndSorts(joined)
      assert(shuffles === 0,
        s"multi-file groups must still co-locate:\n${joined.queryExecution.executedPlan}")
      assert(joined.orderBy("k").collect().map(_.toString).toSeq === want)

      // partially-clustered distribution (skew mode): a hot key's files
      // stay split instead of funneling through one task, at the price of
      // duplicate keys across output partitions — so the probe is the bare
      // JOIN (still exchange-free, identical pairs); an aggregate on top
      // would now legitimately re-shuffle
      val pc = "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
      val saved = spark.conf.getOption(pc)
      try {
        spark.conf.set(pc, "true")
        val j2 = spark.read.format("arrow-ipc").load(dl)
          .join(spark.read.format("arrow-ipc").load(dr), "k")
          .select($"k", $"lv" + $"rv")
        val (shuffles2, _) = shufflesAndSorts(j2)
        assert(shuffles2 === 0,
          s"partially-clustered join must stay exchange-free:\n${j2.queryExecution.executedPlan}")
        val wantPairs = spark.range(0, 3000)
          .select((col("id") % 5).as("k"), col("id").as("lv"))
          .join(spark.range(0, 50).select((col("id") % 5).as("k"), (col("id") * 10).as("rv")), "k")
          .select($"k", $"lv" + $"rv")
          .collect().map(_.toString).sorted.toSeq
        assert(j2.collect().map(_.toString).sorted.toSeq === wantPairs)
      } finally saved.fold(spark.conf.unset(pc))(spark.conf.set(pc, _))
    }
  }

  test("null keys form their own group; joins and grouping stay exact") {
    val dl = tmp("graft_spj_null")
    val withNulls = spark.range(0, 100)
      .select(when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7).as("k"),
        col("id").as("lv"))
    Sinks.writeKeyGrouped(withNulls, dl, Seq("k"), partitions = 2)

    val want = withNulls.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("k")).collect().map(_.toString).toSeq

    withSpjConfs {
      // default regime: the aggregation pushes to the manifest — zero data
      // files read, one exchange over per-file partial rows (metadata
      // volume); the NULL-keyed file must still form its own group
      val pushed = spark.read.format("arrow-ipc").load(dl)
        .groupBy("k").agg(count(lit(1)).as("n"))
      pushed.collect()
      assert(pushed.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        s"expected manifest-only push:\n${pushed.queryExecution.executedPlan}")
      assert(pushed.orderBy(asc_nulls_first("k")).collect().map(_.toString).toSeq === want)

      // pushdown disabled: the raw keyed scan reports its grouping, so the
      // SPJ machinery grades the groupBy exchange-free even with a NULL key
      val saved = spark.conf.getOption("spark.graft.arrow.aggPushdown")
      try {
        spark.conf.set("spark.graft.arrow.aggPushdown", "false")
        val agg = spark.read.format("arrow-ipc").load(dl)
          .groupBy("k").agg(count(lit(1)).as("n"))
        val (shuffles, _) = shufflesAndSorts(agg)
        assert(shuffles === 0,
          s"null group must not break the claim:\n${agg.queryExecution.executedPlan}")
        assert(agg.orderBy(asc_nulls_first("k")).collect().map(_.toString).toSeq === want)
      } finally saved.fold(spark.conf.unset("spark.graft.arrow.aggPushdown"))(
        spark.conf.set("spark.graft.arrow.aggPushdown", _))
    }
  }

  test("a WIDENED layout key still proves the zero-shuffle claim across generations") {
    // generation 1 keyed on an INT column; ALTER widens it to BIGINT;
    // generation 2 appends long keys. The single-value canonicals are
    // identical across generations (integral stats store longs), so the
    // SPJ proof must survive the widening — both the mixed-generation
    // left side and the natively-long right side co-locate.
    val dl = tmp("graft_spj_widen_l")
    val dr = tmp("graft_spj_widen_r")
    val gen1 = (0 until 100).map(i => (i % 4, i.toLong)).toDF("k", "lv")
      .select(col("k").cast("int").as("k"), col("lv"))
    Sinks.writeKeyGrouped(gen1, dl, Seq("k"), partitions = 4)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    spark.sql(s"ALTER TABLE graft.`$dl` ALTER COLUMN k TYPE BIGINT")
    val gen2 = (100 until 140).map(i => ((i % 4) + 4L, i.toLong)).toDF("k", "lv")
    gen2.repartition(2, col("k")).sortWithinPartitions("k")
      .write.format("arrow-ipc").mode("append")
      .option("partitionKeys", "k").save(dl)
    val right = (0 until 80).map(i => (i.toLong % 8, i * 10L)).toDF("k", "rv")
    Sinks.writeKeyGrouped(right, dr, Seq("k"), partitions = 4)
    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, sorts) = shufflesAndSorts(j)
      assert(shuffles === 0,
        s"widened key must keep the SPJ claim:\n${j.queryExecution.executedPlan}")
      assert(sorts === 0)
      val lFull = gen1.select(col("k").cast("long").as("k"), col("lv"))
        .unionAll(gen2)
      val want = lFull.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }
}

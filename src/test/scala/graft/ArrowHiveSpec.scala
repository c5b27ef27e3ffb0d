package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowHiveLayout

/** Hive-style `key=value/` partitioned layout for the arrow-ipc source:
  * write routes rows into value directories (partition columns live in the
  * path, not the files), discovery prunes whole directories against static
  * filters before listing their files, and the scan reconstructs the
  * partition columns as constants. */
class ArrowHiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/out"

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString("\n")

  test("round-trip: values land in key=value dirs, files omit the key columns") {
    val df = (0 until 60).map(i => (i, s"g${i % 3}", i % 2 == 0, s"payload$i"))
      .toDF("id", "grp", "flag", "body")
    val dir = tmp("graft_hive_rt")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp,flag").mode("overwrite").save(dir)

    // directory shape: grp=g0/flag=true/... two nested levels
    val root = new java.io.File(dir)
    val level1 = root.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(!_.startsWith("_")).sorted // _snapshots etc. are metadata
    assert(level1.toSeq === Seq("grp=g0", "grp=g1", "grp=g2"))
    val level2 = new java.io.File(root, "grp=g0").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(level2.toSeq === Seq("flag=false", "flag=true"))

    // data files carry ONLY the non-key columns
    val aFile = Files.walk(root.toPath).filter(_.toString.endsWith(".arrows"))
      .filter(!_.getFileName.toString.startsWith("_")).findFirst().get()
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      Files.newInputStream(aFile), alloc)
    val names = rd.getVectorSchemaRoot.getSchema.getFields
    assert(names.size() === 2)
    assert(names.get(0).getName === "id" && names.get(1).getName === "body")
    rd.close(); alloc.close()

    // read back: full schema (sentinel order), identical content
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "grp", "flag", "body"))
    assert(back.orderBy("id").collect().map(_.toString).toSeq ===
      df.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("static filter on a partition key prunes whole directories before listing") {
    val df = (0 until 40).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val dir = tmp("graft_hive_prune")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("overwrite").save(dir)

    // corrupt every file outside grp=g1: a read that opens one would throw
    Files.walk(new java.io.File(dir).toPath)
      .filter(_.toString.endsWith(".arrows"))
      .filter(!_.getFileName.toString.startsWith("_"))
      .filter(!_.toString.contains("grp=g1"))
      .forEach(p => Files.write(p, Array[Byte](1, 2, 3)))

    val q = spark.read.format("arrow-ipc").load(dir).filter($"grp" === "g1")
    val desc = scanDesc(q)
    assert(desc.contains("hive=[grp]"), s"scan must report the layout: $desc")
    val m = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
    assert(m.group(1).toInt === 1 && m.group(2).toInt === 4,
      s"expected 1/4 directories kept: $desc")
    assert(q.select("id").as[Int].collect().sorted.toSeq ===
      (0 until 40).filter(_ % 4 == 1))
  }

  test("NULL partition values: default-partition dir, IsNull/IsNotNull prune exactly") {
    val df = Seq((1, Option("a")), (2, Option("a")), (3, Option.empty[String]))
      .toDF("id", "k")
    val dir = tmp("graft_hive_null")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "k").mode("overwrite").save(dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(!_.startsWith("_")).sorted // skip metadata dirs
    assert(dirs.toSeq === Seq(ArrowHiveLayout.NullDir).map("k=" + _) ++ Seq("k=a"))

    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.filter($"k".isNull).select("id").as[Int].collect().toSeq === Seq(3))
    assert(back.filter($"k".isNotNull).select("id").as[Int].collect().sorted.toSeq
      === Seq(1, 2))
    // equality never matches the null dir, and prunes it at the dir level
    val eq = back.filter($"k" === "a")
    assert(eq.count() === 2)
    val m = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(scanDesc(eq)).get
    assert(m.group(1).toInt === 1 && m.group(2).toInt === 2)
  }

  test("path-hostile string values and date keys round-trip") {
    val days = Seq("2024-01-31", "2025-12-01").map(java.sql.Date.valueOf)
    val df = Seq(
      ("a/b=c", days(0), 1), ("a/b=c", days(0), 2),
      ("100% #tricky:*?", days(1), 3), ("plain", days(1), 4))
      .toDF("s", "d", "id")
    val dir = tmp("graft_hive_esc")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "s,d").mode("overwrite").save(dir)
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.orderBy("id").collect().map(_.toString).toSeq ===
      df.orderBy("id").collect().map(_.toString).toSeq)
    // a date-key filter prunes at the directory level
    val q = back.filter($"d" === lit(days(0)))
    assert(q.select("id").as[Int].collect().sorted.toSeq === Seq(1, 2))
    val desc = scanDesc(q)
    val m = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
    assert(m.group(1).toInt < m.group(2).toInt, s"date dir not pruned: $desc")
  }

  test("projection without the key column, and key-only projection, both read") {
    val df = (0 until 12).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    val dir = tmp("graft_hive_proj")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("overwrite").save(dir)
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.select("id").as[Int].collect().sorted.toSeq === (0 until 12))
    assert(back.select("grp").distinct().as[String].collect().sorted.toSeq ===
      Seq("g0", "g1"))
    // aggregate over the partition column only — group counts must be exact
    assert(back.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("g0" -> 6L, "g1" -> 6L))
  }

  test("append with matching keys merges; mismatched layout appends refuse") {
    val dir = tmp("graft_hive_append")
    val mk = (lo: Int, hi: Int) =>
      (lo until hi).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    mk(0, 10).write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("overwrite").save(dir)
    mk(10, 20).write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("append").save(dir)
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.select("id").as[Int].collect().sorted.toSeq === (0 until 20))

    // an OPTION-LESS append defaults to the standing layout (the SQL
    // `INSERT INTO` shape) — rows route into value directories
    mk(20, 30).write.format("arrow-ipc").mode("append").save(dir)
    val grown = spark.read.format("arrow-ipc").load(dir)
    assert(grown.select("id").as[Int].collect().sorted.toSeq === (0 until 30))
    assert(grown.filter(col("grp") === "g0").count() === 15)
    // … but an append declaring a DIFFERENT layout still refuses
    val otherKey = intercept[Exception] {
      mk(30, 40).write.format("arrow-ipc")
        .option("hivePartitionKeys", "id").mode("append").save(dir)
    }
    assert(otherKey.getMessage.contains("standing layout"))
    val explicitFlat = intercept[Exception] {
      mk(30, 40).write.format("arrow-ipc")
        .option("hivePartitionKeys", "").mode("append").save(dir)
    }
    assert(explicitFlat.getMessage.contains("standing layout"))
  }

  test("unsupported key types and all-key schemas refuse loudly") {
    val df = Seq((1.5, "x", 1)).toDF("f", "s", "id")
    val dir = tmp("graft_hive_badkey")
    val bad = intercept[Exception] {
      df.write.format("arrow-ipc")
        .option("hivePartitionKeys", "f").mode("overwrite").save(dir)
    }
    assert(bad.getMessage.contains("round-trip"))
    val allKeys = intercept[Exception] {
      Seq(("a", "b")).toDF("x", "y").write.format("arrow-ipc")
        .option("hivePartitionKeys", "x,y").mode("overwrite").save(dir)
    }
    assert(allKeys.getMessage.contains("non-key column"))
    val both = intercept[Exception] {
      df.write.format("arrow-ipc").option("hivePartitionKeys", "s")
        .option("partitionKeys", "id").mode("overwrite").save(dir)
    }
    assert(both.getMessage.contains("mutually exclusive"))
  }

  test("runtime (DPP) filters prune partition files via the merged manifest") {
    val facts = (0 until 100).map(i => (i, s"g${i % 5}", i * 10)).toDF("id", "grp", "v")
    val dir = tmp("graft_hive_dpp")
    facts.write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("overwrite").save(dir)
    // corrupt everything outside grp=g2: the broadcast-join key set must
    // keep the scan away from every other directory's files
    Files.walk(new java.io.File(dir).toPath)
      .filter(_.toString.endsWith(".arrows"))
      .filter(!_.getFileName.toString.startsWith("_"))
      .filter(!_.toString.contains("grp=g2"))
      .forEach(p => Files.write(p, Array[Byte](9, 9, 9)))
    // the filter on the dim side is what makes the build side SELECTIVE —
    // Spark's partition-pruning rule only inserts a runtime filter when
    // the broadcast side carries a selective predicate (a LocalRelation
    // would constant-fold the filter away, so the dim rides spark.range)
    val dim = spark.range(0, 5)
      .select(concat(lit("g"), col("id")).as("dk"))
      .filter($"dk" === "g2")
    val joined = spark.read.format("arrow-ipc").load(dir)
      .join(broadcast(dim), $"grp" === $"dk")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val r = joined.head()
    assert(r.getLong(0) === 20L)
    assert(r.getLong(1) === (0 until 100).filter(_ % 5 == 2).map(_ * 10).sum)
  }

  test("aggregates over a hive dir answer from the manifest + directory values") {
    val df = (0 until 30).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val dir = tmp("graft_hive_agg")
    df.write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp").mode("overwrite").save(dir)
    // corrupt EVERY data file: a pushed aggregate that answers correctly
    // PROVES no file was opened (the ArrowDsv2Spec no-read trick)
    Files.walk(new java.io.File(dir).toPath)
      .filter(_.toString.endsWith(".arrows"))
      .filter(!_.getFileName.toString.startsWith("_"))
      .forEach(p => Files.write(p, Array[Byte](0, 0, 0)))
    // global: count(*) + min/max over data AND hive columns
    val g = spark.read.format("arrow-ipc").load(dir)
      .agg(count(lit(1)), min($"id"), max($"id"), min($"grp"), max($"grp"))
    assert(scanDesc(g).contains("PushedAggregation"), scanDesc(g))
    val gr = g.head()
    assert((gr.getLong(0), gr.getInt(1), gr.getInt(2), gr.getString(3),
      gr.getString(4)) === ((30L, 0, 29, "g0", "g2")))
    // GROUP BY the hive key: one partial row per file, merged by Spark
    val k = spark.read.format("arrow-ipc").load(dir)
      .groupBy($"grp").agg(count(lit(1)).as("n"), max($"id").as("mx"))
    assert(scanDesc(k).contains("PushedAggregation"), scanDesc(k))
    assert(k.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      === Set(("g0", 10L, 27), ("g1", 10L, 28), ("g2", 10L, 29)))
  }

  test("hive directories stream (AvailableNow) and compact — the old refusals are gone") {
    val dir = tmp("graft_hive_stream_compact")
    // two appends → two files per value dir (so compaction has work)
    (0 until 2).foreach { g =>
      (0 until 5).map(i => (g * 5 + i, s"g${i % 2}")).toDF("id", "grp")
        .write.format("arrow-ipc")
        .option("hivePartitionKeys", "grp")
        .mode(if (g == 0) "overwrite" else "append").save(dir)
    }
    // AvailableNow over a hive layout drains exactly what exists and stops
    val q = spark.readStream.format("arrow-ipc")
      .load(dir).writeStream.format("memory").queryName("hive_now")
      .option("checkpointLocation", tmp("graft_hive_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(30000)
    assert(spark.table("hive_now").count() === 10)
    assert(spark.table("hive_now").groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("g0" -> 6L, "g1" -> 4L))
    // and compaction merges within value dirs (detail in ArrowMaintenanceSpec)
    assert(graft.sources.ArrowMaintenance.compact(spark, dir).isDefined)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 10)
  }

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

  private def shufflesAndSorts(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    (plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size,
      plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }.size)
  }

  test("two hive-partitioned datasets join on the partition key with zero shuffle") {
    // every file of a hive dir is single-valued on the key BY CONSTRUCTION
    // (the directory value, spliced into the stats view) — so the scan
    // reports KeyGroupedPartitioning without any partitionKeys option and
    // two datasets laid out the same way co-locate for free
    val dl = tmp("graft_hive_spj_l")
    val dr = tmp("graft_hive_spj_r")
    val left = (0 until 200).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "lv")
    val right = (0 until 140).map(i => (s"k${i % 7}", i * 10L)).toDF("k", "rv")
    left.write.format("arrow-ipc")
      .option("hivePartitionKeys", "k").mode("overwrite").save(dl)
    right.write.format("arrow-ipc")
      .option("hivePartitionKeys", "k").mode("overwrite").save(dr)
    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, sorts) = shufflesAndSorts(j)
      assert(shuffles === 0,
        s"expected a storage-partitioned join over hive dirs, got $shuffles shuffles:\n${j.queryExecution.executedPlan}")
      assert(sorts === 0, s"key ordering should kill SMJ sorts, got $sorts")
      val want = left.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }

  test("a hive dataset joins a flat key-grouped dataset with zero shuffle") {
    // the canonical key encoding is shared between directory values and
    // stats intervals, so the two layout flavors co-locate with each other
    val dl = tmp("graft_hive_spj_mix_l")
    val dr = tmp("graft_hive_spj_mix_r")
    val left = (0 until 200).map(i => (i % 5L, i.toLong)).toDF("k", "lv")
    val right = (0 until 100).map(i => (i % 5L, i * 10L)).toDF("k", "rv")
    left.write.format("arrow-ipc")
      .option("hivePartitionKeys", "k").mode("overwrite").save(dl)
    graft.sources.Sinks.writeKeyGrouped(right, dr, Seq("k"), partitions = 2)
    withSpjConfs {
      val j = spark.read.format("arrow-ipc").load(dl)
        .join(spark.read.format("arrow-ipc").load(dr), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
      val (shuffles, _) = shufflesAndSorts(j)
      assert(shuffles === 0,
        s"expected hive ↔ flat co-location, got $shuffles shuffles:\n${j.queryExecution.executedPlan}")
      val want = left.join(right, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum($"lv" + $"rv").as("s"))
        .orderBy("k").collect().map(_.toString).toSeq
      assert(j.orderBy("k").collect().map(_.toString).toSeq === want)
    }
  }

  test("maxRecordsPerFile rolls within a value directory; each file carries stats") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 2}", s"payload$i"))
      .toDF("id", "grp", "body")
    val dir = tmp("graft_hive_roll")
    // one task per key run (coalesce 1 + sort) so rolling, not task
    // parallelism, is what bounds the files
    df.coalesce(1).sortWithinPartitions("grp", "id")
      .write.format("arrow-ipc")
      .option("hivePartitionKeys", "grp")
      .option("maxRecordsPerFile", 40)
      .mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rels = graft.sources.ArrowSnapshots.listDataFiles(
      fs, new org.apache.hadoop.fs.Path(dir))
    // 150 rows per value dir / 40 per file = 4 files in each
    val byDir = rels.groupBy(r => r.split("/").head)
    assert(byDir.keySet === Set("grp=g0", "grp=g1"))
    byDir.values.foreach(fsn => assert(fsn.size === 4,
      s"expected 4 rolled files per value dir, got ${fsn.size}"))
    // every rolled file has its own manifest entry, and the sorted roll
    // gives disjoint id intervals → an id range prunes files WITHIN dirs
    val stats = graft.sources.ArrowFileStats.read(
      fs, new org.apache.hadoop.fs.Path(dir))
    assert(rels.map(r => r.split("/").last).forall(stats.contains))
    val q = spark.read.format("arrow-ipc").load(dir).filter(col("id") <= 50L)
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(scanDesc(q)).get
    assert(m.group(1).toInt < m.group(2).toInt, s"rolled files must prune (${m.matched})")
    // round-trip integrity
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 300)
    assert(back.select("id").distinct().count() === 300)
  }

  test("escape/unescape round-trips the reserved set") {
    val hostile = "a/b\\c:d*e?f\"g<h>i|j=k%l#m{n}o[p]q'rs"
    assert(ArrowHiveLayout.unescape(ArrowHiveLayout.escape(hostile)) === hostile)
    assert(!ArrowHiveLayout.escape(hostile).exists(c =>
      "/\\:*?\"<>|=#{}[]'".contains(c) || c < ' '))
  }
}

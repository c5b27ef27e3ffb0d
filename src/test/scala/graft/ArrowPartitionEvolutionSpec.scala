package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowHiveLayout, ArrowMaintenance}

/** Partition evolution (round 13): change the hive keys for FUTURE
  * writes metadata-only; existing files stay readable under their own
  * generation, each pruned by its own mechanism (flat files by real
  * manifest stats — the new keys are data columns there; hive files by
  * value-directory discovery). Iceberg's partition-spec-evolution
  * contract over this source's layout declaration. */
class ArrowPartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(from: Long, to: Long) =
    spark.range(from, to).select(col("id"), (col("id") % 4).as("p"),
      sha2(col("id").cast("string"), 256).as("payload"))

  private def rootFiles(dir: String): Set[String] =
    Option(fsOf(dir).globStatus(new Path(dir, "part-*.arrows")))
      .getOrElse(Array.empty).map(_.getPath.getName).toSet

  private def nestedFiles(dir: String): Set[String] =
    Option(fsOf(dir).globStatus(new Path(dir, "p=*/part-*.arrows")))
      .getOrElse(Array.empty).map(_.getPath.getName).toSet

  test("flat -> hive: metadata-only; new appends nest; mixed read exact; BOTH generations prune") {
    val dir = tmp("graft_pevo_fh")
    // flat generation, clustered on p so its per-file stats prune on p
    rows(0, 1000).repartitionByRange(4, col("p"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    val flatBefore = rootFiles(dir)
    assert(flatBefore.nonEmpty)

    ArrowMaintenance.evolvePartitioning(spark, dir, Seq("p"))
    // metadata-only: nothing moved
    assert(rootFiles(dir) === flatBefore && nestedFiles(dir).isEmpty)

    // new appends nest by the new keys (option-less append defaults to
    // the standing declaration)
    rows(1000, 1200).write.format("arrow-ipc").mode("append").save(dir)
    assert(rootFiles(dir) === flatBefore, "an append landed flat after evolve")
    assert(nestedFiles(dir).nonEmpty, "an append did not nest after evolve")

    val t = spark.read.format("arrow-ipc").load(dir)
    assert(t.count() === 1200L)
    val q = t.filter(col("p") === 2)
    assert(q.count() === 300L)
    // pruning on BOTH generations: the scan keeps 1 of 4 value dirs AND
    // drops flat files whose p-interval refutes (1 of 4 flat files)
    val desc = q.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"no file-prune report in scan:\n$desc")
    val (keptF, totalF) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(keptF < totalF,
      s"mixed-generation scan pruned nothing ($keptF/$totalF):\n$desc")
    val d = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(d.isDefined && d.get.group(1).toInt < d.get.group(2).toInt,
      s"hive generation did not dir-prune:\n$desc")
    // the flat generation pruned too: kept = 1 flat file + hive files
    // of 1 value dir
    assert(keptF <= totalF - 3,
      s"flat generation did not stats-prune ($keptF/$totalF)")
    // correctness with the partition column PROJECTED AWAY (flat files
    // carry it in data, hive files on the path)
    assert(t.select(sum(col("id"))).head().getLong(0)
      === (0L until 1200L).sum)
  }

  test("hive -> flat: new appends land at the root; mixed read exact") {
    val dir = tmp("graft_pevo_hf")
    rows(0, 800).write.format("arrow-ipc")
      .option("hivePartitionKeys", "p").mode("overwrite").save(dir)
    assert(rootFiles(dir).isEmpty)
    ArrowMaintenance.evolvePartitioning(spark, dir, Nil)
    rows(800, 1000).write.format("arrow-ipc").mode("append").save(dir)
    assert(rootFiles(dir).nonEmpty, "post-evolve append did not land flat")
    val t = spark.read.format("arrow-ipc").load(dir)
    assert(t.count() === 1000L)
    assert(t.filter(col("p") === 1).count() === 250L)
    assert(t.select(sum(col("id"))).head().getLong(0) === (0L until 1000L).sum)
  }

  test("hive -> different hive with standing value dirs refuses; CALL face works; aggregate pushdown degrades honestly") {
    val dir = tmp("graft_pevo_ref")
    rows(0, 400).withColumn("q", col("id") % 2)
      .write.format("arrow-ipc")
      .option("hivePartitionKeys", "p").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    val e = intercept[IllegalArgumentException] {
      ArrowMaintenance.evolvePartitioning(spark, dir, Seq("q"))
    }
    assert(e.getMessage.contains("unify"))
    // CALL face: hive -> flat
    spark.sql(s"CALL graft.system.evolve_partitioning('$dir', '')")
    assert(ArrowHiveLayout.read(fsOf(dir), new Path(dir)).isEmpty)
    rows(400, 500).withColumn("q", col("id") % 2)
      .write.format("arrow-ipc").mode("append").save(dir)
    // a manifest-only COUNT would miss a generation — the gate forces an
    // honest scan; the value must still be exact
    assert(spark.read.format("arrow-ipc").load(dir).count() === 500L)
  }

  test("whole-table cluster unifies the layout and collapses the generation history") {
    val dir = tmp("graft_pevo_unify")
    rows(0, 600).repartitionByRange(3, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    ArrowMaintenance.evolvePartitioning(spark, dir, Seq("p"))
    rows(600, 800).write.format("arrow-ipc").mode("append").save(dir)
    assert(ArrowHiveLayout.readGenerations(fsOf(dir), new Path(dir)).size === 2)

    assert(ArrowMaintenance.cluster(spark, dir, Seq("id")).isDefined)
    // every row nests now; the flat generation is gone, history collapsed
    assert(rootFiles(dir).isEmpty, "cluster left flat-generation files")
    assert(ArrowHiveLayout.readGenerations(fsOf(dir), new Path(dir))
      === Seq(Seq("p")))
    val t = spark.read.format("arrow-ipc").load(dir)
    assert(t.count() === 800L)
    assert(t.select(sum(col("id"))).head().getLong(0) === (0L until 800L).sum)
  }
}

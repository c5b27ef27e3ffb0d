package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: quantifies N-GENERATION partition-evolution reads at
  * the many-partitions shape (round 14 removed the one-standing-hive-
  * generation bound). Builds ONE table that evolved twice without ever
  * rewriting data —
  *   gen A: flat, range-clustered on `a` (64 files);
  *   gen B: hive on `a` (P value dirs), via evolvePartitioning + append;
  *   gen C: hive on `b` (P value dirs, b correlated with a), same way —
  * then times, for each filter shape, planning (discovery + pruning +
  * describe) and execution, and prints the scan's own admission counts:
  *
  *   1. filter on `a`: gen B prunes by DISCOVERY (1/P dirs listed in),
  *      gens A and C prune by per-file DATA stats (a is clustered in A;
  *      b≡a makes C's dirs a-constant) — admitted files must be O(1)
  *      out of ~2P+64 while only gen C pays an O(P) dir listing;
  *   2. filter on `b`: the mirror image (C discovers, A+B stats-prune);
  *   3. unfiltered count: all generations, manifest-only aggregate push.
  *
  * The single-generation hive table of the same row count is the
  * baseline — the delta is the true cost of carrying history as
  * metadata instead of rewriting 100 TB on every partition-key change.
  * Run: sbt "runMain graft.tools.EvolutionScaleProbe [dirsPerGen]"
  * (log: tools/evolution_scale_probe.log) */
object EvolutionScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")

    val partitions = args.headOption.map(_.toInt).getOrElse(300)
    val rowsPer = 2000
    val base = "/tmp/graft_scale/evolution_probe"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val dir = s"$base/t"

    def gen(lo: Long) = spark.range(lo, lo + partitions.toLong * rowsPer)
      .select(
        concat(lit("p"), format_string("%04d",
          (col("id") % partitions).cast("int"))).as("a"),
        concat(lit("q"), format_string("%04d",
          (col("id") % partitions).cast("int"))).as("b"),
        col("id").as("v"))

    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[evo-probe] $what%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    timed(s"gen A: flat write, range-clustered on a (64 files)") {
      gen(0).repartitionByRange(64, col("a"))
        .write.format("arrow-ipc").mode("overwrite").save(dir)
    }
    timed(s"evolve to hive(a) + gen B append ($partitions dirs)") {
      graft.sources.ArrowMaintenance.evolvePartitioning(spark, dir, Seq("a"))
      gen(1000000).write.format("arrow-ipc").mode("append").save(dir)
    }
    timed(s"evolve to hive(b) + gen C append ($partitions dirs)") {
      graft.sources.ArrowMaintenance.evolvePartitioning(spark, dir, Seq("b"))
      gen(2000000).write.format("arrow-ipc").mode("append").save(dir)
    }
    timed(s"baseline: single-generation hive(a), same total rows") {
      gen(0).unionAll(gen(1000000)).unionAll(gen(2000000))
        .write.format("arrow-ipc").option("hivePartitionKeys", "a")
        .mode("overwrite").save(s"$base/single")
    }

    def desc(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.mkString(" ")
    def admission(d: String): String =
      ("files=\\S+|dirs=\\S+|hive=\\[[^\\]]*\\]".r
        .findAllIn(d)).mkString(" ")

    // each key value appears once per generation: 3 * rowsPer rows
    for ((c, label) <- Seq(("a", "discovery(B) + stats(A,C)"),
        ("b", "discovery(C) + stats(A,B)"))) {
      val sel = spark.read.format("arrow-ipc").load(dir)
        .filter(col(c) === (if (c == "a") "p0007" else "q0007"))
      val d = timed(s"3-gen: filter $c plan — $label") { desc(sel) }
      println(s"[evo-probe]   scan: ${admission(d)}")
      timed(s"3-gen: filter $c execute") {
        assert(sel.agg(count(lit(1))).head().getLong(0) == 3L * rowsPer)
      }
    }
    timed("3-gen: unfiltered count (manifest-only push)") {
      assert(spark.read.format("arrow-ipc").load(dir)
        .agg(count(lit(1))).head().getLong(0) == 3L * partitions * rowsPer)
    }
    val selS = spark.read.format("arrow-ipc").load(s"$base/single")
      .filter(col("a") === "p0007")
    val dS = timed("baseline: filter a plan (single generation)") { desc(selS) }
    println(s"[evo-probe]   scan: ${admission(dS)}")
    timed("baseline: filter a execute") {
      assert(selS.agg(count(lit(1))).head().getLong(0) == 3L * rowsPer)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rebalance narrow-plan guard, self-tested shape by shape: the guard
  * whitelists logical node types by construction, so a Spark upgrade or a
  * new narrow node must fail HERE loudly instead of silently disabling (or
  * worse, mis-enabling) the pre-compute widening. `narrowPlan` gates a
  * `df.rdd` probe that would materialize upstream exchanges under AQE —
  * accepting an exchange-bearing plan is the expensive failure mode. */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val scan =
    Engine.table(spark, "/root/testdata/sf0.001", "nation")

  test("every whitelisted narrow shape is accepted") {
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "s") // LocalRelation
    val accepted = Seq(
      "parquet scan" -> scan,
      "project over scan" -> scan.select("n_nationkey", "n_name"),
      "filter over project" -> scan.select("n_nationkey", "n_name")
        .filter(col("n_nationkey") > 5),
      "range" -> spark.range(10).toDF(),
      "local relation" -> local,
      "union of narrow" -> scan.select("n_nationkey")
        .union(scan.select("n_regionkey")),
      "coalesce (non-shuffle repartition)" -> scan.coalesce(1))
    for ((name, df) <- accepted)
      assert(Engine.narrowPlan(df), s"'$name' must be narrow")
  }

  test("exchange-bearing and streaming plans are rejected") {
    val rejected = Seq(
      "groupBy agg" -> scan.groupBy("n_regionkey").count(),
      "orderBy (range exchange)" -> scan.orderBy("n_name"),
      "shuffle repartition" -> scan.repartition(8),
      "distinct" -> scan.select("n_regionkey").distinct(),
      "join" -> scan.join(scan.select(col("n_nationkey").as("k")),
        col("n_nationkey") === col("k")),
      "window" -> scan.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("n_regionkey").orderBy("n_nationkey"))))
    for ((name, df) <- rejected)
      assert(!Engine.narrowPlan(df), s"'$name' must NOT be narrow")
  }

  test("the accepted leaf-name whitelist is exactly the documented set") {
    // Enumerated on purpose: adding a leaf to narrowLeafNames without
    // thinking about its exchange-freeness should force an edit here.
    assert(Engine.narrowLeafNames ===
      Set("LogicalRelation", "DataSourceV2ScanRelation", "HiveTableRelation"))
  }

  test("rebalanceForCompute widens a narrow under-parallel scan, no-ops on shuffled plans") {
    val widened = Engine.rebalanceForCompute(scan)
    assert(widened.rdd.getNumPartitions >=
      math.min(spark.sparkContext.defaultParallelism, 4))
    val grouped = scan.groupBy("n_regionkey").count()
    assert(Engine.rebalanceForCompute(grouped) eq grouped,
      "exchange-bearing plan must be returned untouched (no .rdd probe)")
  }
}

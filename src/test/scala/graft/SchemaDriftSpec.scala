package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift gate: the `events.ts` column has shipped in three physical
  * encodings across testdata-generator versions — TIMESTAMP_MICROS
  * adjusted-to-UTC (Spark TimestampType), TIMESTAMP_MICROS naive (Spark
  * TIMESTAMP_NTZ), and TIMESTAMP_NANOS (readable only as epoch-nanos longs
  * under `nanosAsLong`). Round 7 lost 14 declared queries to the second
  * form arriving unannounced; this suite plans the ENTIRE declared query
  * surface against an events table in EACH encoding so the next drift of
  * this class fails a unit test instead of a round.
  *
  * "Plans" = forces analysis + physical planning (`executedPlan`), the
  * phase where round 7's breaks surfaced (`unix_micros` type mismatch,
  * Arrow schema mapping rejection). Queries whose CONSTRUCTION executes
  * jobs (the roundtrips write scratch files) execute them here too, which
  * only deepens the check.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val srcDir = "/root/testdata/sf0.001"

  /** Materialize a variant dir: every non-events table symlinked from the
    * source SF dir, events rewritten with `ts` in the requested encoding. */
  private def variantDir(name: String)(mkTs: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$name")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), Paths.get(srcDir, s"$t.parquet"))
    }
    // canonical events frame (already normalized to TimestampType µs)
    val canonical = Engine.table(spark, srcDir, "events")
    mkTs(canonical).coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def planAll(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.executedPlan; None }
      catch { case e: Throwable => Some(s"$name [$label]: ${e.toString.take(300)}") }
    }
    assert(failures.isEmpty,
      s"queries failed to plan under ts=$label:\n${failures.mkString("\n")}")
  }

  test("every declared query plans with ts as TIMESTAMP (instant µs)") {
    planAll(variantDir("tz")(df => df.withColumn("ts",
      col("ts").cast("timestamp"))), "TIMESTAMP")
  }

  test("every declared query plans with ts as TIMESTAMP_NTZ (naive µs)") {
    planAll(variantDir("ntz")(df => df.withColumn("ts",
      col("ts").cast("timestamp_ntz"))), "TIMESTAMP_NTZ")
  }

  test("every declared query plans with ts as epoch-nanos long") {
    // Spark cannot WRITE parquet TIMESTAMP_NANOS; what the legacy files
    // present to the engine after `nanosAsLong` is exactly a LongType
    // nanos column, so that post-read shape is what the variant encodes.
    planAll(variantDir("nanos")(df => df.withColumn("ts",
      expr("unix_micros(ts) * 1000L"))), "nanos-long")
  }

  test("Engine.normalizeTemporal canonicalizes all three encodings to µs instants") {
    val canonical = Engine.table(spark, srcDir, "events")
      .select("event_id", "ts").orderBy("event_id").limit(50)
    val base = canonical.collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      df => df.withColumn("ts", col("ts").cast("timestamp")),
      df => df.withColumn("ts", col("ts").cast("timestamp_ntz")),
      df => df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    ).zip(Seq("tz", "ntz", "nanos")).foreach { case (mk, label) =>
      val normalized = Engine.normalizeTemporal(mk(canonical))
      assert(normalized.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"[$label] wrong type")
      val got = normalized.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      assert(got.sameElements(base), s"[$label] values drifted")
    }
  }
}

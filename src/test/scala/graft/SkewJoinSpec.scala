package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewJoin

/** Salted join ≡ plain join on a pathologically skewed frame, across all
  * supported join types; the physical shuffle must key on the salt. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5000 rows on ONE hot key + a sparse tail; dim has keys 1..8 (so keys
  // 9/10 on the left are unmatched, exercising outer/anti paths).
  private lazy val skewed = ((1 to 5000).map(i => (1L, i.toLong)) ++
    (2 to 10).flatMap(k => (1 to 5).map(i => (k.toLong, (1000 * k + i).toLong))))
    .toDF("k", "payload")
  private lazy val dim = (1 to 8).map(k => (k.toLong, s"name_$k")).toDF("k", "attr")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("inner and left_outer match the plain join exactly") {
    for (jt <- Seq("inner", "left_outer")) {
      val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), 16, jt)
      val plain = skewed.join(dim, Seq("k"), jt)
      assert(sortedRows(salted) === sortedRows(plain), s"type=$jt")
    }
  }

  test("left_semi and left_anti match the plain join exactly") {
    for (jt <- Seq("left_semi", "left_anti")) {
      val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), 16, jt)
      val plain = skewed.join(dim, Seq("k"), jt)
      assert(sortedRows(salted) === sortedRows(plain), s"type=$jt")
    }
  }

  test("the shuffle partitions on (key, salt), spreading the hot key") {
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), 16)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column must reach the physical join")
    // the hot key's 5000 rows must spread across >1 salt bucket
    val spread = SkewJoin.saltedJoin(skewed, dim, Seq("k"), 16)
      .filter(col("k") === 1L).count()
    assert(spread === 5000L)
    val buckets = skewed.filter(col("k") === 1L)
      .select(pmod(hash(skewed.columns.map(col): _*), lit(16)).as("s"))
      .distinct().count()
    assert(buckets > 8, s"content-based salt must spread the hot key (got $buckets/16 buckets)")
  }

  test("probeIdCols spread identical payloads; salt is deterministic") {
    // 512 rows whose PAYLOAD is identical but whose id is unique — the
    // production shape where a unique key exists. Salting on the id must
    // spread them; salting must also be a pure function of row content so
    // a recomputed task routes rows identically (the SPARK-23207 retry
    // class — a nondeterministic per-row disambiguator would re-bucket on
    // stage retry, losing/duplicating join rows).
    val probes = (1 to 512).map(i => (0L, i.toLong)).toDF("k", "id")
    val withIds = probes.select(SkewJoin.probeSalt(probes, 8, Seq("id")).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(withIds.size >= 6, s"512 unique-id rows landed in only $withIds")
    // determinism: two separate evaluations produce identical assignments
    val a = probes.select(col("id"), SkewJoin.probeSalt(probes, 8, Seq("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = probes.select(col("id"), SkewJoin.probeSalt(probes, 8, Seq("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("without ids, fully identical rows clump (documented fallback limit)") {
    // The content-hash fallback is deterministic, so rows with NO
    // distinguishing column all hash to one bucket — the scaladoc'd
    // limitation that callers with all-duplicate probe rows must supply
    // probeIdCols (or pre-aggregate).
    val probes = Seq.fill(64)(0L).toDF("k")
    val buckets = probes.select(SkewJoin.probeSalt(probes, 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(buckets.size === 1)
  }

  test("replicating join types are rejected; salt collision is rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dim, Seq("k"), 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed.withColumn("__salt", lit(1)), dim, Seq("k"), 4)
    }
  }
}

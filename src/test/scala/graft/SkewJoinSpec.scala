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

  test("identical probe rows still spread across salt buckets") {
    // A probe frame projected to JUST the join key — every hot-key row
    // identical. A pure content hash would place them all in one bucket,
    // defeating the spread in exactly the regime the operator exists for;
    // the per-row id mix must keep routing uniform.
    val probes = Seq.fill(512)(0L).toDF("k")
    val buckets = probes.select(SkewJoin.probeSalt(probes, 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(buckets.size >= 6, s"512 identical rows landed in only $buckets")
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

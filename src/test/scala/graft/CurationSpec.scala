package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Packing, Sampling}

/** Dataset-curation operators: deterministic hash sampling / splits and
  * sequence packing (two-phase distributed prefix sum). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("id")

  test("hash sample hits the rate within binomial tolerance and is reproducible") {
    val n1 = Sampling.hashSample(ids, $"id", 0.1, "a").count()
    val n2 = Sampling.hashSample(ids.repartition(13), $"id", 0.1, "a").count()
    assert(n1 === n2, "sample must be independent of partitioning")
    assert(math.abs(n1 - 1000L) < 120, s"rate off: $n1/10000 at 0.1")  // ±4σ
    // different salt draws an independent sample, not a subset
    val a = Sampling.hashSample(ids, $"id", 0.1, "a").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, $"id", 0.1, "b").collect().map(_.getLong(0)).toSet
    assert(a !== b)
    val overlap = a.intersect(b).size.toDouble
    assert(overlap < 250, s"salted samples should be near-independent, overlap=$overlap")
  }

  test("capPerGroup: caps only oversized groups, deterministic across partitioning") {
    val df = ids.withColumn("g", when($"id" < 9940L, "big").otherwise("small"))
    val out = Sampling.capPerGroup(df, $"g", $"id", n = 100, salt = "c")
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("big" -> 100L, "small" -> 60L))
    val kept1 = out.collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.capPerGroup(df.repartition(17), $"g", $"id", n = 100, salt = "c")
      .collect().map(_.getLong(0)).toSet
    assert(kept1 === kept2, "kept set must be content-addressed, not scan-order")
    // the cap selects by hash order — consistent with hashSample's ordering:
    // the 100 kept ids of the big group are the 100 smallest by (hash, id)
    val hashes = Sampling.hashSample(df.filter($"g" === "big"), $"id", 1.0, "c")
      .select($"id", Sampling.sampleHash($"id", "c").as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(100).map(_._2).toSet
    assert(kept1.intersect(hashes) === hashes)
  }

  test("capPerGroupSalted ≡ capPerGroup on a pathologically hot group") {
    // 99.4% of rows in ONE group — the regime where the single-window form
    // sorts half the corpus in one partition. The two-stage form must
    // return the IDENTICAL kept set (not just the same counts), across
    // bucket counts and repartitionings.
    val df = ids.withColumn("g", when($"id" < 9940L, "hot").otherwise("tail"))
    val exact = Sampling.capPerGroup(df, $"g", $"id", n = 100, salt = "c")
      .collect().map(_.getLong(0)).toSet
    for (buckets <- Seq(1, 7, 64)) {
      val salted = Sampling.capPerGroupSalted(df.repartition(11), $"g", $"id",
        n = 100, saltBuckets = buckets, salt = "c")
        .collect().map(_.getLong(0)).toSet
      assert(salted === exact, s"saltBuckets=$buckets diverged")
    }
    // stage-1 really prunes: survivors per group ≤ n·buckets (hot group
    // shrinks from 9940 rows to ≤ 700 before the exact pass)
    val bucket = pmod(Sampling.sampleHash($"id", "c" + "bucket:"), lit(7))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy($"g", bucket)
      .orderBy(Sampling.sampleHash($"id", "c").asc, $"id".asc)
    val stage1 = df.withColumn("__rn1", row_number().over(w1))
      .filter($"__rn1" <= 100).groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stage1("hot") <= 700L, s"stage 1 must bound the hot group: $stage1")
  }

  test("nested rates: a 0.05 sample is a subset of the 0.1 sample (same salt)") {
    val small = Sampling.hashSample(ids, $"id", 0.05, "a").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(ids, $"id", 0.1, "a").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratified rates apply per stratum; split column is exhaustive and stable") {
    val df = ids.withColumn("g", when($"id" % 2 === 0, "even").otherwise("odd"))
    val out = Sampling.stratifiedHashSample(df, $"id", $"g",
      Map("even" -> 0.5), defaultRate = 0.05, salt = "x")
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byG("even") - 2500L) < 200, s"even stratum: ${byG("even")}")
    assert(math.abs(byG.getOrElse("odd", 0L) - 250L) < 80, s"odd stratum: ${byG.getOrElse("odd", 0L)}")
    val splits = ids.select(Sampling.splitColumn($"id", 0.2, "h").as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet === Set("train", "holdout"))
    assert(splits.values.sum === 10000L)
    assert(math.abs(splits("holdout") - 2000L) < 170)
  }

  test("weighted sample: acceptance tracks the weight column; clamped outside [0,1]") {
    // weight 0.5 for even ids, 0 for odd → only evens survive, about half
    val df = ids.withColumn("w", when($"id" % 2 === 0, 0.5).otherwise(0.0))
    val kept = Sampling.weightedSample(df, $"id", $"w", "t")
      .collect().map(_.getLong(0))
    assert(kept.forall(_ % 2 == 0))
    assert(math.abs(kept.length - 2500) < 200, s"got ${kept.length}/5000 at w=0.5")
    // weights beyond the unit interval clamp: w=7 keeps all, w=-3 keeps none
    val wild = ids.withColumn("w", when($"id" % 2 === 0, 7.0).otherwise(-3.0))
    val kept2 = Sampling.weightedSample(wild, $"id", $"w", "t").collect().map(_.getLong(0))
    assert(kept2.length === 5000 && kept2.forall(_ % 2 == 0))
  }

  test("epoch shuffle: total deterministic order, epochs independent") {
    val e1a = Sampling.epochShuffle(ids, $"id", 1).collect().map(_.getLong(0)).toSeq
    val e1b = Sampling.epochShuffle(ids.repartition(7), $"id", 1).collect().map(_.getLong(0)).toSeq
    assert(e1a === e1b, "same epoch must give the identical permutation")
    val e2 = Sampling.epochShuffle(ids, $"id", 2).collect().map(_.getLong(0)).toSeq
    assert(e1a !== e2, "different epochs must permute differently")
    assert(e1a.sorted === (0L until 10000L), "a permutation, nothing lost")
    assert(e1a !== (0L until 10000L).toSeq, "hash order is not key order")
  }

  test("weighted epoch mix: integer copies exact, fractional part near rate, weight 0 drops") {
    val df = ids.withColumn("g",
      when($"id" % 3 === 0, "a").otherwise(when($"id" % 3 === 1, "b").otherwise("c")))
    val out = graft.ops.Sampling.weightedEpochMix(df, $"id", $"g",
      Map("a" -> 2.0, "b" -> 0.4, "c" -> 0.0), defaultWeight = 1.0, salt = "t")
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val na = 3334L; val nb = 3333L
    assert(byG("a") === 2 * na, "integer weight 2.0 = exactly two copies")
    assert(math.abs(byG("b") - 0.4 * nb) < 120, s"fractional stratum: ${byG("b")}")
    assert(!byG.contains("c"), "weight 0 drops the stratum")
    // epochs of an integer-weight stratum are exact duplicates apart from the tag
    val epochs = out.filter($"g" === "a").groupBy("epoch").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(epochs === Map(0 -> na, 1 -> na))
  }

  test("packBins: exact global prefix sum, bins respect the budget boundary") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 5000L).map(i => (i, 1L + rnd.nextInt(500))).toDF("id", "tok")
    val packed = Packing.packBins(docs, "id", "tok", budget = 4096, partitions = 7)
      .orderBy("id").collect()
    // exact running sum in id order
    var cum = 0L
    val toks = docs.orderBy("id").collect().map(_.getLong(1))
    packed.zip(toks).foreach { case (r, t) =>
      cum += t
      assert(r.getAs[Long]("cum_tokens") === cum, s"row ${r.getLong(0)}")
      assert(r.getAs[Long]("bin") === (cum - t) / 4096)
    }
    // bins are contiguous 0..max and every bin except possibly the last is
    // "full enough": its LAST row crosses into the next budget window.
    val bins = packed.map(_.getAs[Long]("bin"))
    assert(bins.toSet === (0L to bins.max).toSet)
  }

  test("edge rates and budgets: rate 0/1 exact, budget beyond total = one bin") {
    assert(Sampling.hashSample(ids, $"id", 0.0, "z").count() === 0L)
    assert(Sampling.hashSample(ids, $"id", 1.0, "z").count() === 10000L)
    val docs = (0L until 50L).map(i => (i, 10L)).toDF("id", "tok")
    val packed = Packing.packBins(docs, "id", "tok", budget = 100000L)
      .select("bin").distinct().collect().map(_.getLong(0))
    assert(packed.toSeq === Seq(0L), "budget beyond total tokens = single bin")
    val one = Packing.packBins(docs, "id", "tok", budget = 10L)
      .orderBy("id").collect()
    assert(one.map(_.getAs[Long]("bin")).toSeq === (0L until 50L), "budget = row size → one row per bin")
  }

  test("packBins result is independent of the partition count") {
    val docs = (0L until 2000L).map(i => (i, 1L + (i % 97))).toDF("id", "tok")
    def run(n: Int) = Packing.packBins(docs, "id", "tok", budget = 1000, partitions = n)
      .select("id", "cum_tokens", "bin").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) === run(5))
    assert(run(5) === run(32))
  }
}

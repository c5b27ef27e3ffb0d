package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for dataset curation (beyond-reference
  * surface — a training-data pipeline samples, holds out, and down-weights
  * corpora constantly, and at 100 TB the sample decision must be a pure
  * function of the ROW, not of an RNG stream).
  *
  * Construction: a row is kept iff the 32-bit md5-based hash of
  * (salt ++ key) falls below rate·2³², i.e. `df.sample`'s Bernoulli
  * semantics but content-addressed — reproducible across engines, runs, and
  * partitionings; stable under re-partitioning (unlike `rand()`); and
  * scan-local (a pushdown-friendly filter, no shuffle, no state). Changing
  * the salt draws an independent sample — the standard salted-hash-sampling
  * design (e.g. for train/holdout splits that must never leak).
  */
object Sampling {

  private val Pow32 = 4294967296.0 // 2^32

  /** The per-row hash in [0, 2^32): md5-derived, salt-prefixed. */
  def sampleHash(key: Column, salt: String): Column =
    Dedup.shingleBase(concat(lit(salt), key.cast("string")))

  /** Keep rows whose hash falls below `rate` of the 32-bit space. */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate outside [0,1]")
    df.filter(sampleHash(key, salt) < lit((rate * Pow32).toLong))
  }

  /** Per-stratum rates (e.g. downsample a dominant source, keep the rest):
    * rows in stratum s pass at `rates(s)`, others at `defaultRate`. One
    * scan-local CASE over the same hash — no shuffle, no per-stratum scans. */
  def stratifiedHashSample(
      df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Pow32).toLong)) {
      case (acc, (s, r)) => when(stratum === s, lit((r * Pow32).toLong)).otherwise(acc)
    }
    df.filter(sampleHash(key, salt) < threshold)
  }

  /** Deterministic train/holdout assignment: a labeled split column instead
    * of a filter, same content-addressed hash (holdout membership can never
    * drift between runs or engines). */
  def splitColumn(key: Column, holdoutRate: Double, salt: String = ""): Column =
    when(sampleHash(key, salt) < lit((holdoutRate * Pow32).toLong), lit("holdout"))
      .otherwise(lit("train"))

  /** Per-row weighted Bernoulli keep: a row is kept iff its content hash
    * falls below weight·2³², where `weight` is ANY column valued in [0,1]
    * (clamped) — acceptance sampling driven by a per-row quality or score
    * signal rather than a fixed rate. Still one scan-local predicate:
    * reproducible, repartition-stable, pushdown-friendly, no shuffle. */
  def weightedSample(
      df: DataFrame, key: Column, weight: Column, salt: String = ""): DataFrame =
    df.filter(sampleHash(key, salt) <
      (least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)) * Pow32).cast("long"))

  /** Deterministic per-group cap: keep at most `n` rows per value of
    * `groupCol`, selected by the content-addressed (hash, key) order — the
    * "cap documents per domain/source" step that stops one crawl host from
    * dominating a corpus. The selection is a pure function of row content
    * (salt-swappable, repartition-stable), NOT head-of-scan order, so the
    * kept set is identical across runs and engines.
    *
    * Plan shape: one hash-shuffle on the group key + per-group sort
    * (window row_number). Groups are capped at n, but a HOT group (one
    * domain = half the corpus) still sorts all its rows in one partition
    * before cutting — for adversarially skewed group keys use
    * [[capPerGroupSalted]], the same two-stage discipline as
    * [[graft.ops.Sorts.replaceDedupSalted]]. */
  def capPerGroup(
      df: DataFrame, groupCol: Column, key: Column, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    require(!df.columns.contains("__rn"), "__rn column name collision")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(sampleHash(key, salt).asc, key.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Two-stage [[capPerGroup]] for adversarially HOT groups (one domain =
    * half the corpus). Stage 1 partitions each group's rows into
    * `saltBuckets` deterministic hash buckets and caps each (group, bucket)
    * to n under the SAME content-addressed order — sound because the
    * group's true top-n under that order is spread across buckets, each
    * contributing at most n of it, so the survivors (≤ n·saltBuckets per
    * group) are a superset of the answer. Stage 2 re-caps the shrunken
    * frame exactly. The hot group's big sort becomes `saltBuckets`
    * independent partition-sized sorts; the final exact sort sees at most
    * n·saltBuckets rows per group. Result is IDENTICAL to [[capPerGroup]]
    * (property-tested on a pathologically hot group). Salt-bucket hash is
    * derived from the order hash's salt with a distinct prefix, so bucket
    * routing and keep-order stay independent functions of content. */
  def capPerGroupSalted(
      df: DataFrame, groupCol: Column, key: Column, n: Int,
      saltBuckets: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    require(saltBuckets >= 1, s"saltBuckets=$saltBuckets must be >= 1")
    require(!df.columns.contains("__rn1"), "__rn1 column name collision")
    val bucket = pmod(sampleHash(key, salt + "bucket:"), lit(saltBuckets))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, bucket)
      .orderBy(sampleHash(key, salt).asc, key.asc)
    val pruned = df.withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= n)
      .drop("__rn1")
    capPerGroup(pruned, groupCol, key, n, salt)
  }

  /** Deterministic epoch shuffle: a reproducible global permutation of the
    * corpus — every epoch a different, independent order (epoch-salted
    * content hash), every run/engine/partitioning the SAME order for a
    * given epoch, which is what makes a training run resumable and
    * debuggable. Ties (hash collisions) are broken by the key, so the
    * permutation is total. `orderBy` executes as range-sample →
    * range-partition → partition-local sort — the scalable global sort; no
    * RNG state is ever materialized. The shuffle hash is exposed as
    * `pos_hash` so downstream stages (packing, sharded writes) can reuse
    * the order without re-sorting. */
  def epochShuffle(
      df: DataFrame, key: Column, epoch: Int, salt: String = ""): DataFrame =
    df.withColumn("pos_hash", sampleHash(key, s"$salt${epoch}:"))
      .orderBy(col("pos_hash"), key)

  /** Weighted data mixture with epochs: stratum s appears `weights(s)`
    * times in expectation — full copies for the integer part (tagged with
    * an `epoch` column) plus a deterministic hash-sample of the fractional
    * remainder (epoch-salted, so each epoch's partial sample is
    * independent). Weight 2.3 = every row twice plus a 30% third pass —
    * exactly how pretraining mixtures oversample high-quality corpora.
    *
    * ONE scan: the epoch fan-out is an explode over ceil(w) ints, and the
    * filter is the same scan-local hash predicate as [[hashSample]] — no
    * shuffle, no per-source re-scans. Weight 0 drops the stratum. */
  def weightedEpochMix(
      df: DataFrame, key: Column, stratum: Column,
      weights: Map[String, Double], defaultWeight: Double,
      salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0), "weights must be >= 0")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    val epochHash = Dedup.shingleBase(
      concat(lit(salt), col("epoch").cast("string"), lit(":"), key.cast("string")))
    df.withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), ceil(col("__w")).cast("int") - 1)))
      .filter(col("epoch") < floor(col("__w")) ||
        epochHash < ((col("__w") - floor(col("__w"))) * Pow32).cast("long"))
      .drop("__w")
  }
}

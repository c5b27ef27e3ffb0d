package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the classic fix when ONE join key's
  * row count exceeds any partition budget, which AQE's skew-join splitting
  * cannot always save (it splits oversized map outputs of sort-merge joins,
  * but a single monster key still lands in one stream, and AQE is off in
  * some deployments). Complements the salted two-stage dedup in
  * [[Sorts.replaceDedupSalted]].
  *
  * Mechanics: each build-side (right) row is replicated once per salt
  * bucket; each probe-side (left) row gets ONE salt, and the join key
  * becomes (keys..., salt). The salt is DETERMINISTIC — a pure hash of row
  * content (and, when given, `probeIdCols`) — because it participates in
  * the shuffle key: a non-deterministic disambiguator (e.g. a per-row
  * synthetic id) would re-route recomputed rows to different buckets on a
  * fetch-failure-driven stage retry, silently losing or duplicating join
  * rows — the SPARK-23207 class of bug, invisible to single-run local
  * tests.
  *
  * `probeIdCols`: pass the probe side's unique-key columns (a primary key,
  * a doc_id) and the salt hashes ONLY those — identical payloads with
  * distinct ids spread uniformly. With no id columns the salt falls back to
  * hashing the full row content, which spreads a hot KEY as long as the
  * rows carry any distinguishing column, but rows that are COMPLETELY
  * identical hash to the same bucket and clump (documented limitation: if
  * your probe side is all-duplicate rows, aggregate them first or supply an
  * id).
  *
  * Equivalence to the plain join holds for inner / left_outer / left_semi /
  * left_anti — every left row exists with exactly one salt, and the right
  * side provides all salts for every key — and is property-tested on a
  * pathologically skewed frame (SkewJoinSpec).
  *
  * Cost model: build side ×saltBuckets rows (use for small-dim builds —
  * the same regime where you'd otherwise broadcast, but where the PROBE
  * side's hot keys, not the build size, are the problem); probe side
  * untouched. At 100 TB pick saltBuckets ≈ hot-key rows / target partition
  * rows.
  */
object SkewJoin {

  private val supported = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Probe-side salt: deterministic hash of `idCols` when given (unique ids
    * spread identical payloads), else of the full row (routing-only; never
    * observable in the result; stable under task recomputation). */
  private[graft] def probeSalt(left: DataFrame, saltBuckets: Int,
      idCols: Seq[String] = Nil) = {
    val basis = if (idCols.nonEmpty) idCols.map(col) else left.columns.toSeq.map(col)
    pmod(hash(basis: _*), lit(saltBuckets))
  }

  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner",
      probeIdCols: Seq[String] = Nil): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(supported.contains(joinType.toLowerCase),
      s"salting replicates the right side: join type '$joinType' would " +
        "duplicate right rows in the output (only inner/left variants are sound)")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt column name collision")
    require(probeIdCols.forall(left.columns.contains),
      s"probeIdCols ${probeIdCols.filterNot(left.columns.contains)} not in left frame")
    val l = left.withColumn("__salt", probeSalt(left, saltBuckets, probeIdCols))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}

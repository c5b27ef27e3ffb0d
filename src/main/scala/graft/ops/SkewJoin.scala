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
  * bucket; each probe-side (left) row gets ONE salt — hash of the full row
  * MIXED with a per-row id, mod buckets — so a hot key's rows spread
  * across `saltBuckets` reducers even when the probe rows are IDENTICAL
  * (a probe frame projected to just the join keys would otherwise hash
  * every hot-key row to the same bucket, defeating the spread in exactly
  * the regime this operator exists for; the per-row id keeps the routing
  * uniform and affects only placement, never the join result). The join
  * key becomes (keys..., salt).
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

  /** Probe-side salt: full-row hash mixed with a per-row id so identical
    * rows still spread (routing-only; never observable in the result). */
  private[graft] def probeSalt(left: DataFrame, saltBuckets: Int) =
    pmod(hash(left.columns.map(col) :+ monotonically_increasing_id(): _*),
      lit(saltBuckets))

  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(supported.contains(joinType.toLowerCase),
      s"salting replicates the right side: join type '$joinType' would " +
        "duplicate right rows in the output (only inner/left variants are sound)")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt column name collision")
    val l = left.withColumn("__salt", probeSalt(left, saltBuckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}

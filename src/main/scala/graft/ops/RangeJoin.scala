package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — all (point, interval) pairs of the same
  * key with start ≤ point ≤ end. Spark plans a raw range predicate as a
  * broadcast-nested-loop join: O(points·intervals) comparisons per key, a
  * non-starter at scale. The scalable form is BUCKETED: quantize time into
  * `bucketWidth`-sized buckets, explode each interval over the buckets it
  * spans, equi-join on (key, bucket) — a plain shuffle hash join — and
  * re-check the exact range on the (small) bucket-matched candidate set.
  * A point lives in exactly one bucket, so candidates are never duplicated.
  *
  * Cost: O(points + intervals · span/bucketWidth) join rows. Pick
  * `bucketWidth` near the typical interval length — each interval then
  * explodes into ≤2-3 buckets.
  *
  * Both `pointCol` and start/end must be LONG (e.g. epoch micros — cast
  * timestamps upstream); generic numeric ranges work the same way.
  */
object RangeJoin {
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCol: String,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    val iv = intervals
      .withColumn("__b",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, Seq(keyCol, "__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}

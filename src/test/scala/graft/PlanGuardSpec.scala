package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over the ENTIRE declared query surface: no
  * query may plan a cartesian product or a broadcast-nested-loop join
  * unless it is on the explicit allowlist of intentional scalar/small-side
  * cross joins. A range predicate accidentally written as a raw theta-join,
  * or a lost equi-join key, fails here long before it melts a cluster.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose cross join is BY DESIGN a broadcast of a provably tiny
    * side (a scalar count or an nlist/k-sized frame), documented at the
    * call site. */
  private val allowedNlj: Set[String] = Set(
    "ann_brute_topk",   // corpus × broadcast(query set) — the brute-force contract
    "ann_ivf_topk",     // corpus × broadcast(nlist centroids), queries × broadcast(centroids)
    "agg_overflow",     // overflow-row emptiness probe: × broadcast(1-row count)
    "contamination",    // corpus × broadcast(1-row benchmark hash set)
    "text_bm25",        // corpus × broadcast(1-row BM25 corpus stats)
    "embed_kmeans",     // corpus × broadcast(k centroids) per Lloyd pass
    "zorder_values")    // scan × broadcast(1-row min/max stats)

  test("no query plans a cartesian product or unlisted nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (nlj && !allowedNlj(name)) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"plan smells:\n${offenders.mkString("\n")}")
  }
}

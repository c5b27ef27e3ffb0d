package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.AnsiSweep

/** ANSI-mode certification gate (the SchemaDriftSpec pattern applied to
  * `spark.sql.ansi.enabled`): every declared query runs under the session
  * default (non-ANSI — the reference's wrapping/NULL-ing semantics,
  * SURVEY §7 risk #1) and again under ANSI, and its classification must
  * match the committed table in ANSI.md. A new query landing with an
  * unexpected ANSI divergence — or an existing one regressing — fails
  * here, not in a user's ANSI-mode session.
  *
  * Scale scope: certification runs at sf0.001, like the drift gate. An
  * overflow that only a larger scale can trigger would surface as the
  * documented refusal classes (CAST_OVERFLOW / ARITHMETIC_OVERFLOW), not
  * as silent divergence — the `try_*` checked ops and the ANSI-aware SUM
  * pushdown refusal are the two mechanisms that keep ANSI behavior sound
  * at any scale.
  */
class AnsiSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The committed classification (ANSI.md): queries NOT listed here must
    * certify `pass` (ANSI run succeeds, bit-identical result). */
  private val expectedNonPass: Map[String, String => Boolean] = Map(
    // The manifest SUM pushdown REFUSES under ANSI by design (stored
    // integral partials wrap like non-ANSI sum; an ANSI scan throws on
    // overflow, so a pushed answer could silently differ — refusal is the
    // only sound choice, ArrowIpcSource sumResultType). The query's own
    // PushedAggregation plan-assert then raises — the refusal made loud.
    "arrow_sum_pushdown" -> (_.startsWith("refused:")))

  test("every declared query certifies against the committed ANSI classification") {
    val unexpected = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val cls = AnsiSweep.classify(spark, sfDir, name)
      expectedNonPass.get(name) match {
        case Some(ok) =>
          if (ok(cls)) None
          else Some(s"$name: expected the committed non-pass class, got '$cls'")
        case None =>
          if (cls == "pass") None else Some(s"$name: expected 'pass', got '$cls'")
      }
    }
    assert(unexpected.isEmpty,
      s"ANSI certification drifted from ANSI.md:\n${unexpected.mkString("\n")}")
  }
}

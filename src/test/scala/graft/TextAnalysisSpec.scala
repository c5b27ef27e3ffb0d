package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Text analysis semantics on crafted strings. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("token counts: whitespace and subword") {
    assert(one("hello  world", TextAnalysis.tokenCount(col("t"))) === 2)
    assert(one("", TextAnalysis.tokenCount(col("t"))) === 0)
    assert(one("  ", TextAnalysis.tokenCount(col("t"))) === 0)
    // "don't stop123" → [don] ['] [t] [stop] [123] = 5
    assert(one("don't stop123", TextAnalysis.subwordTokenCount(col("t"))) === 5)
  }

  test("ratios: stopword, punctuation, mean token length") {
    assert(one("the cat", TextAnalysis.stopwordRatio(col("t"))) === 0.5)
    assert(one("a.b,c!", TextAnalysis.punctRatio(col("t"))) === 0.5)
    assert(one("ab cdef", TextAnalysis.meanTokenLen(col("t"))) === 3.0)
    assert(one("", TextAnalysis.meanTokenLen(col("t"))) === 0.0)
  }

  test("bm25 terms are data: uppercase matches, dots don't break resolution") {
    val docs = Seq((1L, "merge.join is a merge strategy"), (2L, "nothing relevant"))
      .toDF("doc_id", "text")
    val upper = graft.ops.TextAnalysis.bm25(docs, "doc_id", "text", Seq("Merge.Join"))
      .collect()
    assert(upper.map(_.getLong(0)).toSeq === Seq(1L), "uppercase/dotted term must match")
    assert(upper.head.getAs[Int]("n_match") === 1)
  }

  test("chunkDocs: coverage, overlap, tail rules, empty text") {
    val df = Seq(
      (1L, "abcdefghij"),  // len 10: chunk=5 overlap=2 stride=3 → starts 1,4,7 (10 dropped: ⊂ prev)
      (2L, "abc"),         // single short chunk
      (3L, "")             // whole-text rule: one empty chunk
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.chunkDocs(df, "doc_id", "text", chunkChars = 5, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("chunk_id"), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      (1L, 0L, "abcde"), (1L, 1L, "defgh"), (1L, 2L, "ghij"),
      (2L, 0L, "abc"),
      (3L, 0L, "")))
    // reconstruction: dropping each chunk's leading overlap re-concatenates
    // to the original text
    val rebuilt = out.filter(_._1 == 1L).sortBy(_._2)
      .zipWithIndex.map { case ((_, _, c), i) => if (i == 0) c else c.drop(2) }.mkString
    assert(rebuilt === "abcdefghij")
  }

  test("chunkDocs reconstruction property: random texts, several geometries") {
    val rnd = new scala.util.Random(99)
    val alphabet = "abcdefghij é ß 中 XYZ0123"
    val docs = (0L until 40L).map { i =>
      val len = rnd.nextInt(300)
      (i, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((50, 10), (64, 0), (7, 3))) {
      val byDoc = graft.ops.TextAnalysis.chunkDocs(df, "doc_id", "text", chunk, overlap)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("chunk_id"), r.getString(2)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val chunks = byDoc(id).sortBy(_._2).map(_._3)
        val rebuilt = chunks.head + chunks.tail.map(_.drop(overlap)).mkString
        assert(rebuilt === text, s"doc $id chunk=$chunk overlap=$overlap")
      }
    }
  }

  test("PII redaction: categories, order contract, counts") {
    val t = "Mail a.b+1@x-corp.co.uk now, host 10.0.255.7 up, call 555-123-4567 or 800.555.1212."
    assert(one(t, TextAnalysis.redactPii(col("t"))) ===
      "Mail <EMAIL> now, host <IP> up, call <PHONE> or <PHONE>.")
    val counts = TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }
    val r = Seq(t).toDF("t").select(counts: _*).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((1, 1, 2)))
    // order contract: an email's digit runs are consumed by the email pass,
    // never re-counted as phone/IP; a 4-octet dotted quad is IP, not phone
    assert(one("x 555-123-4567@mail.com y", TextAnalysis.redactPii(col("t"))) ===
      "x <EMAIL> y")
    assert(one("1.2.3.4", TextAnalysis.redactPii(col("t"))) === "<IP>")
    assert(one("no pii here", TextAnalysis.redactPii(col("t"))) === "no pii here")
  }

  test("quality score components sum in [0,1]") {
    val good = "the quick brown fox jumps over a lazy dog and keeps running fast"
    assert(one(good, TextAnalysis.qualityScore(col("t"))) === 1.0)
    assert(one("", TextAnalysis.qualityScore(col("t"))) === 0.25) // only punct=0 passes
  }

  test("language id heuristic") {
    assert(one("the cat sat on the mat and it is happy",
      TextAnalysis.langId(col("t"))) === "en")
    assert(one("der hund und die katze das ist gut",
      TextAnalysis.langId(col("t"))) === "de")
    assert(one("le chat est sur la table et les livres",
      TextAnalysis.langId(col("t"))) === "fr")
    assert(one("el perro y los gatos es un animal",
      TextAnalysis.langId(col("t"))) === "es")
    assert(one("中文文本处理", TextAnalysis.langId(col("t"))) === "zh")
    assert(one("zzz qqq xxx", TextAnalysis.langId(col("t"))) === "und")
  }

  test("fingerprint is case/whitespace-normalization invariant") {
    val df = Seq(
      ("a", "Hello   World"),
      ("b", "hello world"),
      ("c", " HELLO\tWORLD "),
      ("d", "different")).toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") === fps("b"))
    assert(fps("b") === fps("c"))
    assert(fps("a") !== fps("d"))
  }

  test("rolling hash: order-sensitive, normalization-invariant") {
    val df = Seq(
      ("a", "ab c"), ("b", "AB  C"), ("c", "c ab")).toDF("id", "t")
    val hs = df.select(col("id"), TextAnalysis.rollingHash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hs("a") === hs("b"))
    assert(hs("a") !== hs("c"))
  }

  test("vocabulary: counts, doc frequency, deterministic top-k order") {
    val docs = Seq(
      (1L, "the cat The dog"),
      (2L, "the dog runs"),
      (3L, "cat")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "the": 3 occurrences (case-folded) in 2 docs; ties broken by token asc
    assert(v.toSeq === Seq(("the", 3L, 2L), ("cat", 2L, 2L), ("dog", 2L, 2L)))
  }

  test("bm25: idf ordering, tf saturation, unmatched docs dropped") {
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler"),
      (3L, "common common common common filler filler"),
      (4L, "filler only text here")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 4 matches nothing → absent
    assert(r.keySet === Set(1L, 2L, 3L))
    // rare appears in 1 doc, common in 3 → doc 1's rare term outscores any
    // common-only doc despite equal-ish lengths
    val s1 = r(1L).getDouble(3); val s2 = r(2L).getDouble(3); val s3 = r(3L).getDouble(3)
    assert(s1 > s2 && s1 > s3)
    // tf saturation: doc 3 has 4× the tf of doc 2 but nowhere near 4× score
    assert(s3 > s2 && s3 < 4 * s2)
    assert(r(1L).getInt(2) === 2 && r(2L).getInt(2) === 1) // n_match
    // dl column is the whitespace token count
    assert(r(1L).getLong(1) === 6L)
  }

  test("repetition stats: duplicate lines and dominant bigrams are scored") {
    val docs = Seq(
      (1L, "aa bb\naa bb\ncc dd"),        // 3 lines, 2 distinct → dup 1/3
      (2L, "go go go go"),                // bigrams: "go go" ×3 → share 1.0
      (3L, "all words here differ now"),  // 4 distinct bigrams → share 1/4
      (4L, "one")).toDF("doc_id", "text") // <2 tokens → share 0
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out(1L)._1 - 1.0 / 3) < 1e-12)
    assert(out(2L) === ((0.0, 1.0)))
    assert(out(3L)._2 === 0.25)
    assert(out(4L) === ((0.0, 0.0)))
  }

  test("removeDuplicateLines: later repeats drop, blanks survive, text rebuilds in order") {
    val docs = Seq(
      (1L, "nav\nbody one\n\nbody two\nnav\nfooter\nfooter"),
      (2L, "only\nunique\nlines"),
      (3L, "\n\na\n\n")).toDF("doc_id", "text") // repeated BLANKS all survive
    val out = TextAnalysis.removeDuplicateLines(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) === ((7L, 5L, "nav\nbody one\n\nbody two\nfooter")))
    assert(out(2L) === ((3L, 3L, "only\nunique\nlines")))
    assert(out(3L) === ((5L, 5L, "\n\na\n\n")))
  }

  test("ngram contamination: benchmark overlap flags only contaminated docs") {
    val bench = Seq((100L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "abcdefghijklmnop"),        // identical → contamination 1.0
      (2L, "zzzzzzzzzzzzzzzz"),        // disjoint → 0.0
      (3L, "xxabcdefghijklmn")).toDF("doc_id", "text") // partial overlap
    val out = graft.ops.Dedup.ngramContamination(
      corpus, bench, "doc_id", "text", width = 8, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("contamination")).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === 1.0)
    assert(out(3L) > 0.5 && out(3L) < 1.0)
  }
}

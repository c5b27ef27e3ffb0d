package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation: token stats, quality scoring,
  * language-ID heuristic, fingerprinting. Beyond-reference surface.
  *
  * Everything is a pure column expression (codegen-friendly, no UDFs) and
  * deterministic, so the DuckDB oracle can reproduce results exactly.
  */
object TextAnalysis {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space chars each count as one token — a cheap,
    * deterministic stand-in for a real tokenizer's token count. */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Stopword ratio against a fixed public English stopword list. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => lower(t).isInCollection(stopwords))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Mean token length (0 for empty text). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: length band + sane mean token length
    * + low punctuation + moderate stopword presence. The exact weights are
    * a policy choice; what matters is determinism and that each component
    * is a scan-local expression. */
  def qualityScore(text: Column): Column = {
    val lenScore = when(length(text).between(20, 5000), 0.25).otherwise(0.0)
    val tokScore = when(meanTokenLen(text).between(2.0, 12.0), 0.25).otherwise(0.0)
    val punScore = when(punctRatio(text) <= 0.2, 0.25).otherwise(0.0)
    val stpScore = when(stopwordRatio(text).between(0.01, 0.6), 0.25).otherwise(0.0)
    round(lenScore + tokScore + punScore + stpScore, 2)
  }

  /** Marker stopword lists for a few languages (public common words). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una"))

  /** Language-ID heuristic: CJK codepoint share decides "zh"; otherwise the
    * marker-list with the highest hit ratio wins (ties broken by language
    * code order); no hits → "und". A real system would use character
    * n-gram profiles; the shape (scan-local scoring, argmax) is the same. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val toks = tokens(text)
    val total = size(toks)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(filter(toks, t => lower(t).isInCollection(markers)))
      struct((hits.cast("double") / greatest(total, lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*) // struct compare: score first, then lang
    when(cjk * 3 > length(text), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed text —
    * the canonical near-exact-dup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[ \\t\\n\\r]+", " ")))

  /** Rolling polynomial hash (base 31, mod 2^31-1) over the normalized
    * text's bytes — an order-sensitive fingerprint cheap enough to compute
    * per chunk. Expressed with aggregate() so it stays in codegen. */
  def rollingHash(text: Column): Column = {
    val norm = trim(regexp_replace(lower(text), "[ \\t\\n\\r]+", " "))
    val codes = transform(split(norm, ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * 31 + c, lit(2147483647L)))
  }

  /** Corpus vocabulary: the `k` most frequent lowercased whitespace tokens
    * with counts and document frequency. One explode + one groupBy with
    * map-side partial aggregation (the shuffle carries one row per distinct
    * token per partition, not per occurrence), then TakeOrdered(k) — never
    * a global sort of the vocabulary. Deterministic tiebreak: count desc,
    * token asc. */
  def vocabulary(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"), count_distinct(col(idCol)).as("doc_freq"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Okapi BM25 relevance of every document against a literal query-term
    * set (Robertson/Spärck Jones probabilistic IDF, the Lucene "+1" variant
    * so scores stay non-negative), plus the matched-term count.
    *
    * The shape is the 100 TB one: per-term frequencies and document length
    * are SCAN-LOCAL array expressions over the lowercased whitespace tokens
    * — a handful of literal query terms means NO corpus explode and no
    * shuffle of document data at all. The only aggregation is ONE global
    * stats row (N, Σdl, per-term document frequency) broadcast back to the
    * scan. Doubles combine in a fixed literal-term order and the score is
    * rounded, so the DuckDB oracle reproduces results exactly.
    */
  def bm25(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75
  ): org.apache.spark.sql.DataFrame = {
    // Terms are lowercased on entry (tokens are matched lowercased, so an
    // uppercase query term would otherwise silently match nothing), and
    // internal columns are POSITIONAL (tf_0…) — a term is data, never
    // spliced into a column name it could break (dots, quotes).
    val terms = queryTerms.map(_.toLowerCase)
    require(terms.nonEmpty && terms == terms.distinct,
      "queryTerms must be a non-empty case-insensitive set")
    val idx = terms.indices
    val toks = tokens(lower(col(textCol)))
    val tfCols = terms.zipWithIndex.map { case (q, i) =>
      size(filter(toks, t => t === q)).cast("long").as(s"tf_$i") }
    val base = df.select(col(idCol) +: size(toks).cast("long").as("dl") +: tfCols: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sum_dl") +:
        idx.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    // 1-row global stats × corpus: intentional broadcast NLJ (PlanGuardSpec
    // allowlists text_bm25), the same pattern as the overflow-row probe.
    val withStats = base.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n").cast("double")
    val contribs = idx.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("n").cast("double") - col(s"df_$i") + 0.5) /
        (col(s"df_$i") + 0.5) + 1.0)
      when(col(s"tf_$i") > 0,
        idf * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)))
        .otherwise(lit(0.0))
    }
    val nMatch = idx.map(i => when(col(s"tf_$i") > 0, 1).otherwise(0))
      .reduce(_ + _)
    withStats
      .filter(idx.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col(idCol), col("dl"), nMatch.cast("int").as("n_match"),
        round(contribs.reduce(_ + _), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
  }

  /** Split documents into fixed-size character chunks with overlap — the
    * "context-window chunking" step of retrieval/pretraining pipelines
    * (stride = chunkChars − overlap; each chunk starts where the previous
    * one ended minus the overlap). Pure scan-local sequence + explode: the
    * fan-out is data-parallel, nothing shuffles, and chunk identity
    * (`chunk_id` = stride index) is a pure function of the text length —
    * reproducible anywhere.
    *
    * Boundary rules (part of the contract, mirrored by the SQL oracle):
    * the final chunk may be shorter than `chunkChars`; a start position
    * whose chunk would be fully contained in the previous chunk is
    * dropped (`start ≤ len − overlap` unless it is the first chunk), so
    * every character is covered exactly once beyond the declared overlap;
    * empty text yields one empty chunk (whole-text rule, as in
    * shingling). */
  def chunkDocs(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      chunkChars: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkChars > 0 && overlap >= 0 && overlap < chunkChars,
      s"need 0 <= overlap=$overlap < chunkChars=$chunkChars")
    val stride = chunkChars - overlap
    val len = length(col(textCol))
    df.select(col(idCol), col(textCol),
        explode(sequence(lit(1), greatest(len, lit(1)), lit(stride))).as("__start"))
      .filter(col("__start") === 1 || col("__start") <= len - overlap)
      .select(col(idCol),
        (floor((col("__start") - 1) / stride)).cast("long").as("chunk_id"),
        col(textCol).substr(col("__start"), lit(chunkChars)).as("chunk_text"))
  }

  /** PII redaction patterns — deliberately written in the common subset of
    * Java regex and RE2 (character classes, bounded repetition, \b; no
    * lookaround), so Spark's codegen regexp and any RE2-based oracle
    * (DuckDB) agree byte-for-byte on every match. The pattern set is the
    * standard curation trio (emails, IPv4, NANP-style phone numbers); real
    * pipelines extend the list — each entry stays one scan-local
    * regexp_replace, so the cost model never changes. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe: String = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Redact emails → `<EMAIL>`, IPv4 → `<IP>`, phones → `<PHONE>`.
    * Order matters and is part of the contract: emails first (their local
    * part may contain digit runs), then IPs (4 dot-groups), then phones
    * (3-3-4 with -/. separators) — each later pattern sees the previous
    * replacements' output. Pure scan-local expression chain, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-category PII match counts (same patterns/order as [[redactPii]],
    * counted on the ORIGINAL text) — audit signal for redaction runs. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(emailRe)),
    "n_ips"    -> regexp_count(regexp_replace(text, emailRe, "<EMAIL>"), lit(ipv4Re)),
    "n_phones" -> regexp_count(
      regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), ipv4Re, "<IP>"),
      lit(phoneRe)))

  /** Repetition quality signals (the Gopher-rule family — Rae et al. 2021
    * §A1.1 filters on exactly these): per document,
    *  - `dup_line_frac`: 1 − distinct/total over non-empty trimmed lines —
    *    boilerplate and scraped nav bars repeat lines;
    *  - `top_bigram_share`: occurrences of the most frequent word bigram
    *    over all bigrams — degenerate generative loops repeat phrases.
    *
    * Line stats are pure array expressions (scan-local). The bigram mode
    * is explode + two-level aggregation — O(bigrams) shuffle rows with
    * map-side combine, never the O(len²) per-row array self-scan that an
    * expression-only formulation would need. Docs with <2 tokens score 0. */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String
  ): org.apache.spark.sql.DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val lineStats = df.select(
      col(idCol),
      when(size(lines) > 0,
        lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
        .otherwise(lit(0.0)).as("dup_line_frac"))
    val tk = df.select(col(idCol), tokens(col(textCol)).as("tk"))
    val bigrams = tk.filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
        .as("bg"))
    val share = bigrams.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_bigram_share"))
    lineStats.join(share, Seq(idCol), "left")
      .select(col(idCol), col("dup_line_frac"),
        coalesce(col("top_bigram_share"), lit(0.0)).as("top_bigram_share"))
  }

  /** DUPLICATE-LINE REMOVAL (round 14) — the APPLY face of
    * [[repetitionStats]]'s dup_line_frac signal: per document, every
    * repeated non-blank line after its first occurrence is dropped and
    * the text rebuilt in position order (blank lines always survive —
    * they are paragraph structure, not boilerplate). The Gopher/C4
    * boilerplate-removal shape (navigation bars, cookie banners, footer
    * lines repeated through a crawl page).
    *
    * Exact and deterministic (byte-equal lines, first-occurrence keep),
    * so the oracle reproduces the cleaned text VERBATIM. Scale shape:
    * doc-partitioned window + per-doc sorted rebuild — the collect_list
    * is bounded by the document's own line count, no corpus-wide state.
    *
    * @return (idCol, n_lines, kept_lines, text_clean), one row per
    *   non-null-text document. */
  def removeDuplicateLines(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String
  ): org.apache.spark.sql.DataFrame = {
    val lines = df.filter(col(textCol).isNotNull).select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("line")).orderBy(col("pos"))
    val kept = lines.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || trim(col("line")) === "")
    val per = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val reb = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("kept_lines"),
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line"))).as("text_clean"))
    per.join(reb, Seq(idCol))
      .select(col(idCol), col("n_lines"), col("kept_lines"), col("text_clean"))
  }
}

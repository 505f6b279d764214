package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis operators for LLM training-data pipelines
  * (charter extension, SURVEY §0(c)): token counting, quality scoring,
  * language ID, normalization — phrased over `documents.text`
  * (FIXTURES.md §B).
  *
  * Everything here is a pure Column expression (whole-stage codegen, no
  * UDFs, no shuffle) and therefore scales linearly with the scan: at
  * 100 TB these run map-side at parquet-read throughput. Each expression
  * has a byte-equivalent DuckDB mirror in
  * `graft.registry.ExtQueries` — edits must be applied in both places.
  */
object TextOps {

  /** Whitespace-collapse + lowercase canonical form (dedup pre-pass). */
  def normalizeWs(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct token set (Jaccard / language-ID input). */
  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("bigint")

  /** ROUGH subword count (honest name — this is a pre-tokenizer
    * heuristic, not BPE): runs of letters, runs of digits, and single
    * non-alphanumeric marks each count as one token. Pure Column
    * expression, so it runs map-side at scan throughput — the cheap
    * budgeting proxy; [[bpeTokenCount]] runs the real merge loop.
    */
  def roughTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("bigint")

  /** A tiny rank-ordered merge table (common English pairs) for specs
    * and demos; a real pipeline passes its tokenizer's learned merges.
    */
  val DemoBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "e" -> "n",
    "a" -> "t", "o" -> "u", "i" -> "s", "e" -> "s", "t" -> "o")

  /** REAL byte-pair-encoding token count (Sennrich et al. 2016 — the
    * merge phase every BPE tokenizer runs): whitespace pre-tokenize;
    * each word starts as its character-symbol sequence and repeatedly
    * merges ALL occurrences of the present pair with the lowest merge
    * rank until no table pair remains; the count is the surviving
    * symbols summed over words. The merge table is the caller's (ship
    * the tokenizer's learned ranks) — token budgets are only honest
    * against the vocab that will actually tokenize the corpus.
    *
    * A Scala UDF by necessity (a data-dependent fixpoint loop has no
    * Column form) — still map-side and shuffle-free; the rank map rides
    * the closure once per executor. No DuckDB-expressible oracle
    * (iterative merging defeats portable SQL), so this is spec-gated
    * (TextBpeSpec) rather than registry-gated, per the SURVEY §5.2
    * contract for non-SQL-expressible ops.
    */
  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column = {
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val count = udf { text: String =>
      if (text == null) 0L
      else {
        var total = 0L
        text.trim.split("\\s+").foreach { word =>
          var syms = word.map(_.toString).toArray
          var done = syms.length <= 1
          while (!done) {
            // lowest-rank pair present anywhere in the word
            var best = -1
            var bestAt = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              rank.get((syms(i), syms(i + 1))).foreach { r =>
                if (r < bestAt) { bestAt = r; best = i }
              }
              i += 1
            }
            if (best < 0) done = true
            else {
              val (l, r) = (merges(bestAt)._1, merges(bestAt)._2)
              // merge ALL occurrences of the chosen pair, left to right
              val out = Array.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                  out += l + r; j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.result()
              done = syms.length <= 1
            }
          }
          total += syms.length
        }
        total
      }
    }
    count(c)
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  }

  /** Fraction of characters that are common punctuation marks; 0.0 for
    * the empty string (an unguarded length-0 divisor is a runtime error
    * under ANSI mode, the Spark 4 default).
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      (length(c) - length(regexp_replace(c, "[.,;:!?'\"()\\-]", ""))).cast("double") /
        length(c))

  /** Composite quality score in [0,1]: length saturation (0.5) +
    * stopword-ratio plausibility band (0.3) + low punctuation (0.2).
    * Deterministic double arithmetic; thresholds are heuristic.
    */
  def qualityScore(c: Column): Column =
    lit(0.5) * least(lit(1.0), tokenCount(c).cast("double") / 100.0) +
      lit(0.3) * when(stopwordRatio(c).between(0.05, 0.6), 1.0).otherwise(0.0) +
      lit(0.2) * (lit(1.0) - punctRatio(c))

  // language marker sets (distinct-token set intersections)
  private val EnMarkers = Seq("the", "and", "of", "to", "a")
  private val DeMarkers = Seq("der", "die", "und", "ist", "das")
  private val FrMarkers = Seq("le", "la", "et", "les", "des")
  private val EsMarkers = Seq("el", "que", "los", "por", "una")
  private val ZhChars = Seq("的", "是", "了")

  private def score(c: Column, markers: Seq[String]): Column =
    size(array_intersect(distinctTokens(c), array(markers.map(lit): _*)))

  /** N-gram/marker-word language-ID heuristic: CJK character presence
    * wins outright; otherwise the language whose marker-word set
    * intersects the document's token set most (ties broken en > de >
    * fr > es), 'und' (undetermined) when no marker hits.
    */
  def langId(c: Column): Column = {
    val (en, de, fr, es) =
      (score(c, EnMarkers), score(c, DeMarkers), score(c, FrMarkers), score(c, EsMarkers))
    when(ZhChars.map(z => c.contains(z)).reduce(_ || _), "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Content fingerprint: md5 of the whitespace-canonical form — the
    * exact-dedup key (see DedupOps.exactDupGroups).
    */
  def fingerprint(c: Column): Column = md5(normalizeWs(c))

  // PII patterns restricted to syntax RE2 and Java regex interpret
  // identically (no lookaround, no backrefs), so the DuckDB oracle can
  // run the literal same expressions.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** PII redaction (the pre-training scrub pass): replace every email
    * address and NNN-NNN-NNNN phone number with a typed placeholder.
    * Pure Column expression — two codegen'd regexp_replace passes, no
    * UDF, map-side at scan throughput. Pattern coverage is the
    * deliberately-conservative curation baseline (high precision);
    * swapping in a learned NER scrubber would ride the same seam.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}

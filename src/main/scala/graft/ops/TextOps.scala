package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID and
  * document fingerprinting.
  *
  * All operators are pure Catalyst `Column` expressions — they run
  * inside whole-stage codegen, shuffle nothing by themselves, and
  * scale linearly with the scan. Each has an exact SQL mirror (used by
  * the DuckDB oracle in `graft.queries.Pipeline`), so results are
  * engine-reproducible.
  */
object TextOps {

  /** Whitespace tokenization, lowercased. Mirror:
    * `string_split_regex(lower(text), '\s+')`.
    */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * other non-space chars each count as one token — a cheap, stable
    * proxy for subword-tokenizer cost used to budget training data.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Ratio of non [a-z0-9 space] chars (over lowercased text): the
    * char count remaining after stripping [a-z0-9 ], over total length.
    */
  def punctRatio(text: Column): Column =
    (length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double")
      / length(text)).cast("double")

  /** English-stopword token ratio. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    (size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
      / size(toks)).cast("double")
  }

  /** Composite quality score in [0,1]: length credit + cleanliness +
    * stopword-signal, the standard cheap pre-filter before expensive
    * model-based scoring. Deterministic; mirrored in SQL.
    */
  def qualityScore(text: Column): Column = {
    val toks = size(tokens(text)).cast("double")
    round(
      lit(0.4) * least(lit(1.0), toks / 50.0) +
        lit(0.3) * (lit(1.0) - punctRatio(text)) +
        lit(0.3) * least(lit(1.0), stopwordRatio(text) * 5.0),
      6)
  }

  /** Language profiles for the n-gram/stopword language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "de"))

  /** Stopword-profile language ID: count profile hits per language,
    * pick the max (ties broken in profile order), `und` if no hits.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    val m = greatest(scores.map(_._2): _*)
    // reverse fold → earliest profile's WHEN lands outermost → wins ties
    val chain = scores.reverse.foldLeft(lit("und")) {
      case (acc, (lang, s)) => when(s === m, lang).otherwise(acc)
    }
    when(m === 0, lit("und")).otherwise(chain)
  }

  /** Normalized full-content hash: whitespace runs collapsed, lowercased,
    * trimmed — the exact-dedup key.
    */
  def contentHash(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Word n-gram shingles (n consecutive tokens joined by one space).
    * Empty array when the document has fewer than n tokens.
    *
    * Native kernel ([[graft.functions.TextKernels]]): the equivalent
    * `transform(sequence, i -> concat_ws(element_at(w, i), ...))`
    * formulation re-evaluated the whole split+lower subtree once per
    * produced shingle (interpreted HOF lambdas do no subexpression
    * caching) — O(len²) per document and the dominant cost of every
    * dedup/decontamination pass. The kernel splits once per row.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextKernels.shinglesCol(text, n)

  /** Non-overlapping n-token segments (the fixture has no newlines, so
    * fixed token windows stand in for lines/paragraphs as the unit of
    * corpus-level segment dedup). Empty array under n tokens. Mirror:
    * `[array_to_string(ws[(i*n+1):(i*n+n)], ' ')
    *    for i in generate_series(0, len(ws)//n - 1)]`.
    * Native kernel — same rationale as [[shingles]].
    */
  def segments(text: Column, n: Int): Column =
    graft.functions.TextKernels.segmentsCol(text, n)

  /** Rolling-hash document fingerprint: (min, max) portable hash over
    * 3-gram shingles plus the normalized content hash. Near-identical
    * docs share min/max with high probability; exact dups share all 3.
    */
  def fingerprint(text: Column): Column = {
    val sh = shingles(text, 3)
    struct(
      contentHash(text).as("content"),
      array_min(transform(sh, s => Portable.h60(s))).as("min_h"),
      array_max(transform(sh, s => Portable.h60(s))).as("max_h"))
  }

  /** Content-defined chunking (p91): split `text` at every position
    * whose trailing `window`-char hash satisfies
    * `h60(window) % modulus == 0` — the LBFS-style window-hash CDC that
    * storage dedup uses. The property that matters (and that the spec
    * proves): because boundaries depend only on LOCAL content, two
    * payloads sharing a long suffix re-synchronize to IDENTICAL chunks
    * after at most one window-length of divergence, no matter how their
    * prefixes differ — fixed-size blocking can't do that. One static
    * call per row inside whole-stage codegen ([[graft.functions.Cdc]]
    * — same rationale as [[graft.functions.CharStats]]: a per-position
    * higher-order lambda runs interpreted ~len times per row); expected
    * chunk length = `modulus`.
    */
  def cdcChunks(text: Column, window: Int, modulus: Int): Column =
    graft.functions.Cdc.chunks(text, window, modulus)

  /** Overlapping token-window chunking for retrieval/RAG prep (p96):
    * windows of `window` tokens every `stride` tokens (overlap =
    * `window - stride`), as `array<struct<idx, toks>>`. Chunk count is
    * `1 + ceil(max(0, n - window) / stride)` — every token is covered,
    * the last chunk may be short, a doc shorter than one window still
    * yields exactly one chunk. Row-local (`transform` + `slice` inside
    * the scan); the explode downstream is the only row growth and is
    * bounded by `n / stride + 1` chunks per doc.
    */
  /** Obfuscation-resistant canonicalization for blocklist matching
    * (p100): lowercase → leet-substitute digits/symbols → strip
    * separator characters (including spaces, so "c a s i n o"
    * collapses) → collapse elongated letter runs ("spaaam" → "spam")
    * for each letter in `letters`. The SAME canonicalization must be
    * applied to the blocklist terms (see [[canonTerm]]) so both sides
    * live in the canonical space — that is what makes "fr33 m0n3y"
    * match "freemoney" even though the canonical form ("fremony") is
    * not a dictionary word.
    *
    * Per-letter run collapse (not a `(.)\1+` backreference) because
    * the DuckDB oracle's RE2 engine has no backreferences — the chain
    * is generated from one letter list on both engines so they cannot
    * drift. Entirely row-local; runs inside whole-stage codegen.
    */
  def normalizeObfuscated(text: Column, letters: Seq[Char]): Column = {
    val base = regexp_replace(
      translate(lower(text), leetFrom, leetTo), "[ ._*+!-]", "")
    letters.foldLeft(base)((e, c) => regexp_replace(e, s"$c$c+", c.toString))
  }

  /** Leet-speak substitution table shared with the oracle mirror. */
  val leetFrom = "0134578$@"
  val leetTo = "oieastbsa"

  /** A blocklist term's canonical form under the same run collapse. */
  def canonTerm(term: String, letters: Seq[Char]): String =
    letters.foldLeft(term.toLowerCase)((s, c) =>
      s.replaceAll(s"$c$c+", c.toString))

  def ragChunks(text: Column, window: Int, stride: Int): Column = {
    require(stride >= 1 && window >= stride,
      s"ragChunks requires 1 <= stride <= window, got window=$window stride=$stride")
    val ws = tokens(text)
    val lastIdx = ((greatest(size(ws) - lit(window), lit(0))
      + lit(stride - 1)) / lit(stride)).cast("int")
    transform(sequence(lit(0), lastIdx), i =>
      struct(i.cast("long").as("idx"),
        slice(ws, i * stride + 1, lit(window)).as("toks")))
  }
}

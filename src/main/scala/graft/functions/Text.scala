package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (all codegen'd built-ins — no UDFs).
  *
  * Re-expresses the reference's text handling (keyword splitting via a
  * Flink UDTF, gmall2024-realtime-master/realtime-dws/realtime-dws-
  * traffic-source-keyword-page-view-window/src/main/java/com/atguigu/
  * gmall/realtime/dws/function/KeywordUDTF.java:1) plus the
  * LLM-pipeline text operators (language ID, quality scoring, token
  * counting, fingerprinting) mandated by the brief.
  *
  * Every function here is a pure `Column` expression, so it runs
  * inside whole-stage codegen and scales linearly with input — no
  * shuffle, no driver involvement.
  */
object Text {

  /** Whitespace tokens, lowercased, empties dropped. */
  def wsTokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Regex subtokens: maximal [a-z0-9] runs — a cheap BPE-ish
    * pre-tokenization. Pattern kept to a POSIX-safe class so any SQL
    * oracle (Java regex vs RE2) agrees byte-for-byte.
    */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Character n-gram shingles over the lowercased text, distinct.
    * i ranges 1..len-n+1 (one short shingle when len < n) — mirrors
    * `[substr(lower(text), i, n) for i in range(1, greatest(len-n+2, 2))]`.
    */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(charShinglesAll(text, n))

  /** Positional character n-grams (NOT distinct, document order
    * preserved) — the input for window-based schemes like winnowing.
    */
  def charShinglesAll(text: Column, n: Int): Column = {
    val lo = lower(text)
    val hi = greatest(length(lo) - lit(n - 2), lit(2)) - lit(1)
    transform(sequence(lit(1), hi), i => substring(lo, i, lit(n)))
  }

  /** Polynomial rolling hash of a k-char gram: fold acc·31 + code
    * over the code points. For k ≤ 12 the value stays far below 2^63
    * (no ANSI overflow), and the fold is reproducible in any engine
    * with a left reduce — which is what lets a SQL oracle check a
    * rolling-hash scheme exactly.
    */
  def polyHash(gram: Column, k: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(k)),
        i => ascii(substring(gram, i, lit(1))).cast("long")),
      lit(0L), (acc, x) => acc * 31 + x)

  /** Prime modulus for [[polyHashMod]]: the largest prime below 2^53,
    * so acc·31 < 2^58 never overflows a 64-bit signed int — in Spark
    * OR in a SQL oracle whose BIGINT doesn't wrap (DuckDB raises on
    * overflow rather than wrapping, so the plain [[polyHash]] fold is
    * only cross-engine-reproducible for k ≤ 12).
    */
  val PolyHashP: Long = 9007199254740881L

  /** Mod-prime polynomial rolling hash for grams longer than
    * [[polyHash]]'s overflow-free range (k ≤ 12): fold
    * acc = (acc·31 + code) mod P. Same left-reduce shape, still
    * exactly reproducible in any engine with non-wrapping 64-bit
    * integer arithmetic.
    */
  def polyHashMod(gram: Column, k: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(k)),
        i => ascii(substring(gram, i, lit(1))).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % lit(PolyHashP))

  /** Word n-gram shingles (space-joined), distinct. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    val hi = greatest(size(toks) - lit(n - 2), lit(2)) - lit(1)
    array_distinct(transform(sequence(lit(1), hi),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Heuristic language ID: script/diacritic character classes first,
    * then an English-stopword fallback. Deterministic and
    * SQL-mirrorable (see SparkEntry.oracleSql("text_langid")).
    */
  def langId(text: Column): Column = {
    val t = lower(text)
    when(t.rlike("[一-鿿]"), "zh")
      .when(t.rlike("[぀-ヿ]"), "ja")
      .when(t.rlike("[Ѐ-ӿ]"), "ru")
      .when(t.rlike("[äöüß]"), "de")
      .when(t.rlike("[àâçèéêëîïôùû]"), "fr")
      .when(t.rlike("[áíñóú]"), "es")
      .when(t.rlike("(^| )(the|and|of|to|a|is)( |$)"), "en")
      .otherwise("und")
  }

  /** Search-keyword segmentation, CJK-aware: Han runs are split into
    * overlapping character bigrams (the standard analyzer fallback
    * when no dictionary segmenter like IK is available — reference
    * KeywordUtil.java:1 uses IK), everything else splits on
    * whitespace. Pure column expressions: the Han runs are isolated
    * with regexp_replace padding, then bigrammed per token.
    */
  def segmentKeywords(text: Column): Column = {
    // put spaces around every Han char, then whitespace-split; a Han
    // run of length n becomes n single chars → bigram adjacent pairs
    val spaced = regexp_replace(lower(text), "([一-鿿])", " $1 ")
    val toks = filter(split(spaced, "\\s+"), t => t =!= "")
    // adjacent-pair bigrams over single-Han tokens; keep non-Han as-is.
    // Guarded so i+1 never exceeds size(toks): with <2 tokens there are
    // no bigrams (element_at past the end throws under ANSI mode).
    val n = size(toks)
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => when(
          element_at(toks, i).rlike("^[一-鿿]$") &&
            element_at(toks, i + 1).rlike("^[一-鿿]$"),
          concat(element_at(toks, i), element_at(toks, i + 1)))
          .otherwise(null)))
      .otherwise(array().cast("array<string>"))
    val singles = filter(toks, t => !t.rlike("^[一-鿿]$"))
    concat(singles, filter(bigrams, b => b.isNotNull))
  }

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "is", "in", "that", "it", "for")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(wsTokens(text)).cast("long")

  /** Quality signals: char count, token count, mean token length,
    * stopword ratio, alpha ratio, and a fixed linear quality score.
    * All divisions are double-typed and single-op, so a SQL oracle
    * reproduces them bit-for-bit.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = wsTokens(text)
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    // null-guarded denominators: a zero-token / zero-char doc yields
    // NULL ratios (matching SQL NULLIF semantics), never NaN
    val nToksNz = nullif(nToks, lit(0.0))
    val nCharsNz = nullif(nChars, lit(0.0))
    val meanLen = aggregate(transform(toks, t => length(t)), lit(0L),
      (acc, x) => acc + x).cast("double") / nToksNz
    val stopCt = size(filter(toks,
      t => t.isin(stopwords: _*))).cast("double")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    Seq(
      nChars.cast("long").as("n_chars_calc"),
      nToks.cast("long").as("n_tokens"),
      meanLen.as("mean_token_len"),
      (stopCt / nToksNz).as("stopword_ratio"),
      (alpha / nCharsNz).as("alpha_ratio"),
      qualityScore(text).as("quality_score"))
  }

  /** The scalar quality score alone (same formula as the last column
    * of [[qualityColumns]]).
    */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text)
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val stopCt = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    // NULLIF-guarded: degenerate docs score NULL (= oracle), not NaN
    stopCt / nullif(nToks, lit(0.0)) * lit(0.3) +
      alpha / nullif(nChars, lit(0.0)) * lit(0.4) +
      least(nToks / lit(100.0), lit(1.0)) * lit(0.3)
  }

  /** Key-collision fingerprint (OpenRefine-style): digest of the
    * sorted distinct whitespace tokens. Two docs differing only in
    * word order / duplication collide.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(wsTokens(text)))))

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe =
    "(\\+?\\d{1,3}[-. ]?)?(\\(\\d{3}\\)|\\d{3})[-. ]?\\d{3}[-. ]?\\d{4}"
  private val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII redaction for corpus cleaning: emails, phone numbers and
    * IPv4 addresses are replaced with typed placeholder tokens. Pure
    * regexp_replace chain — codegen'd, zero shuffle, linear scan; the
    * standard pre-training scrub pass.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-class PII match counts (for filtering / reporting). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(emailRe)).cast("long").as("email_ct"),
    regexp_count(text, lit(phoneRe)).cast("long").as("phone_ct"),
    regexp_count(text, lit(ipv4Re)).cast("long").as("ip_ct"))
}

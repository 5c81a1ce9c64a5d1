package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline operators (SURVEY.md §2C).
  *
  * Everything here is a pure Column-expression rewrite (no UDFs) so it stays
  * inside whole-stage codegen and scales linearly with no shuffle; the only
  * shuffles in the pipelines built on top (Dedup, TextAnalysis queries) are
  * the explicit groupBys/joins those pipelines declare.
  *
  * Determinism contract: token hashing is defined as the first 15 hex chars
  * of md5, parsed base-16 (60-bit positive value). md5 is available and
  * bit-identical in every engine (Spark, DuckDB, Python), which makes every
  * hash-derived result here reproducible by the driver's DuckDB oracle —
  * unlike Spark's Murmur3 `hash()`, whose seed/impl is engine-private.
  */
object Text {

  /** Mersenne prime 2^31-1; modulus for minhash permutations and the
    * rolling fingerprint. Products stay well under 2^63. */
  val P: Long = 2147483647L

  /** Whitespace tokenization. The testdata's `documents.text` is
    * space-separated (FIXTURES.md). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic, engine-portable 60-bit token hash (see object doc). */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** Positional sliding n-gram windows as strings ("w1 w2 w3"), one per
    * position, NOT deduplicated; empty when the doc has fewer than n
    * tokens. The single source of the window convention — every
    * shingle/span form below derives from it. */
  private def windows(toks: Column, n: Int): Column = {
    val made = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => array_join(slice(toks, i, lit(n)), " "))
    when(size(toks) >= n, made).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles, distinct, as strings ("w1 w2 w3").
    * Empty result when the doc has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(windows(toks, n))

  /** Distinct shingle hashes — the set representation used by minhash and
    * the exact jaccard join. Codegen'd single-pass kernel
    * ([[graft.plans.TextExpressions.ShingleHashesExpr]]); the HOF form below
    * is kept as the interpreted reference implementation. */
  def shingleHashes(text: Column, n: Int): Column =
    graft.plans.TextExpressions.shingleHashes(tokens(text), n)

  /** Interpreted HOF form of [[shingleHashes]] — identical hash values
    * (may carry duplicates on 60-bit collisions; callers array_distinct). */
  def shingleHashesHof(text: Column, n: Int): Column =
    transform(shingles(tokens(text), n), tokenHash(_))

  /** POSITIONAL span hashes — one 60-bit hash per n-gram position, NOT
    * deduplicated (the span-duplication stats need multiplicity). Codegen'd
    * ([[graft.plans.TextExpressions.SpanHashesExpr]]). */
  def spanHashes(text: Column, n: Int): Column =
    graft.plans.TextExpressions.spanHashes(tokens(text), n)

  /** Interpreted HOF reference form of [[spanHashes]]. */
  def spanHashesHof(text: Column, n: Int): Column =
    transform(windows(tokens(text), n), tokenHash(_))

  /** Positional (non-distinct) word n-grams as STRINGS — for corpus-level
    * n-gram statistics where the surface form is the output (collocation
    * mining); [[spanHashes]] is the hash form for joins/shuffles. */
  def spanStrings(text: Column, n: Int): Column =
    windows(tokens(text), n)

  /** Rolling document fingerprint: order-sensitive polynomial hash
    * sum_i (h_i mod P) * ((i mod 64)+1) mod P, all mod P. Reproducible in
    * ANSI SQL (DuckDB oracle unnests with subscripts). Two docs with the
    * same tokens in different order fingerprint differently. */
  def fingerprint(toks: Column): Column =
    pmod(
      aggregate(
        transform(toks, (t, i) => pmod(pmod(tokenHash(t), lit(P)) * (pmod(i, lit(64)) + 1), lit(P))),
        lit(0L), (acc, x) => acc + x),
      lit(P))

  /** Repetition ratio: fraction of duplicated word n-grams,
    * `1 - distinct_ngrams / total_ngrams` (0 = no repetition). The standard
    * C4/Gopher-style repetitiveness signal for corpus filtering. Null-safe:
    * documents shorter than n tokens yield null. */
  def repetitionRatio(toks: Column, n: Int): Column = {
    val total = (size(toks) - (n - 1)).cast("double")
    val made = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => array_join(slice(toks, i, lit(n)), " "))
    val distinctN = size(array_distinct(made)).cast("double")
    when(total > 0, lit(1.0) - distinctN / total)
  }

  /** Stopword lists for the n-gram/stopword language-ID heuristic. Tiny and
    * fixed so the oracle can embed the same lists. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val stopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un", "es")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID heuristic: CJK codepoints → zh; else the richer stopword
    * list wins; ties/none → unknown ("und"). Deterministic; the oracle
    * replicates the same rules. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = countIn(toks, stopwordsEn)
    val es = countIn(toks, stopwordsEs)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(en > es && en > 0, lit("en"))
      .when(es > en && es > 0, lit("es"))
      .otherwise(lit("und"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, digits, or single punctuation,
    * via regexp_count — a cheap proxy for tokenizer cost accounting. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** PII scrub: email-shaped substrings then digit runs replaced with typed
    * placeholder tokens — the redaction stage of a training-data pipeline.
    * Pure `regexp_replace` (codegen'd, linear, no shuffle). Patterns are
    * restricted to syntax whose greedy/leftmost semantics are identical in
    * Java regex (Spark) and RE2 (DuckDB's 'g' mode), so the oracle
    * reproduces byte-identical output. Emails first: the email pattern
    * contains digits the number pass would otherwise eat. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
      lit("[0-9]+"), lit("<NUM>"))

  /** Quality-score blend. Left unrounded: the expression tree is identical
    * IEEE double arithmetic in every engine (bit-reproducible), whereas
    * round() implementations differ at the half-ulp between engines. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val stopRatio = countIn(toks, stopwordsEn).cast("double") / n
    val meanLen = aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / n
    distinctRatio * 0.5 + stopRatio * 0.2 + least(meanLen / 10.0, lit(1.0)) * 0.3
  }

  /** [[qualityScore]] scaled to integer nanos with NO doubles anywhere —
    * the form safe to feed cross-engine aggregates ([[graft.operators
    * .Pipeline.sourceReputation]]). The blend is a rational in per-doc
    * integer counts (d distinct tokens, s stopwords, L total chars,
    * n tokens):
    *
    *   score = d/n·0.5 + s/n·0.2 + min(L/(10n), 1)·0.3
    *         = (50·d + 20·s + 3·min(L, 10n)) / (100·n)
    *
    * so round-half-up nanos are `(num·10⁹ + den/2) div den` in pure BIGINT
    * arithmetic (num ≤ 100n ⇒ num·10⁹ ≤ 10¹¹·n — no overflow for any
    * realistic document). Unlike `round(score·10⁹)` on an IEEE double —
    * whose half-ulp behavior differs between Spark's BigDecimal.valueOf
    * (shortest-decimal) rounding and C-family engines rounding the binary
    * double — this is integer-exact, so every engine produces the same
    * long bit-for-bit. Agrees with the double form except within ~1e-7
    * nanos of a .5 boundary (equality on the testdata is unit-asserted). */
  def qualityScoreNano(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val d = size(array_distinct(toks)).cast("long")
    val s = countIn(toks, stopwordsEn).cast("long")
    val chars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val num = lit(50L) * d + lit(20L) * s + lit(3L) * least(chars, lit(10L) * n)
    call_function("div", num * lit(1000000000L) + lit(50L) * n, lit(100L) * n)
  }
}

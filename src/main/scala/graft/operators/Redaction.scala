package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction + URL canonicalization ([EXT]) — the scrub/normalize pass a
  * web-scale training corpus runs before anything else sees the text.
  *
  * All pure `Column => Column` builders over codegen'd built-ins
  * (`regexp_replace` / `regexp_extract_all` / `parse_url`): narrow,
  * shuffle-free, scan-fused at 100 TB. Patterns deliberately stay inside
  * the Java-regex ∩ RE2 common subset (no lookaround, no backreferences)
  * so every one of them cross-engine oracles byte-identically — and so the
  * same pattern set can be reused by a non-JVM scrubber.
  *
  * Redaction ORDER is part of the contract: emails → IPv4 → phones. The
  * phone pattern (digits with separators) would otherwise swallow dotted
  * IPv4 quads, and an email's digits are protected by redacting emails
  * first.
  */
object Redaction {

  /** user@host.tld — the pragmatic corpus-scrubbing shape, not RFC 5322. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Dotted IPv4 quad (word-bounded; \b is ASCII in both engines). */
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Phone-ish digit run: 8+ chars of digits/separators, digit-terminated,
    * optional leading +. Matches international and US formats; by design
    * it also matches other long digit runs (credit-card-ish) — over-
    * redaction is the safe failure mode for training data.
    */
  val PhonePattern = "\\+?[0-9][0-9()\\s.-]{6,}[0-9]"

  /** Replace emails, IPv4s, then phone-ish runs with typed tokens. */
  def redactPii(
      c: Column,
      emailToken: String = "<EMAIL>",
      ipToken: String = "<IP>",
      phoneToken: String = "<PHONE>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, emailToken),
        Ipv4Pattern, ipToken),
      PhonePattern, phoneToken)

  /** Per-document PII hit counts (the audit/quality-signal side of the
    * scrub). Counts are independent per pattern over the RAW text, so an
    * IPv4 also counts as a phone-ish run — consumers gating on "any PII"
    * should sum; the redaction itself is order-protected.
    */
  def piiCounts(c: Column): (Column, Column, Column) = (
    size(regexp_extract_all(c, lit(EmailPattern), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit(PhonePattern), lit(0))).cast("long"))

  // ------------------------------------------------------------------
  // URL canonicalization
  // ------------------------------------------------------------------

  /** Lowercased host of a URL (`parse_url` is codegen'd in Spark 4). */
  def urlHost(c: Column): Column = lower(parse_url(c, lit("HOST")))

  /** Path component ("" when absent — parse_url returns "" not null). */
  def urlPath(c: Column): Column = parse_url(c, lit("PATH"))

  /** Query string (null when absent). */
  def urlQuery(c: Column): Column = parse_url(c, lit("QUERY"))

  /** Canonical dedup key for URL-level dedup: lowercased host with one
    * leading "www." stripped, plus the path with any trailing slash
    * trimmed — scheme, query, and fragment dropped (the standard
    * crawl-dedup normalization: http/https and tracking params must not
    * split a page into two "documents").
    */
  def canonicalUrl(c: Column): Column =
    concat(
      regexp_replace(urlHost(c), "^www\\.", ""),
      regexp_replace(urlPath(c), "/$", ""))

  // ------------------------------------------------------------------
  // Token-blocklist screening
  // ------------------------------------------------------------------

  /** Per-document blocklist screen ([EXT]): how many tokens hit a
    * blocklist, the hit fraction, and the drop decision — the
    * "bad-words filter" stage of a corpus-curation pipeline.
    *
    * The blocklist rides in the plan as a [[graft.plans.MapSumScore]]
    * table (every entry valued 1.0, default 0.0), so the count is one
    * codegen pass with an O(1) hash probe per token — no join, no
    * shuffle, no per-row set broadcast; the whole screen is a narrow
    * map stage. Blocklist entries are lowercased to match the
    * tokenizer; empty entries are dropped (the serialized table's empty
    * key is the out-of-vocabulary default slot — a stray blank line in a
    * blocklist file must not flag every unknown token). Documents with
    * no tokens score 0.0 and are kept; documents with NULL text are NOT
    * in the output at all (same contract as the other text operators) —
    * callers gating a corpus by inner-joining the screen must union
    * null-text rows back explicitly if they want to keep them.
    *
    * Returns (idCol, n_flagged, n_tokens, flag_frac,
    * blocked = flag_frac > maxFrac).
    */
  def blocklistScreen(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blocklist: Seq[String],
      maxFrac: Double = 0.1): DataFrame = {
    val entries = blocklist.map(_.toLowerCase).filter(_.nonEmpty).distinct
    require(entries.nonEmpty, "blocklist must have a non-empty entry")
    // the screen matches TOKENS ([a-z0-9]+ runs): an entry with any other
    // character ("covid-19", "mail.ru", a multi-word phrase) can never
    // equal a token and would silently screen nothing — fail fast instead
    val dead = entries.filterNot(_.matches("[a-z0-9]+"))
    require(dead.isEmpty,
      s"blocklist entries can never match a token (tokens are [a-z0-9]+ " +
        s"runs): ${dead.take(5).mkString(", ")} — split phrases into " +
        "single tokens or strip punctuation to match the tokenizer")
    require(entries.size <= 1000000,
      s"blocklist rides in the plan; ${entries.size} entries exceeds the " +
        "1M literal bound — load larger lists as a table and Bloom-join")
    require(maxFrac >= 0.0, s"maxFrac must be >= 0, got $maxFrac")
    graft.plans.GraftFunctions.register(df.sparkSession)
    val table = graft.plans.ScoreTable.serialize(
      entries.map(_ -> 1.0), default = 0.0)
    val toks = TextAnalysis.tokens(col(textCol))
    val nFlagged =
      call_function("graft_map_sum", toks, lit(table)).cast("long")
    val nTokens = size(toks).cast("long")
    Similarity.spreadIfNarrow(df.filter(col(textCol).isNotNull))
      .select(col(idCol), nFlagged.as("n_flagged"), nTokens.as("n_tokens"))
      .withColumn("flag_frac",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_flagged").cast("double") / col("n_tokens")))
      .withColumn("blocked", col("flag_frac") > maxFrac)
  }
}

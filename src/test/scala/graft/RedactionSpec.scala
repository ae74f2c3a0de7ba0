package graft

import org.apache.spark.sql.functions._

import graft.operators.Redaction

/** PII redaction + URL canonicalization goldens on inputs the synthesized
  * oracle tails can't exercise: interleaved PII, the IP-before-phone
  * ordering hazard, absent URL components.
  */
class RedactionSpec extends SparkSpec {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String = {
    val r = Seq(input).toDF("s").select(c).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("redacts emails, IPs, and phones with typed tokens") {
    assert(one(Redaction.redactPii(col("s")),
      "mail a.b+c@x-y.org, call +1 (555) 123-4567, host 192.168.0.1 end") ===
      "mail <EMAIL>, call <PHONE>, host <IP> end")
  }

  test("order contract: dotted IPv4 is <IP>, never swallowed as a phone") {
    assert(one(Redaction.redactPii(col("s")), "ping 10.20.30.40 now") ===
      "ping <IP> now")
    // but a long digit run with separators IS a phone-ish match
    assert(one(Redaction.redactPii(col("s")), "card 1234 5678 9012") ===
      "card <PHONE>")
  }

  test("email digits are protected by redacting emails first") {
    assert(one(Redaction.redactPii(col("s")), "x 12345678@q.io y") ===
      "x <EMAIL> y")
  }

  test("piiCounts counts each pattern independently over raw text") {
    val (ne, ni, np) = Redaction.piiCounts(col("s"))
    val r = Seq("a@b.co c@d.org 1.2.3.4 and (030) 1234-567")
      .toDF("s").select(ne.as("e"), ni.as("i"), np.as("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 1L)))
  }

  test("canonicalUrl strips scheme, www, query, fragment, trailing slash") {
    val c = Redaction.canonicalUrl(col("s"))
    assert(one(c, "https://www.Ex.COM/A/b/?q=1#frag") === "ex.com/A/b")
    assert(one(c, "http://ex.com/A/b") === "ex.com/A/b")
    // only ONE leading www. strips (www.www.x is a real, distinct host)
    assert(one(c, "https://www.www.x.org/p") === "www.x.org/p")
    // bare host: empty path
    assert(one(c, "https://ex.com") === "ex.com")
  }

  test("urlQuery is null when absent; urlPath empty for bare hosts") {
    assert(one(Redaction.urlQuery(col("s")), "https://ex.com/p") === null)
    assert(one(Redaction.urlQuery(col("s")), "https://ex.com/p?a=1") === "a=1")
    assert(one(Redaction.urlPath(col("s")), "https://ex.com") === "")
  }

  test("blocklistScreen counts, fractions, and gates; empty-token docs kept") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "bad word bad apple"),          // 2/4 flagged -> blocked at 0.25
      (2L, "all clean text here"),         // 0/4
      (3L, "BAD punctuation!!!"),          // case-folded match: 1/2
      (4L, "...")                          // tokenless: kept, frac 0
    ).toDF("doc_id", "text")
    val out = Redaction.blocklistScreen(df, "text", "doc_id",
        Seq("bad", "Evil"), maxFrac = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((2L, 4L, 0.5, true)))
    // an entry that can never equal a token ([a-z0-9]+ runs) must fail
    // fast, not silently screen nothing
    val e = intercept[IllegalArgumentException] {
      Redaction.blocklistScreen(df, "text", "doc_id",
        Seq("bad", "covid-19"), maxFrac = 0.25)
    }
    assert(e.getMessage.contains("covid-19"))
    assert(out(2L) === ((0L, 4L, 0.0, false)))
    assert(out(3L) === ((1L, 2L, 0.5, true)))
    assert(out(4L) === ((0L, 0L, 0.0, false)))
  }

  test("blocklistScreen is a narrow map: no exchange beyond the spread") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text").repartition(4)
    val p = Redaction.blocklistScreen(df, "text", "doc_id", Seq("a"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("an empty blocklist entry is dropped, not treated as the OOV default") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "clean words only")).toDF("doc_id", "text")
    // a stray blank line in a blocklist file must not flag every token
    val out = Redaction.blocklistScreen(df, "text", "doc_id",
      Seq("bad", "")).head()
    assert(out.getLong(1) === 0L && !out.getBoolean(4))
    intercept[IllegalArgumentException] {
      Redaction.blocklistScreen(df, "text", "doc_id", Seq("", ""))
    }
  }
}

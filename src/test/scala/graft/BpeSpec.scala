package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Learned-BPE tokenizer: training goldens (the Sennrich 2016 corpus,
  * hand-derived under our deterministic tie-break), encode goldens, the
  * lossless invariant, and the eval/codegen parity of the expression.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the BPE paper's worked corpus: low×5 lower×2 newest×6 widest×3
  private lazy val paperCorpus =
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")

  test("fitMerges learns the paper corpus merges in deterministic order") {
    val merges = Bpe.fitMerges(paperCorpus, "text", numMerges = 5)
    // pair counts by hand: (e,s)=9 (s,t)=9 → lexicographic tie-break picks
    // (e,s); then (es,t)=9; then (l,o)=(o,w)=7 → (l,o); then (lo,w)=7;
    // then (e,w)/(n,e)/(w,est)=6 → (e,w).
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encode applies merges by rank: the classic lowest → low+est") {
    val merges = Bpe.fitMerges(paperCorpus, "text", numMerges = 5)
    val got = Bpe.tokenize(Seq("lowest").toDF("text"), "text", merges)
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(got === Seq("low", "est"))
  }

  test("encode merges all occurrences of a pair left-to-right, non-overlapping") {
    // single merge (a,a): "aaaa" → [aa, aa]; "aaaaa" → [aa, aa, a]
    val merges = Seq(("a", "a"))
    val got = Bpe.tokenize(Seq("aaaa", "aaaaa").toDF("text"), "text", merges)
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("aa", "aa"))
    assert(got(1) === Seq("aa", "aa", "a"))
  }

  test("merges never cross word boundaries; pre-tokenization matches tokensBpeish") {
    val merges = Seq(("a", "b"))
    // "a b" are separate words — no merge; "ab" inside one word — merged;
    // punctuation splits words like the regex does
    val got = Bpe.tokenize(Seq("a b ab a-b AB!").toDF("text"), "text", merges)
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(got === Seq("a", "b", "ab", "a", "-", "b", "ab", "!"))
  }

  test("lossless invariant: joined tokens reconstruct the joined word pieces") {
    val docs = Seq(
      "The quick brown fox, 42 times!",
      "  ",
      "mixed CASE text-with punctuation... and 123 digits").toDF("text")
    val merges = Bpe.fitMerges(docs, "text", numMerges = 30, minPairFreq = 1L)
    val both = Bpe.tokenize(docs, "text", merges).select(
      concat_ws("", col("bpe_tokens")).as("joined"),
      concat_ws("",
        graft.operators.TextAnalysis.tokensBpeish(col("text"))).as("expected"))
    assert(both.filter(col("joined") =!= col("expected")).count() === 0L)
  }

  test("null text encodes to null; empty text to an empty array") {
    val df = Seq(Option("x"), None, Option("")).toDF("text")
    val got = Bpe.tokenize(df, "text", Seq(("a", "b")))
      .select(col("bpe_tokens")).collect()
    assert(got(0).getSeq[String](0) === Seq("x"))
    assert(got(1).isNullAt(0))
    assert(got(2).getSeq[String](0) === Seq.empty[String])
  }

  test("interpreted eval matches codegen output") {
    val merges = Bpe.fitMerges(paperCorpus, "text", numMerges = 5)
    val expr = graft.plans.BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create("lowest widest",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Bpe.serializeMerges(merges), org.apache.spark.sql.types.StringType))
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    // the DataFrame path goes through whole-stage codegen
    val codegen = Bpe.tokenize(Seq("lowest widest").toDF("text"), "text", merges)
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(interpreted === Seq("low", "est", "w", "i", "d", "est"))
    assert(codegen === interpreted)
  }

  test("fitMerges stops early when no pair clears minPairFreq") {
    // every word distinct, so every pair count is 1 < default minPairFreq=2
    val merges = Bpe.fitMerges(Seq("ab", "cd", "ef").toDF("text"), "text", 10)
    assert(merges.isEmpty)
  }
}

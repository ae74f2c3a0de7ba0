package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** BM25 retrieval: hand-computed scores on a tiny corpus, top-k/rank
  * contract, and literal-scoring parity with the distributed path.
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "c"),
    (4L, "")).toDF("doc_id", "text")

  test("single-term score matches the Okapi formula computed by hand") {
    val q = Seq((1L, "a")).toDF("query_id", "qtext")
    val rows = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext",
      k = 10).collect()
    // N=4 docs, dl = 3,2,1,0 → avgdl = 1.5; only doc 1 contains 'a'
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L && r.getLong(3) === 1L)
    val idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))
    val expected = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 1.5))
    assert(math.abs(r.getDouble(2) -
      BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("k caps results per query; ranks are 1..k ordered by score then id") {
    val q = Seq((1L, "b c"), (2L, "zzz")).toDF("query_id", "qtext")
    val out = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext",
      k = 2).collect().sortBy(r => (r.getLong(0), r.getLong(3)))
    // query 2 matches nothing; query 1 matches docs 1,2,3 but k=2
    assert(out.forall(_.getLong(0) === 1L))
    assert(out.length === 2)
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 2L))
    val scores = out.map(_.getDouble(2))
    assert(scores(0) >= scores(1))
    // doc 2 has both b and c → must rank first
    assert(out(0).getLong(1) === 2L)
  }

  test("duplicate query terms count once") {
    val q1 = Seq((1L, "c")).toDF("query_id", "qtext")
    val q2 = Seq((1L, "c c c")).toDF("query_id", "qtext")
    val a = Bm25.topK(corpus, "doc_id", "text", q1, "query_id", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val b = Bm25.topK(corpus, "doc_id", "text", q2, "query_id", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(a === b)
  }

  test("oversized query frames fail fast; empty literal term set scores 0") {
    val hugeQueries = spark.range(200001)
      .select(col("id").as("query_id"), lit("spark").as("qtext"))
    val e = intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", hugeQueries,
        "query_id", "qtext", k = 3)
    }
    assert(e.getMessage.contains("BM25 query set"))
    val z = corpus.select(Bm25.scoreLiteral(
      graft.operators.TextAnalysis.tokens(col("text")),
      Seq.empty, Map.empty, nDocs = 4L, avgdl = 1.5).as("s"))
      .collect().map(_.getDouble(0))
    assert(z.forall(_ === 0.0))
  }

  test("scoreLiteral parity with the distributed path") {
    // fit the corpus stats by hand: df over {b, c}, N=4, avgdl=1.5
    val dfm = Map("b" -> 2L, "c" -> 2L)
    val lit = corpus
      .select(col("doc_id"),
        Bm25.scoreLiteral(
          graft.operators.TextAnalysis.tokens(col("text")),
          Seq("b", "c"), dfm, nDocs = 4L, avgdl = 1.5).as("bm25"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val q = Seq((1L, "b c")).toDF("query_id", "qtext")
    val dist = Bm25.topK(corpus, "doc_id", "text", q, "query_id", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    dist.foreach { case (id, s) =>
      assert(math.abs(lit(id) - s) < 1e-9, s"doc $id: literal=${lit(id)} dist=$s")
    }
  }
}

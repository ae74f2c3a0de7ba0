package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion ([EXT]): combine per-query rankings from several
  * retrievers (lexical BM25, embedding KNN, ...) into one hybrid ranking —
  * the standard fusion step of a hard-negative-mining / RAG-corpus
  * pipeline (Cormack, Clarke & Büttcher 2009: score(d) = Σ_r 1/(k + rank_r(d)),
  * k = 60).
  *
  * Scale design: each input ranking is already top-k per query, so every
  * frame here is O(queries × k) — microscopic next to the corpus scans the
  * upstream retrievers (Bm25.topK, Similarity.knnBruteForce/annLsh) ran to
  * produce it. The fusion is one union + one (query, doc) aggregation +
  * one per-query window; the exchange moves only candidate rows. Nothing
  * in this operator touches the corpus.
  *
  * Cross-engine determinism: each contribution `1.0 / (k + rank)` is a
  * single IEEE division of exact integers, identical in any engine; with
  * two retrievers the sum is one commutative addition (bit-exact
  * regardless of aggregation order). For 3+ retrievers the sum's order
  * matters at the last ulp, so the fused score is rounded (6 decimals)
  * BEFORE the final rank, and ties break by ascending doc id — the same
  * pre-rounded-rank contract as Bm25.topK.
  */
object Rrf {

  /** Fuse per-query rankings. Each frame in `rankings` must carry
    * `(queryIdCol, docIdCol, rankCol)` with ranks 1..k (duplicates within
    * one frame are a caller bug — ranks are positional). Returns one row
    * per (query, doc) candidate that any retriever surfaced, ranked by
    * fused score:
    * `(queryIdCol, docIdCol, rrf = round(Σ 1/(kRrf + rank), 6),
    *   n_lists = #retrievers that returned the doc, rank)` for ranks
    * 1..topK.
    */
  def fuse(
      rankings: Seq[DataFrame],
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      topK: Int,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(topK > 0, s"topK must be positive, got $topK")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    val slim = rankings.map(_.select(
      col(queryIdCol), col(docIdCol), col(rankCol).cast("long").as("__r")))
    val all = slim.reduce(_ unionByName _)
    val fused = all
      .groupBy(col(queryIdCol), col(docIdCol))
      .agg(
        round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("__r"))), 6)
          .as("rrf"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf").desc, col(docIdCol))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}

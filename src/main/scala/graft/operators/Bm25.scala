package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval ([EXT]): score a bounded query set against the
  * corpus and keep the top-k documents per query — the lexical-retrieval
  * step a training-data pipeline runs for eval-set mining, hard-negative
  * sampling, and RAG corpus construction.
  *
  * Scale design (100 TB corpus, bounded query set):
  *  - the query-term set is tiny by contract and BROADCAST; the exploded
  *    (doc, token) stream is semi-joined against it IN-TASK, before the tf
  *    group-by, so tokens matching no query are dropped while the plan is
  *    still narrow — the only hash exchange in the whole job carries
  *    query-matching (doc, term) pairs, never the full token stream
  *    (doc length is a per-row value and survives the filter);
  *  - document frequencies are computed from the already-filtered stream
  *    (df is only needed for query terms), so the idf join is another
  *    broadcast, never a corpus-wide exchange;
  *  - corpus scalars (N, avgdl) ride in as a broadcast cross join of a
  *    1-row aggregate, the same pattern as `q_tfidf_top_term`;
  *  - top-k per query is a rank over a per-query window — the number of
  *    window partitions equals the query count, so the final exchange
  *    moves only (query, doc, score) rows that matched a query term.
  *
  * Scores are rounded to 4 decimals BEFORE ranking and tie-broken by
  * doc_id so the result is engine-reproducible (the summation order of
  * per-term contributions differs across engines).
  */
object Bm25 {

  /** Okapi BM25 top-k. `queries` must be a small frame (query id column +
    * query text column); duplicate terms within one query count once.
    * Returns (queryIdCol, docIdCol, bm25, rank) for ranks 1..k.
    */
  def topK(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // the query side is broadcast twice (term join + df join) — fail fast
    // on an oversized query frame instead of OOMing the driver late (the
    // decontaminate eval-side contract)
    Similarity.requireBroadcastable(queries, 100000L, "BM25 query set",
      "batched topK calls over query slices")
    val toks = TextAnalysis.tokens(col(textCol))

    // Bounded query-term set: explode, dedup within query, broadcast.
    val qterms = queries.select(
      col(queryIdCol).as("__q"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol))))
        .as("__tok"))

    // One pass over the corpus: per-doc term frequencies + doc length.
    // dl rides along in the tf group-by key frame via a first() agg to
    // avoid a second corpus scan / self-join. Spread first: a single-file
    // corpus scan would tokenize everything in one task before the
    // explode's shuffle fans out.
    //
    // The token array is MATERIALIZED in its own projection before the
    // explode. Putting `size(toks)` and `explode(toks)` in one select
    // plants two copies of the tokenize tree, and the projection carrying
    // `size` lands ABOVE the generator — re-running the full regex
    // tokenize once per OUTPUT TOKEN, not per document (profiled: the
    // scoring stage burned 26 s CPU at sf0.1, ~17 µs/token; 4 s after
    // this split). With `__toks` referenced twice from a lower
    // projection, CollapseProject keeps the non-cheap alias
    // unduplicated, so the regex runs once per doc and `size` reads the
    // materialized array.
    // null-text rows are NOT documents for scoring purposes: they can
    // never match a term, and counting them in N while avgdl skipped
    // them (avg ignores null sizes) made the two corpus scalars describe
    // DIFFERENT populations — idf inflated as if non-matching docs
    // existed (review finding). One consistent population for both.
    val spread = Similarity.spreadIfNarrow(
      docs.filter(col(textCol).isNotNull))
    val pairs = spread
      .select(col(docIdCol).as("__doc"), toks.as("__toks"))
      .select(col("__doc"),
        size(col("__toks")).cast("long").as("__dl"),
        explode(col("__toks")).as("__tok"))

    // Prune the exploded stream to query tokens while the plan is still
    // narrow: a broadcast LEFT SEMI join runs inside the scan task, so
    // non-matching tokens die before the tf group-by's exchange. Without
    // this, the group-by would shuffle every (doc, token) pair in the
    // corpus to aggregate tf counts that the query join then discards.
    val qtokSet = qterms.select(col("__tok")).distinct()
    val tf = pairs
      .join(broadcast(qtokSet), Seq("__tok"), "left_semi")
      .groupBy(col("__doc"), col("__tok"))
      .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))

    // Corpus scalars as a broadcast 1-row frame (N docs, average length).
    // avgdl is rounded to 6 decimals so the one scalar that feeds every
    // contribution is bit-identical across engines (summation order of
    // the avg differs); at 6 decimals the score impact is far below the
    // 4-decimal rounding of the final score.
    val stats = spread.agg(
      count(lit(1)).as("__n"),
      round(avg(size(toks)), 6).as("__avgdl"))

    // Persist the query-pruned tf frame: df and the scoring both read it,
    // and without the cache Catalyst re-derives the corpus
    // tokenize+aggregate subtree for the df branch — a second full-corpus
    // pass. `tf` is O(matching doc-terms), tiny relative to the corpus,
    // and is persisted BEFORE the query-id fan-out so (a) the cached rows
    // are not multiplied per matching query and (b) df needs no
    // distinct — tf is already unique per (doc, term), so one count per
    // term IS the document frequency (the previous post-fan-out shape
    // paid an extra dedup exchange). Cache lifecycle: stays persisted
    // after return (result is lazy); long-running sessions should
    // clearCache between workloads, same contract as Dedup/Curation.
    val tfCached = tf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tfCached.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))

    val contrib = tfCached
      .join(broadcast(qterms), "__tok")
      .join(broadcast(dfreq), "__tok")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__c",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("__dl") / col("__avgdl"))))

    val scored = contrib
      .groupBy(col("__q"), col("__doc"))
      .agg(round(sum(col("__c")), 4).as("bm25"))

    val w = Window.partitionBy(col("__q"))
      .orderBy(col("bm25").desc, col("__doc"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__q").as(queryIdCol), col("__doc").as(docIdCol),
        col("bm25"), col("rank"))
  }

  /** Scoring column for one literal query against precomputed corpus
    * literals — the narrow form for when the model (df map, N, avgdl) has
    * already been fit: a single codegen'd fold over the token array, no
    * joins. Useful for streaming scoring; the batch path above is the
    * retrieval form.
    */
  def scoreLiteral(
      toks: Column,
      queryTerms: Seq[String],
      dfByTerm: Map[String, Long],
      nDocs: Long,
      avgdl: Double,
      k1: Double = 1.2,
      b: Double = 0.75): Column = {
    require(nDocs > 0 && avgdl > 0, "corpus stats must be positive")
    val dl = size(toks).cast("double")
    val terms = queryTerms.distinct
    if (terms.isEmpty) return lit(0.0)
    val perTerm = terms.map { t =>
      val df = dfByTerm.getOrElse(t, 0L)
      val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
      val tfc = size(filter(toks, x => x === lit(t))).cast("double")
      lit(idf) * (tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }
    round(perTerm.reduceLeft(_ + _), 4)
  }
}

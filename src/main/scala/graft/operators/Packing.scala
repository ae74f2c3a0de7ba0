package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing ([EXT]): group documents into token-budget bins — the
  * sample-packing step that turns a curated corpus into fixed-length
  * training sequences without wasting pad tokens.
  *
  * Packing is inherently SEQUENTIAL (each bin depends on everything placed
  * before it), so it cannot be a Catalyst expression; this is one of the
  * few operators where `mapPartitions` is the honest answer (same
  * justification class as the binary decode in Multimodal). The
  * distributed form is the standard per-partition greedy: documents are
  * deterministically hash-bucketed and sorted, then each partition runs
  * one sequential first-fit pass. Quality loss vs global packing is
  * bounded: at most one under-filled bin per partition.
  *
  * Scale design: the input projection carries (id, n_tokens) only — 16
  * bytes/doc through the one shuffle, never text. Bin ids are globally
  * unique by construction ((partition << 32) | local index), no
  * post-assignment coordination.
  */
object Packing {

  /** One packed training sequence. */
  final case class PackedBin(
      bin_id: Long,
      doc_ids: Seq[Long],
      n_docs: Int,
      total_tokens: Long)

  /** Materialize packed bins into training sequences: explode each bin's
    * id list with its position, join the document texts on id, and
    * concatenate per bin in pack order. At scale both sides are large, so
    * this is a plain equi-join on the doc id (Catalyst picks the
    * strategy) followed by one aggregation per bin; order inside a bin is
    * pinned by sorting the collected (pos, text) structs, not by any
    * arrival assumption.
    *
    * `strict` (default on) pays one extra counting job to fail fast when
    * the join would silently corrupt sequences — a bin id missing from
    * `docs` (dropped text while the bin metadata still counts its
    * tokens) or a duplicated doc id (text repeated). Disable only when
    * the caller guarantees `docs` covers exactly the packed ids.
    */
  def materializeBins(
      bins: Dataset[PackedBin],
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n",
      strict: Boolean = true): DataFrame = {
    val exploded = bins.toDF()
      .select(col("bin_id"),
        posexplode(col("doc_ids")).as(Seq("pos", "__id")))
    val texts = docs.select(col(idCol).cast("long").as("__id"),
      col(textCol).as("__text"))
    val joined = exploded.join(texts, "__id")
    if (strict) {
      val Seq(expected, got) = Seq(exploded, joined).map(_.count())
      require(got == expected,
        s"materializeBins: packed ids and docs disagree (expected " +
          s"$expected doc slots, join produced $got) — missing or " +
          s"duplicated ${idCol}s would silently corrupt sequences")
    }
    joined
      .groupBy(col("bin_id"))
      .agg(
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col("pos"), col("__text")))),
            e => e.getField("__text"))).as("text"),
        // count texts, not rows: a null text is skipped by concat_ws and
        // must not inflate the doc count
        count(col("__text")).cast("int").as("n_docs"))
  }

  /** Greedy first-fit-by-arrival packing. `docs` needs a long id column
    * and a long token-count column. Documents larger than `budget` get a
    * bin of their own (flagged by total_tokens > budget) rather than being
    * dropped — splitting oversized docs is the caller's chunking concern.
    * Deterministic for a fixed `nPartitions`: the bucket key is
    * xxhash64(id) mod n and arrival order is ascending id.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: String,
      budget: Long,
      nPartitions: Int = 0): Dataset[PackedBin] = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    val n =
      if (nPartitions > 0) nPartitions
      else spark.sparkContext.defaultParallelism
    implicit val enc = Encoders.product[PackedBin]
    docs
      .select(col(idCol).cast("long").as("id"),
        // null-count docs pack as zero-cost rather than NPE-ing the
        // per-partition pass; null ids are a data error and still throw
        coalesce(col(tokenCountCol).cast("long"), lit(0L)).as("nt"))
      .repartition(n, pmod(xxhash64(col("id")), lit(n.toLong)))
      .sortWithinPartitions(col("id"))
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId().toLong
        var localBin = 0L
        var curDocs = Vector.empty[Long]
        var curTokens = 0L
        def emit(): PackedBin = {
          val b = PackedBin((pid << 32) | localBin, curDocs,
            curDocs.size, curTokens)
          localBin += 1; curDocs = Vector.empty; curTokens = 0L
          b
        }
        val out = Iterator.newBuilder[PackedBin]
        rows.foreach { r =>
          val id = r.getLong(0)
          val nt = math.max(r.getLong(1), 0L)
          if (curDocs.nonEmpty && curTokens + nt > budget)
            out += emit()
          curDocs :+= id
          curTokens += nt
        }
        if (curDocs.nonEmpty) out += emit()
        out.result()
      }
  }
}

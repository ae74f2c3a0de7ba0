package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k-by-score aggregate: keeps the k best (score desc, id asc)
  * pairs per group in a fixed-size heap, one entry per DISTINCT id.
  *
  * Why (SURVEY.md §2.E top-k at scale): ranking grouped candidates with a
  * `row_number()` window shuffles and sorts EVERY scored row — for
  * brute-force KNN that is the full Q×N pair stream. As a partial-aggregable
  * TypedImperativeAggregate, each map task forwards at most k entries per
  * group, so the exchange carries O(groups × k) instead of O(pairs): the
  * difference between a terabyte shuffle and a megabyte one at corpus scale.
  *
  * Ids are DEDUPED inside the heap (ADVICE r13): a candidate whose id is
  * already held either replaces the held copy (strictly better score) or
  * is dropped — so a duplicated candidate row (e.g. a crash-window
  * re-append in the incremental ANN index, or any future multi-block
  * probe that surfaces the same neighbor twice) costs zero top-k slots
  * instead of displacing a real neighbor. The check is an O(k) scan per
  * accepted insert on a ≤ k-element buffer — no extra exchange, unlike a
  * `dropDuplicates` pass over the full scored stream. For every existing
  * caller the ids within a group are distinct by construction (a corpus
  * vector lives in exactly one IVF cell; cross-join pairs are unique), so
  * dedup is a provable no-op there; it changes results only where
  * duplicates were a bug. The same rule applies across partial-aggregate
  * merges.
  *
  * Output: array<struct<id:bigint, score:double>> sorted best-first; explode
  * with posexplode to recover (rank, id, score) rows.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_topk k must be an integer literal, got $other")
  }

  private def kCheck: Option[String] = kExpr match {
    case Literal(v: Int, IntegerType) =>
      if (v > 0) None else Some(s"graft_topk k must be > 0, got $v")
    case other => Some(s"graft_topk k must be an integer literal, got $other")
  }

  // dequeue order = worst first: smallest score, then largest id
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def checkInputDataTypes(): TypeCheckResult =
    kCheck.map(TypeCheckResult.TypeCheckFailure).getOrElse(
      (idExpr.dataType, scoreExpr.dataType) match {
        case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
        case (i, s) => TypeCheckResult.TypeCheckFailure(
          s"graft_topk requires (bigint id, double score), got " +
            s"(${i.simpleString}, ${s.simpleString})")
      })

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val idV = idExpr.eval(input)
    val scoreV = scoreExpr.eval(input)
    if (idV != null && scoreV != null) {
      add(buf, scoreV.asInstanceOf[Double], idV.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => add(b1, s, i) }
    b1
  }

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
      score: Double, id: Long): Unit = {
    // The membership check runs ONLY on the accept path: the hot reject
    // path (a pair at or under the heap floor — the overwhelming
    // majority of a Q×N candidate stream; expected accepts per group are
    // ~k·ln(n)) stays the old single comparison, no allocation. A
    // rejected duplicate is always correct to drop: its held copy is in
    // the heap, hence ≥ the floor, hence ≥ the rejected candidate.
    if (buf.size < k) {
      val held = buf.find(_._2 == id)
      if (held.isEmpty) buf.enqueue((score, id))
      else if (score > held.get._1) replace(buf, score, id)
    } else if (worstFirst.compare((score, id), buf.head) < 0) {
      val held = buf.find(_._2 == id)
      if (held.isEmpty) {
        // strictly better than the current worst, id not yet held
        buf.dequeue(); buf.enqueue((score, id))
      } else if (score > held.get._1) replace(buf, score, id)
      // else: a worse/equal copy of a held id — drop
    }
  }

  /** Upgrade the held copy of `id` to `score` — rebuild the ≤ k-element
    * queue without it (PriorityQueue has no remove; k is single-digit in
    * every caller, so this is a handful of enqueues on a rare path).
    */
  private def replace(buf: mutable.PriorityQueue[(Double, Long)],
      score: Double, id: Long): Unit = {
    val rest = buf.toArray.filter(_._2 != id)
    buf.clear()
    rest.foreach(buf.enqueue(_))
    buf.enqueue((score, id))
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1),
      kExpr = newChildren(2))
}

/** Bounded per-group id collect for capped LSH buckets: gathers member ids
  * up to cap+1, emits the SORTED array when the group fits (size ≤ cap)
  * and NULL when it overflows.
  *
  * Why (Dedup.lshCandidatePairs): the count-then-join cap shape paid a
  * count aggregate, a broadcast cap join, a bucket self-join, and two
  * persists — three passes over the bucket stream — to produce in-bucket
  * pairs. Collecting the ids directly needs ONE exchange and the pair
  * expansion becomes a narrow in-task generator. The buffer is bounded at
  * cap+1 on BOTH update and merge, so a degenerate bucket (every empty
  * doc, a boilerplate shingle) costs 8·(cap+1) bytes per task, never an
  * unbounded collect_list — the reason Spark's own collect_list cannot be
  * used here at 100 TB. Ids within a (band, key) group are distinct by
  * construction (one band key per band per doc), so no dedup pass is
  * needed and `size ≤ cap` means the array is exhaustive for the bucket.
  */
case class CollectCapped(
    idExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  private lazy val cap: Int = capExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_collect_capped cap must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = capExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => idExpr.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_collect_capped requires a bigint id, got ${t.simpleString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_collect_capped cap must be a positive integer literal, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(idExpr, capExpr)
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(
      buf: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    val idV = idExpr.eval(input)
    // fail fast, don't drop: lshCandidatePairs requires a non-null bigint
    // id, and silently skipping nulls would let a cap+1-row bucket with a
    // null id pass as cap-sized instead of overflowing
    if (idV == null) throw new IllegalArgumentException(
      "graft_collect_capped: id is NULL — the caller must supply a " +
        "non-null bigint id column")
    // size cap+1 IS the overflow marker; past it nothing more is kept
    if (buf.size <= cap) buf += idV.asInstanceOf[Long]
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[Long],
      b2: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val it = b2.iterator
    while (it.hasNext && b1.size <= cap) b1 += it.next()
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    if (buf.size > cap) null
    else new GenericArrayData(buf.sorted.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(idExpr = newChildren(0), capExpr = newChildren(1))
}

/** Bounded edge-list collect for small-graph fast paths: gathers (src, dst)
  * long pairs up to cap+1 pairs, emits an INTERLEAVED array<bigint>
  * [s0, d0, s1, d1, …] when the group fits (≤ cap pairs) and NULL when it
  * overflows — the same buffer/overflow contract as [[CollectCapped]].
  *
  * Why (ConnectedComponents.run): the transitive-dedup fast path previously
  * paid a SEPARATE collect job over the checkpointed edge blocks. Riding
  * this aggregate on the checkpoint's `observe` hands the driver the whole
  * edge list inside the materialization action — zero extra jobs — while
  * the cap bounds what a task buffer (and the metric accumulator) can ever
  * hold: 16·(cap+1) bytes, never an unbounded collect_list. Graphs past the
  * cap emit NULL and fall back to the block collect / star loop, paying
  * nothing extra for having tried (the aggregate rides an action that runs
  * anyway).
  *
  * Edge order is partition-dependent and deliberately unspecified: the
  * union-find consumer is order-insensitive (min-root merge).
  */
case class CollectPairsCapped(
    srcExpr: Expression,
    dstExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  private lazy val cap: Int = capExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_collect_pairs_capped cap must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = capExpr match {
    case Literal(v: Int, IntegerType) if v > 0 =>
      (srcExpr.dataType, dstExpr.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (a, b) => TypeCheckResult.TypeCheckFailure(
          s"graft_collect_pairs_capped requires bigint ids, got " +
            s"(${a.simpleString}, ${b.simpleString})")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_collect_pairs_capped cap must be a positive integer literal, " +
        s"got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(srcExpr, dstExpr, capExpr)
  override def prettyName: String = "graft_collect_pairs_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  // buffer holds 2·pairs longs; 2·(cap+1) IS the overflow marker
  override def update(
      buf: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    val s = srcExpr.eval(input)
    val d = dstExpr.eval(input)
    // fail fast, don't drop (the CollectCapped null lesson, ADVICE r12):
    // a silently skipped null edge would under-count the graph
    if (s == null || d == null) throw new IllegalArgumentException(
      "graft_collect_pairs_capped: null edge endpoint — callers must " +
        "filter null ids first")
    if (buf.size <= 2 * cap) {
      buf += s.asInstanceOf[Long]
      buf += d.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[Long],
      b2: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val it = b2.iterator
    while (it.hasNext && b1.size <= 2 * cap) {
      b1 += it.next()
      // pairs always travel together: b2's length is even by construction
      b1 += it.next()
    }
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    if (buf.size > 2 * cap) null
    else new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectPairsCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectPairsCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectPairsCapped =
    copy(srcExpr = newChildren(0), dstExpr = newChildren(1),
      capExpr = newChildren(2))
}

/** Per-group greedy maximal-marginal-relevance selection: collects a
  * query's (id, rel4, vector) candidates and runs the WHOLE k-step greedy
  * loop inside the aggregate's eval — one q_id exchange for the entire
  * re-rank.
  *
  * Why ([[graft.operators.Mmr]]): the unrolled plan form is k window
  * argmaxes + k equi-joins + a k-way union over O(queries × c) frames —
  * tiny data, but the PLAN costs dominate: profiled 1.67 s of AQE
  * replanning (withFinalPlanUpdate re-canonicalizes the nested
  * window/join/union tree per stage) plus a single-task tail stage where
  * AQE coalesced the final steps by their few shuffled bytes (the
  * round-12 post-aggregation lesson). As ONE partial-aggregable pass the
  * plan is scan → partial collect → exchange on q_id → greedy eval:
  * q_mmr_rerank 2.0 → ~1.1 s with the knn candidate stage unchanged.
  *
  * Bit-parity contract with the unrolled form (pinned by MmrSpec's
  * kernel ≡ unrolled property and the q_mmr_rerank hash oracle):
  *  - step score = 100·l10·rel4 − (10−l10)·ms6, EXACT longs (the Mmr
  *    integer-scoring contract); argmax ties to the smaller id;
  *  - redundancy update: cosine accumulated left-to-right like
  *    [[graft.plans.CosineSimilarity]] (zero denominator → 0.0), round-6
  *    via BigDecimal HALF_UP, ×10⁶ re-rounded at scale 0 HALF_UP then
  *    truncated to long — exactly `round(round(cos, 6) * 1e6).cast(long)`
  *    — and ratcheted with max against the working ms6 (init 0: the
  *    CLAMPED variant, negative cosines never bonus);
  *  - emit order = selection order; fewer than k candidates yield fewer
  *    entries.
  * The buffer is the group's candidate list — BOUNDED BY CONTRACT (MMR
  * inputs are ANN-stage candidate lists, ≤ c per query); a group past
  * `maxCandidates` (4096) fails fast on update AND merge rather than
  * silently dropping or OOMing (feeding a corpus-sized group to a greedy
  * O(n·k) re-rank is a caller bug, never a degradation to absorb).
  *
  * Output: array<struct<id:bigint, sc:bigint>> in selection order; the
  * caller divides sc by 10⁷ for the emitted mmr6 and takes rank from
  * posexplode position.
  */
case class MmrSelect(
    idExpr: Expression,
    rel4Expr: Expression,
    vecExpr: Expression,
    kExpr: Expression,
    l10Expr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long, Array[Double])]] {

  private val maxCandidates = 4096

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_mmr $name must be an integer literal, got $other")
  }
  private lazy val k: Int = intLit(kExpr, "k")
  private lazy val l10: Int = intLit(l10Expr, "l10")

  override def checkInputDataTypes(): TypeCheckResult = {
    val kOk = kExpr match {
      case Literal(v: Int, IntegerType) if v > 0 => true
      case _ => false
    }
    val lOk = l10Expr match {
      case Literal(v: Int, IntegerType) if v >= 0 && v <= 10 => true
      case _ => false
    }
    val inOk = (idExpr.dataType, rel4Expr.dataType, vecExpr.dataType) match {
      case (LongType, LongType, ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (kOk && lOk && inOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_mmr requires (bigint id, bigint rel4, array<double> vec, " +
        s"int-literal k > 0, int-literal l10 in [0,10]); got " +
        s"(${idExpr.dataType.simpleString}, ${rel4Expr.dataType.simpleString}, " +
        s"${vecExpr.dataType.simpleString}, $kExpr, $l10Expr)")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("sc", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] =
    Seq(idExpr, rel4Expr, vecExpr, kExpr, l10Expr)
  override def prettyName: String = "graft_mmr"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long, Array[Double])] =
    mutable.ArrayBuffer.empty

  private def bound(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])]): Unit =
    if (buf.size > maxCandidates)
      throw new IllegalArgumentException(
        s"graft_mmr: a group exceeded $maxCandidates candidates — MMR " +
          "re-ranks bounded ANN candidate lists; cut the corpus with a " +
          "top-c stage first")

  override def update(
      buf: mutable.ArrayBuffer[(Long, Long, Array[Double])],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    val idV = idExpr.eval(input)
    val relV = rel4Expr.eval(input)
    val vecV = vecExpr.eval(input)
    // a null id, relevance, or vector is a corrupt candidate row, not a
    // degradation to absorb: silently skipping would DIVERGE from the
    // unrolled reference (which window-sorts nulls last) with no signal
    // (review finding) — the greedy selection's inputs must be total
    if (idV == null || relV == null || vecV == null)
      throw new IllegalArgumentException(
        "graft_mmr: null candidate field (id, relevance, and vector must " +
          s"all be non-null; got id=$idV, rel4=$relV, " +
          s"vec=${if (vecV == null) "null" else "…"}) — filter or repair " +
          "candidates before re-ranking")
    val arr = vecV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val v = new Array[Double](arr.numElements())
    var i = 0
    while (i < v.length) { v(i) = arr.getDouble(i); i += 1 }
    buf += ((idV.asInstanceOf[Long], relV.asInstanceOf[Long], v))
    bound(buf)
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[(Long, Long, Array[Double])],
      b2: mutable.ArrayBuffer[(Long, Long, Array[Double])]): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    b1 ++= b2
    bound(b1)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])]): Any = {
    val n = buf.size
    val wRel = 100L * l10
    val wMs = 10L - l10
    val ms6 = new Array[Long](n)
    val taken = new Array[Boolean](n)
    val picks = math.min(k, n)
    val out = new Array[Any](picks)
    var s = 0
    while (s < picks) {
      var bi = -1; var bSc = Long.MinValue; var bId = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val sc = wRel * buf(i)._2 - wMs * ms6(i)
          if (sc > bSc || (sc == bSc && buf(i)._1 < bId)) {
            bi = i; bSc = sc; bId = buf(i)._1
          }
        }
        i += 1
      }
      out(s) = new GenericInternalRow(Array[Any](buf(bi)._1, bSc))
      taken(bi) = true
      if (s + 1 < picks) {
        val bv = buf(bi)._3
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val v = buf(j)._3
            if (v.length != bv.length)
              throw new IllegalArgumentException(
                s"graft_mmr: vector lengths differ (${v.length} vs ${bv.length})")
            val r6 = VecMath.cosine6(v, bv)
            val m = java.math.BigDecimal.valueOf(r6 * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .doubleValue().toLong
            if (m > ms6(j)) ms6(j) = m
          }
          j += 1
        }
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])]): Array[Byte] = {
    val dim = if (buf.isEmpty) 0 else buf.head._3.length
    val bb = ByteBuffer.allocate(8 + buf.size * (16 + 8 * dim))
    bb.putInt(buf.size); bb.putInt(dim)
    buf.foreach { case (id, rel, v) =>
      require(v.length == dim,
        s"graft_mmr: ragged candidate vectors ($dim vs ${v.length})")
      bb.putLong(id); bb.putLong(rel)
      var i = 0
      while (i < dim) { bb.putDouble(v(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt; val dim = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val id = bb.getLong; val rel = bb.getLong
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = bb.getDouble; i += 1 }
      buf += ((id, rel, v))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrSelect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MmrSelect =
    copy(idExpr = newChildren(0), rel4Expr = newChildren(1),
      vecExpr = newChildren(2), kExpr = newChildren(3),
      l10Expr = newChildren(4))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list ([EXT]) — the missing
  * last step of transitive near-dup deduplication: `Dedup.nearDupPairs`
  * emits PAIRS, but "keep one document per duplicate CLUSTER" needs the
  * transitive closure (A~B, B~C ⇒ {A,B,C} is one cluster even when A and C
  * never paired).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
  * "Connected Components in MapReduce and Beyond") — the standard
  * O(log² n)-round method, converging to star graphs where every node
  * points at its component's minimum id:
  *
  *  - large-star: every node connects its STRICTLY LARGER neighbors to the
  *    smallest member of its closed neighborhood;
  *  - small-star: every node (on down-pointing edges) connects its smaller
  *    neighbors and itself to the smallest one.
  *
  * Scale design (100 TB of near-dup pairs):
  *  - Each round is two hash aggregations + two hash joins on node ids —
  *    no driver-side graph state, no collect; a plain label-propagation
  *    loop would need O(diameter) rounds (a 5000-node chain ⇒ 5000 jobs),
  *    this needs O(log² n).
  *  - `localCheckpoint` after every round truncates the exponentially
  *    deepening lineage — without it Catalyst re-analyzes a plan that
  *    doubles per iteration and task binaries blow up. On a real cluster
  *    with executor churn, prefer `spark.sparkContext.setCheckpointDir` +
  *    reliable `checkpoint` (localCheckpoint blocks lose lineage-recovery);
  *    locally the executor-memory flavor is exactly right.
  *  - Convergence is detected by an aggregate signature (count, sums, and
  *    a sum of per-edge xxhash64) of the canonical edge set — one cheap agg
  *    job per round instead of two `EXCEPT` shuffles; the hash term makes a
  *    false "stable" read a 2⁻⁶⁴ event.
  */
object ConnectedComponents {

  /** (id, component) for every node that appears in `edges`, where
    * `component` is the minimum node id reachable. Self-loops and
    * duplicate/reversed edges are tolerated. Isolated nodes never appear
    * (they have no edges) — callers left-join and `coalesce(component, id)`.
    *
    * @param maxIter hard stop; the algorithm provably converges in
    *                O(log² n) rounds, so hitting this indicates a bug or an
    *                adversarial graph — fail loudly rather than return a
    *                silently-partial clustering.
    * @param driverMaxEdges edge count at or below which the closure runs as
    *                a driver-side union-find instead of star rounds — the
    *                same adaptive move as a broadcast-join threshold. The
    *                count comes FREE from the convergence signature the
    *                distributed loop needs anyway, the collect is bounded
    *                (default 1M edges ≈ 16 MB of longs), and near-dup pair
    *                graphs are tiny relative to their corpus, so in
    *                practice this replaces ~2 jobs × O(log² n) rounds with
    *                one collect. At real scale the count exceeds the bound
    *                and the star loop runs unchanged. 0 forces distributed.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30,
      driverMaxEdges: Long = 1000000L): DataFrame = {
    // fail fast on non-integral id columns (round-9 review finding: a
    // string/UUID id silently cast to NULL, every edge was filtered, and
    // the transitive dedup paths became a no-op while pair-greedy worked)
    Seq(srcCol, dstCol).foreach { c =>
      val dt = edges.schema(c).dataType
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"connected components needs integral id columns; '$c' is " +
          s"${dt.simpleString} — map string ids to longs (dictionary or " +
          "hash) before clustering")
    }
    var e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()

    var sig = signature(e)
    if (sig._1 > 0L && sig._1 <= driverMaxEdges) return driverClosure(e)
    var iter = 0
    var converged = sig._1 == 0L // empty edge set is already done
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      e = next
      sig = nextSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          s"(${sig._1} edges) — raise maxIter or inspect the edge set")
    // stars: every edge points (member → component min); the min itself
    // only appears as a dst, so add its identity row
    e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
  }

  /** Small-graph fast path: collect the (deduped, checkpointed) edge list
    * and run union-find with union-by-min — attaching the larger root
    * under the smaller keeps every tree's root equal to the minimum member
    * id by induction, so the final `find` of each node IS its component's
    * min, exactly the star loop's fixpoint. Deterministic (no ordering
    * sensitivity: the merged root is min() regardless of edge order), and
    * the output row set — every node mapped to its component min — is
    * identical to the distributed path's.
    */
  private def driverClosure(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val edges = e.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      parent.size())
    parent.keySet().forEach(k => out += ((k, find(k))))
    out.toSeq.toDF("id", "component")
  }

  /** Canonical-form signature for convergence detection: count plus two
    * XOR-folded per-edge hashes — order-independent, and XOR cannot
    * overflow (a sum of hashes trips ANSI mode's long-overflow check).
    * The edge set is distinct, so XOR's duplicate-cancellation is moot.
    */
  private def signature(e: DataFrame): (Long, Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h1"),
      coalesce(bit_xor(xxhash64(col("dst"), col("src"))), lit(0L)).as("h2"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("src"), least(col("src"), col("__mn")).as("__m"))
    sym.join(m, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** On down-pointing edges, connect u's smaller neighbors and u itself to
    * the smallest of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val down = e
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val m = down.groupBy(col("src")).agg(min(col("dst")).as("__m"))
    val joined = down.join(m, "src")
    joined
      .filter(col("dst") =!= col("__m"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .union(m.select(col("src"), col("__m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}

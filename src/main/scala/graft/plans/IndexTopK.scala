package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Index-aware top-k rewrite (SURVEY §4 / §7.3's one deferred concept,
  * promoted on round-15's bench evidence): a `Rule[LogicalPlan]` that
  * recognizes the naive single-query cosine top-k shape —
  *
  *   spark.table(idx)
  *     .select(col("id"),
  *       round(graft_cosine(litQueryVec, col("vec")), 4).as("sim4"))
  *     .orderBy(col("sim4").desc, col("id"))
  *     .limit(k)
  *
  * — over a table that IS an [[graft.operators.IncrementalAnn]] index (a
  * catalog table with a `<t>_centroids` sidecar), and injects
  * `Filter(cell IN probedCells(queryVec))` directly above the relation.
  * The bucketed table then BUCKET-PRUNES the scan (FileSourceStrategy
  * turns an IN on the bucket column into an `optionalBucketSet`), so the
  * full-corpus scan-and-sort becomes an nProbe/nCells read — at 10k
  * cells, 0.02% of the index — while the Sort/Limit on top are untouched.
  *
  * Semantics contract (why this is OPT-IN via [[IndexTopK.EnabledKey]],
  * default off): the rewrite answers from the probed cells — exactly the
  * single-query case of [[graft.operators.IncrementalAnn.query]]'s probe
  * contract — which is APPROXIMATE top-k for nProbe < nCells and exact
  * at nProbe >= nCells (the filter then keeps every cell — the same
  * degeneracy argument as refineExact's C = corpus). A flag that changes
  * results must never default on; a user who enables it is asking for
  * index-accelerated ANN semantics on index tables, the q_ann_ivf_md5
  * probe order (round-6 cosine DESC, cell ASC — [[VecMath]], the one
  * definition the kernel uses).
  *
  * Fail-open: any doubt — no sidecar, no `cell`/vector column, a
  * mid-rebuild residue throw from the sidecar read, a malformed shape —
  * leaves the plan untouched (the brute plan is always correct). The
  * sidecar read is one bounded (≤ nCells rows) collect per optimization
  * of a matching query, the same read queryPersisted pays.
  *
  * Deployment: installed by [[GraftFunctions.register]] (session-local
  * `experimental.extraOptimizations`, post-main-batch — the injected
  * Filter still reaches the scan because physical planning's
  * PhysicalOperation collects Filter-over-relation stacks itself) and by
  * [[GraftExtensions]] (`injectOptimizerRule`, the one-conf-line cluster
  * path; that batch runs to FIXED POINT, hence the idempotence guard:
  * a relation already wearing our probe filter is never wrapped again).
  */
object IndexTopK {
  /** Session flag gating the rewrite; default false (results change). */
  val EnabledKey = "spark.graft.index.topk.enabled"

  /** Probe width; nProbe >= nCells degenerates to the exact plan. */
  val NProbeKey = "spark.graft.index.topk.nprobe"
}

case class IndexTopKRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import IndexTopK._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledKey, "false").toBoolean) plan
    else plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(_),
          ll @ LocalLimit(_, sort: Sort)) =>
        rewrite(sort) match {
          case Some(newSort) => gl.copy(child = ll.copy(child = newSort))
          case None => gl
        }
    }
  }

  /** The probe filter for one matched Sort, or None to leave it alone. */
  private def rewrite(sort: Sort): Option[Sort] = {
    if (sort.order.isEmpty || sort.order.head.direction != Descending)
      return None
    // resolve the leading sort key through child Project aliases down to
    // the expression that computes it
    val aliases = sort.child.collect {
      case p: Project => p.projectList.collect {
        case a: Alias => a.toAttribute.exprId -> a.child
      }
    }.flatten.toMap
    def resolve(e: Expression): Expression = e match {
      case ar: AttributeReference =>
        aliases.get(ar.exprId).map(resolve).getOrElse(ar)
      case other => other
    }
    // the recognized key: round(graft_cosine(<literal vec>, <vec col>), 4)
    // (either argument order; bare cosine without the round also counts —
    // the rounding only breaks ties, the probe decision is identical)
    val (qv, vecAttr) = resolve(sort.order.head.child) match {
      case r: Round if r.child.isInstanceOf[CosineSimilarity] =>
        cosineArgs(r.child.asInstanceOf[CosineSimilarity])
          .getOrElse(return None)
      case c: CosineSimilarity => cosineArgs(c).getOrElse(return None)
      case _ => return None
    }
    // the relation the vector column belongs to, with its catalog name
    val rel = sort.child.collectFirst {
      case r: LogicalRelation
          if r.catalogTable.isDefined &&
            r.output.exists(_.exprId == vecAttr.exprId) => r
    }.getOrElse(return None)
    val cellAttr = rel.output.find(_.name == "cell").getOrElse(return None)
    // idempotence (the fixed-point batch): already wearing a probe filter?
    val alreadyFiltered = sort.child.exists {
      case Filter(In(a: AttributeReference, _), child)
          if a.exprId == cellAttr.exprId &&
            child.exists(_ eq rel) => true
      case _ => false
    }
    if (alreadyFiltered) return None
    val table = rel.catalogTable.get.identifier.table
    val centroids =
      try {
        if (!spark.catalog.tableExists(
            graft.operators.IncrementalAnn.centroidsTableName(table)))
          return None
        graft.operators.IncrementalAnn.centroids(spark, table)
      } catch {
        // mid-rebuild residue / corrupt sidecar: the brute plan is
        // always correct — fail OPEN, never the query
        case scala.util.control.NonFatal(e) =>
          logWarning(s"graft index-topk: sidecar read for $table failed " +
            s"(${e.getMessage}) — leaving the brute plan")
          return None
      }
    val nProbe = math.max(1, spark.conf.get(NProbeKey, "2").toInt)
    val cells = probeCells(qv, centroids, nProbe)
    logInfo(s"graft index-topk: rewriting cosine top-k over $table to " +
      s"cells [${cells.mkString(",")}] (nProbe=$nProbe of " +
      s"${centroids.length})")
    // transformUp, not transformDown: down recurses into the REPLACEMENT
    // node's children, re-matches the relation inside its new Filter
    // parent, and wraps forever (measured as a StackOverflowError)
    val filtered = sort.transformUp {
      case r: LogicalRelation if r eq rel =>
        Filter(In(cellAttr, cells.map(c => Literal(c))), r)
    }
    Some(filtered.asInstanceOf[Sort])
  }

  /** (queryVecLiteral, vectorColumn) from either argument order. */
  private def cosineArgs(
      c: CosineSimilarity): Option[(Array[Double], AttributeReference)] =
    (c.left, c.right) match {
      case (l: Literal, a: AttributeReference) =>
        literalVec(l).map(_ -> a)
      case (a: AttributeReference, l: Literal) =>
        literalVec(l).map(_ -> a)
      case _ => None
    }

  private def literalVec(l: Literal): Option[Array[Double]] =
    (l.dataType, l.value) match {
      case (ArrayType(DoubleType, _), ad: ArrayData) =>
        Some(ad.toDoubleArray())
      case _ => None
    }

  /** The kernel's probe order — round-6 cosine DESC, cell ASC — computed
    * driver-side over the bounded centroid table, via the SAME
    * [[VecMath]] the `graft_ivf_cells` kernel runs (one definition of
    * parity-critical math, the round-6 rule).
    */
  private def probeCells(
      qv: Array[Double],
      centroids: Array[Array[Double]],
      nProbe: Int): Seq[Long] =
    centroids.zipWithIndex
      .map { case (c, i) => (-VecMath.cosine6(qv, c), i.toLong) }
      .sortBy(identity)
      .take(math.min(nProbe, centroids.length))
      .map(_._2).toSeq
}

package graft

import graft.operators.Profiling
import graft.operators.Profiling.Spec

/** Column profiling + drift: metric math, null/zero-baseline contracts. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Spec(numeric = Seq("x"), strings = Seq("s"))

  private def prev = Seq(
    (10L, Some("aa")), (20L, Some("bb")), (30L, None), (40L, Some("aa"))
  ).toDF("x", "s")

  test("profile: metric values on a hand-checked frame") {
    val m = Profiling.profile(prev, spec).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("x", "null_rate_micro")) === 0.0)
    assert(m(("x", "min")) === 10.0)
    assert(m(("x", "max")) === 40.0)
    assert(m(("x", "avg")) === 25.0)
    assert(m(("s", "null_rate_micro")) === 250000.0) // 1 of 4
    assert(m(("s", "avg_len")) === 2.0)
    assert(m(("s", "distinct")) === 2.0)             // aa, bb
  }

  test("psi: baseline-fitted bins, shift detection, empty-bin floor") {
    val prevDf = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "v")
    val curDf = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 6L))
      .toDF("doc_id", "v")
    val out = Profiling.psi(prevDf, curDf, "v", "doc_id",
      bins = 2, sampleSize = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // cut at the 2nd order statistic (=2): prev splits 2/2, cur all high
    assert(out(1L).getAs[Long]("n_prev") === 2L)
    assert(out(1L).getAs[Long]("n_cur") === 0L)
    assert(out(2L).getAs[Long]("n_cur") === 4L)
    // bin 2: (0.5 - 1.0) * ln(0.5) = 0.346574
    assert(out(2L).getAs[Double]("psi_contrib") === 0.346574)
    // bin 1 uses the 1e-6 floor for the empty side: large positive
    assert(out(1L).getAs[Double]("psi_contrib") > 6.0)
    // identical snapshots -> zero PSI everywhere
    val same = Profiling.psi(prevDf, prevDf, "v", "doc_id",
      bins = 2, sampleSize = 4).collect()
    assert(same.forall(_.getAs[Double]("psi_contrib") === 0.0))
  }

  test("joinSkewReport: top keys by output contribution, nulls dropped") {
    val left = Seq("a", "a", "a", "b", "b", "c", null).toDF("k")
    val right = Seq("a", "a", "b", "d", null).toDF("k")
    val out = graft.operators.Profiling
      .joinSkewReport(left, "k", right, "k", topK = 2).collect()
    // contributions: a 3*2=6, b 2*1=2; c/d/null never match
    assert(out.length === 2)
    assert(out(0).getString(0) === "a" && out(0).getAs[Long]("est_rows") === 6L)
    assert(out(0).getAs[Long]("share_micro") === 750000L)
    assert(out(1).getString(0) === "b" && out(1).getAs[Long]("est_rows") === 2L)
  }

  test("drift: relative change, tolerance, zero and null baselines") {
    val cur = Seq(
      (10L, Some("aa")), (20L, None), (30L, None), (60L, Some("cc"))
    ).toDF("x", "s")
    val d = Profiling.drift(
      Profiling.profile(prev, spec),
      Profiling.profile(cur, spec), tolMicro = 100000L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // max: 40 -> 60 = +50% -> alarm
    val mx = d(("x", "max"))
    assert(mx.getAs[Long]("rel_change_micro") === 500000L)
    assert(mx.getAs[Boolean]("alarm"))
    // null_rate s: 250000 -> 500000 = +100% -> alarm
    assert(d(("s", "null_rate_micro")).getAs[Long]("rel_change_micro")
      === 1000000L)
    // min unchanged -> 0, no alarm
    assert(d(("x", "min")).getAs[Long]("rel_change_micro") === 0L)
    assert(!d(("x", "min")).getAs[Boolean]("alarm"))
    // zero baseline appearing: x null_rate 0 -> 0 stays 0
    assert(d(("x", "null_rate_micro")).getAs[Long]("rel_change_micro")
      === 0L)
    // zero baseline -> nonzero forces a full-swing alarm
    val cur2 = Seq((10L, None: Option[String])).toDF("x", "s")
    val d2 = Profiling.drift(
      Profiling.profile(prev, spec),
      Profiling.profile(cur2, spec), tolMicro = 100000L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(d2(("x", "null_rate_micro")).getAs[Long]("rel_change_micro")
      === 0L) // 0 -> 0 (x fully present in both)
    assert(d2(("s", "null_rate_micro")).getAs[Long]("rel_change_micro")
      === 1000000L * 3) // 250000 -> 1000000 = +300%
    // all-null string column: avg_len/distinct NULL -> defined=false,
    // change 0, no alarm
    val al = d2(("s", "avg_len"))
    assert(!al.getAs[Boolean]("defined"))
    assert(al.getAs[Long]("rel_change_micro") === 0L)
    assert(!al.getAs[Boolean]("alarm"))
  }
}

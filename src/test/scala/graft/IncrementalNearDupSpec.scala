package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental MinHash near-dup against the banded signature index:
  * bootstrap, exact-dup drop, near-dup drop, distinct keep, the
  * no-shingle pass-through, and input-column guards.
  */
class IncrementalNearDupSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): Unit = {
    dropTable(name)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  // ~40 contiguous-alnum tokens: enough shingles that a one-token tail
  // edit leaves most MinHash components unchanged
  private def doc(seed: Int): String =
    (0 until 40).map(i => s"w${seed}x$i").mkString(" ")

  test("bootstrap keeps everything; an identical second batch drops fully") {
    freshTable("t_ind_a")
    val base = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
      .toDF("doc_id", "text")
    val first = Dedup.incrementalNearDupMd5(base, "text", "doc_id",
      "t_ind_a", buckets = 4)
    assert(first.count() === 3)
    val replay = base.withColumn("doc_id", col("doc_id") + 100)
    val second = Dedup.incrementalNearDupMd5(replay, "text", "doc_id",
      "t_ind_a", buckets = 4)
    assert(second.count() === 0)
  }

  test("near-dup drops, distinct survives, survivor extends the index") {
    freshTable("t_ind_b")
    val base = Seq((1L, doc(7))).toDF("doc_id", "text")
    Dedup.incrementalNearDupMd5(base, "text", "doc_id", "t_ind_b",
      buckets = 4)
    val batch = Seq(
      (10L, doc(7) + " extratok99"), // near-dup of indexed doc
      (11L, doc(8))                  // genuinely new
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDupMd5(batch, "text", "doc_id",
      "t_ind_b", buckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    // the survivor is now history: its own near-dup drops next increment
    val batch2 = Seq((20L, doc(8) + " moretok42")).toDF("doc_id", "text")
    val kept2 = Dedup.incrementalNearDupMd5(batch2, "text", "doc_id",
      "t_ind_b", buckets = 4)
    assert(kept2.count() === 0)
  }

  test("documents with no shingles pass through and never enter the index") {
    freshTable("t_ind_c")
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text") // 2 tokens, 0 shingles
    assert(Dedup.incrementalNearDupMd5(tiny, "text", "doc_id", "t_ind_c",
      buckets = 4).count() === 1)
    // identical tiny text again: still kept (nothing was indexed)
    val again = Seq((2L, "ab cd")).toDF("doc_id", "text")
    assert(Dedup.incrementalNearDupMd5(again, "text", "doc_id", "t_ind_c",
      buckets = 4).count() === 1)
    assert(spark.table("t_ind_c").count() === 0)
  }

  test("reserved working columns are rejected") {
    freshTable("t_ind_d")
    val bad = Seq((1L, "x", "y")).toDF("doc_id", "text", "__sig")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupMd5(bad, "text", "doc_id", "t_ind_d")
    }
    assert(e.getMessage.contains("__sig"))
  }

  test("index stays bucketed on key across appends") {
    freshTable("t_ind_e")
    val base = Seq((1L, doc(30)), (2L, doc(31))).toDF("doc_id", "text")
    Dedup.incrementalNearDupMd5(base, "text", "doc_id", "t_ind_e",
      buckets = 4)
    Dedup.incrementalNearDupMd5(
      Seq((3L, doc(32))).toDF("doc_id", "text"), "text", "doc_id",
      "t_ind_e", buckets = 4)
    // both increments' band rows present, schema (key, id, sig)
    val idx = spark.table("t_ind_e")
    assert(idx.columns.toSeq === Seq("key", "id", "sig"))
    assert(idx.select("id").distinct().count() === 3)
  }
}

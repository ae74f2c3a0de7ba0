package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: schema/batch shape of the stubbed decode pipeline
  * (the decode itself is a deterministic fake — see Multimodal scaladoc).
  */
class MultimodalSpec extends SparkSpec {

  test("asMedia + decodeStub produce one full feature row per record") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "image", "srcA"),
      (2L, "", "audio", "srcB"),
      (3L, "a" * 200, "video", "srcC"))
      .toDF("doc_id", "text", "mt", "source")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "mt", "source")
    val feats = Multimodal.decodeStub(media).collect().sortBy(_.media_id)

    assert(feats.length === 3)
    assert(feats.forall(_.features.length === Multimodal.FeatureDim))
    assert(feats(0).n_bytes === 11L)
    assert(feats(1).n_bytes === 0L)
    assert(feats(1).n_frames === 0)
    assert(feats(2).n_frames === math.ceil(200.0 / 64).toInt)
    assert(feats(2).media_type === "video")
  }

  test("decode is deterministic: same bytes, same features") {
    import spark.implicits._
    val docs = Seq((1L, "same payload", "image", "s"),
      (2L, "same payload", "image", "s")).toDF("doc_id", "text", "mt", "source")
    val f = Multimodal.decodeStub(
      Multimodal.asMedia(docs, "doc_id", "text", "mt", "source"))
      .collect().sortBy(_.media_id)
    assert(f(0).features.toSeq === f(1).features.toSeq)
  }

  test("frameOffsets boundary math") {
    assert(Multimodal.frameOffsets(0, 64).isEmpty)
    assert(Multimodal.frameOffsets(1, 64).toSeq === Seq(0))
    assert(Multimodal.frameOffsets(64, 64).toSeq === Seq(0))
    assert(Multimodal.frameOffsets(65, 64).toSeq === Seq(0, 64))
  }

  test("resizeStub truncates payloads without dropping rows") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 100, "image", "s")).toDF("doc_id", "text", "mt", "source")
    val resized = Multimodal.resizeStub(
      Multimodal.asMedia(docs, "doc_id", "text", "mt", "source"), 10)
      .collect()
    assert(resized.head.content.length === 10)
  }
}

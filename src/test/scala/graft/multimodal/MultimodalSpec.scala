package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media plumbing: binary payloads flow through batched extraction") {
    import spark.implicits._
    val docs = Seq((0L, "hello world"), (1L, "spark engine"), (2L, "x"))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media, batchSize = 2).collect()
      .sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats(0).byte_len == 11L)               // "hello world".getBytes.length
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.forall(_.feature.length == 8))
    // deterministic stub: same payload → same features
    val again = Multimodal.extractFeatures(media, batchSize = 64).collect()
      .sortBy(_.media_id)
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
    assert(feats.map(f => (f.width, f.height)).toSeq == again.map(f => (f.width, f.height)).toSeq)
  }

  test("resize bounds dimensions; frame sampling expands 1 row to n frames") {
    import spark.implicits._
    val docs = Seq((0L, "some media payload"), (1L, "another")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val resized = Multimodal.resize(
      Multimodal.extractFeatures(media), maxSide = 100).collect()
    assert(resized.forall(f => f.width <= 100 && f.height <= 100))
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    assert(frames.length == 8)
    assert(frames.forall(_.mime == "image/frame"))
    // frame payloads are deterministic derivations of the source
    val again = Multimodal.sampleFrames(media, n = 4).collect()
    assert(frames.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }
}

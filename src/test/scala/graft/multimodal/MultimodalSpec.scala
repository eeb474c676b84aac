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
}

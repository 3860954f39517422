package graft

import graft.multimodal.Media

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "payload zero"), (1L, "payload one"), (2L, "payload two"))
    .toDF("doc_id", "text")

  test("fromText builds typed blobs with metadata") {
    val blobs = Media.fromText(docs, "doc_id", "text").collect()
    assert(blobs.length == 3)
    assert(blobs.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
    assert(blobs.forall(b => b.bytes.nonEmpty && b.duration_ms > 0))
  }

  test("featurize runs partition-locally and is deterministic") {
    val blobs = Media.fromText(docs, "doc_id", "text")
    val f1 = Media.featurize(blobs).collect().sortBy(_.media_id)
    val f2 = Media.featurize(blobs).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(f => f.feature.length == 8 && f.width > 0 && f.height > 0))
  }

  test("sampleFrames explodes only video rows beyond frame 0") {
    val feats = Media.featurize(Media.fromText(docs, "doc_id", "text"))
    val frames = Media.sampleFrames(feats, 10)
    val byKind = frames.groupBy("kind").count().as[(String, Long)].collect().toMap
    // image/audio rows decode to a single frame each
    assert(byKind.filter(_._1 != "video").values.forall(_ > 0))
  }
}

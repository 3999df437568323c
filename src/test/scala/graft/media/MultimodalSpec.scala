package graft.media

import graft.SparkSpec
import graft.util.Tables

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, batch extraction, deterministic features") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media, dims = 8)

    assert(
      feats.schema.fieldNames.toSeq == Seq("media_id", "kind", "n_bytes", "content_md5", "feature"))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(_.n_bytes > 0))
    assert(rows.forall(_.content_md5.matches("[0-9a-f]{32}")))

    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media, dims = 8).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall { case (a, b) =>
      a.feature.sameElements(b.feature)
    })
  }

  test("decodeStub is a pure function of payload bytes") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val c = Multimodal.decodeStub("hello worle".getBytes("UTF-8"))
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }
}

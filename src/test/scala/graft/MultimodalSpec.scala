package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .withColumn("payload", encode(col("text"), "UTF-8"))
    Multimodal.fromBinary(docs, "doc_id", "payload", "video", "source")
  }

  test("decode stub: deterministic, schema-complete, plausible dims") {
    val out1 = Multimodal.decode(media).collect().sortBy(_.media_id)
    val out2 = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq) // run-to-run deterministic
    assert(out1.length == 50)
    out1.foreach { d =>
      assert(d.width >= 16 && d.width < 256 && d.height >= 16 && d.height < 256)
      assert(d.content_sha.length == 64)
      assert(d.n_bytes > 0 && d.frames_sampled >= 1)
    }
  }

  test("feature extraction yields fixed-dim bounded embeddings") {
    val feats = Multimodal.extractFeatures(media, dims = 16).collect()
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.forall(_.embedding.forall(v => v >= -1.0f && v <= 1.0f)))
    // content-sensitive: not all embeddings identical
    assert(feats.map(_.embedding.toSeq).distinct.length > 1)
  }

  test("frame sampling: ceil(bytes/chunk) frames, ids preserved") {
    val frames = Multimodal.sampleFrames(media, everyNth = 32)
    val perDoc = frames.groupBy("media_id").count()
    val joined = Multimodal.decode(media).toDF()
      .select(col("media_id"), col("n_bytes"))
      .join(perDoc, "media_id").collect()
    joined.foreach { r =>
      val expected = (r.getLong(1) + 31) / 32
      assert(r.getLong(2) == expected)
    }
  }
}

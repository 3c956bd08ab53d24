package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf))

  test("media table schema and deterministic metadata") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => Set("image", "audio", "video")(r.media_type)))
    assert(rows.forall(r => r.width >= 32 && r.width <= 144 && r.width % 16 == 0))
    val again = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sf)).collect()
    assert(rows.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("extractFeatures preserves rows, computes stub features, keeps partitioning") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions) // no shuffle
    val f = feats.collect()
    assert(f.length == 500)
    assert(f.forall(x => x.n_bytes > 0 && x.mean_byte > 0 && x.mean_byte < 256))
    assert(f.filter(_.media_type != "video").forall(_.n_frames == 1))
    assert(f.filter(_.media_type == "video").forall(_.n_frames >= 1))
  }

  test("resize rewrites metadata and byte budget") {
    val r = Multimodal.resize(media, 64, 64).collect()
    assert(r.forall(x => x.width == 64 && x.height == 64 && x.content.length == 64 * 64 / 64 + 1))
  }

  test("frameSample emits strided frames for video rows only") {
    val frames = Multimodal.frameSample(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.forall(f => f.offset == f.frame_idx.toLong * 64))
    val videoIds = media.filter(_.media_type == "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
  }
}

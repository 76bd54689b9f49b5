package graft

import graft.multimodal.BinaryPipeline
import graft.multimodal.BinaryPipeline.{FakeDecoder, MediaRecord}

/** Multimodal binary-column plumbing: encode → decode → checksum roundtrip
  * and the distributed `mapPartitions` feature extraction (SURVEY.md
  * north-star; the decoder itself is a disclosed stub, the plumbing is real).
  */
class BinaryPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("encode/decode roundtrip recovers header fields") {
    val payload = BinaryPipeline.encodeFake(640, 480, "hello media".getBytes("UTF-8"))
    assert(FakeDecoder.decode(payload) == ((640, 480)))
  }

  test("decode rejects payloads without the magic header") {
    intercept[IllegalArgumentException] {
      FakeDecoder.decode("JPEGnotreally".getBytes("US-ASCII"))
    }
  }

  test("checksum is deterministic and content-sensitive") {
    val a = BinaryPipeline.encodeFake(1, 1, "abc".getBytes)
    val b = BinaryPipeline.encodeFake(1, 1, "abd".getBytes)
    assert(FakeDecoder.checksum(a) == FakeDecoder.checksum(a))
    assert(FakeDecoder.checksum(a) != FakeDecoder.checksum(b))
  }

  test("extractFeatures runs distributed and preserves metadata") {
    val media = Seq(
      MediaRecord(1L, "image", BinaryPipeline.encodeFake(64, 48, Array.fill(100)(7.toByte)), "s1"),
      MediaRecord(2L, "audio", BinaryPipeline.encodeFake(1, 1, Array[Byte]()), "s2"),
      MediaRecord(3L, "video", BinaryPipeline.encodeFake(1920, 1080, "frame".getBytes), "s3"))
      .toDS()
    val feats = BinaryPipeline.extractFeatures(media, targetPartitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 64 && feats(1L).height == 48)
    assert(feats(1L).n_bytes == 112) // 12-byte header + 100 content bytes
    assert(feats(2L).n_bytes == 12)
    assert(feats(3L).width == 1920 && feats(3L).height == 1080)
    assert(feats.values.forall(_.checksum >= 0))
  }

  test("resize scales to fit, preserves aspect ratio, chains with decode") {
    val media = Seq(
      MediaRecord(1L, "image", BinaryPipeline.encodeFake(640, 480, "img".getBytes), "s"),
      MediaRecord(2L, "image", BinaryPipeline.encodeFake(100, 400, "tall".getBytes), "s"),
      MediaRecord(3L, "image", BinaryPipeline.encodeFake(32, 24, "small".getBytes), "s"))
      .toDS()
    val resized = BinaryPipeline.resizeMedia(media, maxDim = 128)
      .collect().map(r => r.media_id -> r).toMap
    assert(FakeDecoder.decode(resized(1L).payload) == ((128, 96)))   // 640x480 -> /5
    assert(FakeDecoder.decode(resized(2L).payload) == ((32, 128)))   // 100x400 -> /3.125
    assert(FakeDecoder.decode(resized(3L).payload) == ((32, 24)))    // never upscale
    assert(resized(1L).orig_width == 640 && resized(1L).orig_height == 480)
    // content survives the stub re-encode
    assert(new String(resized(1L).payload.drop(12)) == "img")
  }

  test("frame sampling emits every stride-th chunk of video payloads only") {
    val content = Array.tabulate(300)(_.toByte) // 300 bytes -> 5 chunks of 64
    val media = Seq(
      MediaRecord(1L, "video", BinaryPipeline.encodeFake(8, 8, content), "s"),
      MediaRecord(2L, "image", BinaryPipeline.encodeFake(8, 8, content), "s"))
      .toDS()
    val frames = BinaryPipeline.sampleFrames(media, frameSize = 64, stride = 2).collect()
    assert(frames.forall(_.media_id == 1L), "non-video payloads must not emit")
    // chunks 0,2,4 of ceil(300/64)=5
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.find(_.frame_no == 2).get.offset == 12L + 128)
    assert(frames.find(_.frame_no == 4).get.frame_bytes.length == 300 - 4 * 64)
  }

  test("synthetic media from documents flows end-to-end (driver-visible path)") {
    val media = BinaryPipeline.syntheticMediaFromDocuments(spark, Sf)
    val feats = BinaryPipeline.extractFeatures(media)
    val n = feats.count()
    assert(n > 0 && n == Tables.documents(spark, Sf).count())
  }

  test("mediaNearDupPairs: identical content pairs at hamming 0, distinct content does not") {
    def rec(id: Long, content: String) =
      MediaRecord(id, "image", BinaryPipeline.encodeFake(8, 8, content.getBytes("UTF-8")), "t")
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val media = Seq(
      rec(1, base),
      rec(2, base),                       // exact duplicate content
      rec(3, base + " tail"),             // near-dup: tiny suffix (hamming 4)
      rec(4, "completely different content about partition pruning and shuffles " * 3)
    ).toDS()
    val pairs = BinaryPipeline.mediaNearDupPairs(media)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)), s"exact dup not found: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      s"near-dup suffix variant not found: $pairs")
    assert(!pairs.exists(p => p._2 == 4L), s"unrelated content paired: $pairs")
  }

  test("mediaNearDup on the corpus is deterministic and hamming-bounded") {
    val a = BinaryPipeline.mediaNearDup(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    val b = BinaryPipeline.mediaNearDup(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, "not deterministic across runs")
    assert(a.nonEmpty, "corpus has exact dup docs; media face must see them")
    assert(a.forall(p => p._3 >= 0 && p._3 <= 6))
    assert(a.forall(p => p._1 < p._2), "pairs not canonical")
  }
}

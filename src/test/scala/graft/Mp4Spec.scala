package graft

import graft.multimodal.Mp4

class Mp4Spec extends SparkSpec {
  import spark.implicits._

  test("round trip: encode a valid MP4, parse its container metadata back") {
    val bytes = Mp4.encode(width = 640, height = 360, nFrames = 50, fps = 25)
    val m = Mp4.parseMeta(bytes).get
    assert(m == Mp4.Mp4Meta("isom", 1, 2000L, 640, 360, 50L))
  }

  test("v1 (64-bit time) boxes and largesize mdat both parse") {
    val v1 = Mp4.parseMeta(Mp4.encode(320, 240, 12, v1Boxes = true)).get
    assert(v1 == Mp4.Mp4Meta("isom", 1, 480L, 320, 240, 12L))
    val ls = Mp4.parseMeta(Mp4.encode(320, 240, 12, largesizeMdat = true)).get
    assert(ls == Mp4.Mp4Meta("isom", 1, 480L, 320, 240, 12L))
  }

  test("malformed and non-MP4 bytes return None, never throw") {
    assert(Mp4.parseMeta(null).isEmpty)
    assert(Mp4.parseMeta(Array.empty[Byte]).isEmpty)
    assert(Mp4.parseMeta("not an mp4 file at all........".getBytes).isEmpty)
    // JPEG/PNG/WAV payloads from the sibling codecs must not sniff as MP4
    assert(Mp4.parseMeta(graft.multimodal.Multimodal.synthJpeg(3)).isEmpty)
    assert(Mp4.parseMeta(graft.multimodal.Multimodal.synthWav(3)).isEmpty)
    // truncations of a valid file: every prefix must parse as None or
    // as a well-formed subset — never throw
    val ok = Mp4.encode(160, 90, 3)
    for (cut <- Seq(1, 7, 8, 20, ok.length / 2, ok.length - 1)) {
      Mp4.parseMeta(ok.take(cut)) // must not throw
    }
    // corrupting a box size to overflow the file must fail cleanly
    val bad = ok.clone()
    bad(ok.length - 20) = 0x7F // clobber a size byte inside moov/mdat tail
    Mp4.parseMeta(bad) // must not throw
  }

  test("synthMp4 closed form holds across the box-layout variants") {
    for (id <- 0L until 45L) {
      val m = Mp4.parseMeta(Mp4.synthMp4(id)).get
      assert(m.brand == "isom" && m.nTracks == 1)
      assert(m.width == 160 + 4 * (id % 32), s"id=$id")
      assert(m.height == 90 + 2 * (id % 18), s"id=$id")
      assert(m.nFrames == 1 + id % 48, s"id=$id")
      assert(m.durationMs == 40 * (1 + id % 48), s"id=$id")
    }
  }

  test("extractMp4Meta: distributed batched container parse through the plumbing") {
    val ds = spark.range(0, 40).as[Long].map(id => (id, Mp4.synthMp4(id)))
    val got = Mp4.extractMp4Meta(ds, batchSize = 7)
      .select($"id", $"width", $"height", $"n_frames", $"duration_ms")
      .as[(Long, Int, Int, Long, Long)].collect().toSet
    val want = (0L until 40L).map(id => (id,
      (160 + 4 * (id % 32)).toInt, (90 + 2 * (id % 18)).toInt,
      1 + id % 48, 40 * (1 + id % 48))).toSet
    assert(got == want)
  }
}

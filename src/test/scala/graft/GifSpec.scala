package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.GifCodec

/** The animated-GIF codec (m11): the identity grayscale palette makes
  * encode→decode lossless, so every decoded frame's pixel sum, the
  * frame count, dimensions, and GCE delays must replay the source
  * arithmetic exactly — the same invariant the DuckDB oracle checks
  * at query scale.
  */
class GifSpec extends SparkSpec {
  import spark.implicits._

  test("animated GIF round trip is lossless: frames, dims, delays, pixels") {
    val frames = GifCodec.decodeFrames(GifCodec.encodeAnimated(
      width = 11, height = 7, nFrames = 3,
      gray = (f, x, y) => (5 * f + 3 * x + 7 * y) % 256,
      delayCs = f => 10 + f))
    assert(frames.length == 3)
    frames.foreach { fs =>
      assert(fs.width == 11 && fs.height == 7)
      assert(fs.delayCs == 10 + fs.frameIdx)
      val expect = (for { x <- 0 until 11; y <- 0 until 7 }
        yield (5 * fs.frameIdx + 3 * x + 7 * y) % 256).map(_.toLong).sum
      assert(fs.sumGray == expect, s"frame ${fs.frameIdx}")
    }
  }

  test("synthGif matches its documented arithmetic for a sample of ids") {
    for (id <- Seq(0L, 1L, 17L, 255L, 1000L)) {
      val frames = GifCodec.decodeFrames(Multimodal.synthGif(id))
      val (w, h, n) = ((10 + id % 6).toInt, (8 + id % 5).toInt, (2 + id % 4).toInt)
      assert(frames.length == n, s"id=$id")
      frames.foreach { fs =>
        assert(fs.width == w && fs.height == h)
        assert(fs.delayCs == (4 + (id + fs.frameIdx) % 7).toInt)
        val expect = (for { x <- 0 until w; y <- 0 until h }
          yield (id + 13 * fs.frameIdx + 3 * x + 7 * y) % 256).sum
        assert(fs.sumGray == expect, s"id=$id frame ${fs.frameIdx}")
      }
    }
  }

  test("decodeFrames treats garbage as data, not an error") {
    assert(GifCodec.decodeFrames("not a gif".getBytes).isEmpty)
    assert(GifCodec.decodeFrames(Array.emptyByteArray).isEmpty)
  }

  test("m11 query: per-doc aggregates match the closed form on sf0.001") {
    val out = SparkEntry.queries("m11_gif_frames")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_frames") == 2 + id % 4)
      assert(r.getAs[Long]("width") == 10 + id % 6)
      assert(r.getAs[Long]("height") == 8 + id % 5)
      val n = (2 + id % 4).toInt
      val expDelay = (0 until n).map(f => 4 + (id + f) % 7).sum
      assert(r.getAs[Long]("total_delay_cs") == expDelay)
      val (w, h) = ((10 + id % 6).toInt, (8 + id % 5).toInt)
      val expGray = (for { f <- 0 until n; x <- 0 until w; y <- 0 until h }
        yield (id + 13 * f + 3 * x + 7 * y) % 256).sum
      assert(r.getAs[Long]("sum_gray") == expGray)
    }
  }
}

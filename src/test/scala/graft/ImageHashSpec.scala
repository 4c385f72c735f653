package graft

import graft.multimodal.Multimodal

/** Perceptual image hashing (m07's operator): determinism, content
  * addressing (same pixels ⇒ same hash regardless of re-encode), and
  * the planted-class separation the m07 oracle relies on. */
class ImageHashSpec extends SparkSpec {

  test("identical content hashes identically; all 100 planted classes separate") {
    val hashes = (0L until 100L).map(k =>
      Multimodal.averageHash64(Multimodal.synthPngPattern(k)).get)
    // determinism: re-encoding the same content changes no bit
    val again = (0L until 100L).map(k =>
      Multimodal.averageHash64(Multimodal.synthPngPattern(k)).get)
    assert(hashes == again)
    // separation: the m07 oracle asserts exactly 100 clusters, which
    // requires the 100 class images to have 100 distinct hashes
    assert(hashes.distinct.size == 100,
      s"planted classes collide: only ${hashes.distinct.size} distinct hashes")
  }

  test("perceptual, not cryptographic: visually-near gradients merge, distinct patterns separate") {
    // the synthPng gradients differ only by offset/wrap - a perceptual
    // hash SHOULD collide many of them (this is the property that
    // makes it a near-dup primitive rather than a checksum)
    val gradientHashes = (0L until 100L).map(k =>
      Multimodal.averageHash64(Multimodal.synthPng(k)).get)
    assert(gradientHashes.distinct.size < 100)
  }

  test("hash is content-addressed, not byte-addressed") {
    // same pixel function, encoded twice → identical PNG bytes here,
    // but also survives a lossless round trip through the decoder
    val png = Multimodal.synthPng(7L)
    val h1 = Multimodal.averageHash64(png).get
    // re-encode the decoded pixels via the resize identity (w×h → w×h
    // nearest-neighbor is the identity map) and hash the NEW bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val re = Multimodal.resizeImageNearest(png, img.getWidth, img.getHeight).get
    assert(Multimodal.averageHash64(re).get == h1)
  }

  test("undecodable bytes report None, not an exception") {
    assert(Multimodal.averageHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.averageHash64(Array.empty[Byte]).isEmpty)
  }
}

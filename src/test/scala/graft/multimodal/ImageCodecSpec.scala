package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import graft.SparkSpec
import ImageCodec.ImageStats

/** Real-format decode: one known 3×2 image is encoded by hand into the
  * three supported containers (binary P6, ASCII P3, bottom-up padded
  * 24-bit BMP) and every encoding must decode to the identical,
  * format-independent [[ImageStats]] — including the checksum, which
  * proves BMP's BGR order, bottom-up rows and 4-byte padding are
  * actually normalized rather than summed over raw bytes.
  */
class ImageCodecSpec extends SparkSpec {

  // row-major top-down pixels: (r,g,b) per cell
  private val px: Array[Array[(Int, Int, Int)]] = Array(
    Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
    Array((10, 20, 30), (40, 50, 60), (70, 80, 90)))
  private val W = 3
  private val H = 2
  private val sums = (375L, 405L, 435L) // column sums of px, by channel

  private def p6: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n$W $H\n255\n".getBytes(US_ASCII))
    for (row <- px; (r, g, b) <- row) { out.write(r); out.write(g); out.write(b) }
    out.toByteArray
  }

  private def p3: Array[Byte] = {
    val body = px.map(_.map { case (r, g, b) => s"$r $g $b" }.mkString(" "))
      .mkString("\n")
    s"P3\n# a comment, legal anywhere in the header\n$W $H\n255\n$body\n"
      .getBytes(US_ASCII)
  }

  private def bmp(topDown: Boolean): Array[Byte] = {
    val stride = ((W * 3 + 3) / 4) * 4
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    out.write('B'); out.write('M')
    u32(54 + stride * H) // file size
    u32(0) // reserved
    u32(54) // pixel data offset
    u32(40) // BITMAPINFOHEADER
    u32(W)
    u32(if (topDown) -H else H)
    u16(1) // planes
    u16(24) // bpp
    u32(0) // BI_RGB
    u32(stride * H); u32(2835); u32(2835); u32(0); u32(0)
    val rows = if (topDown) px else px.reverse // storage order
    for (row <- rows) {
      for ((r, g, b) <- row) { out.write(b); out.write(g); out.write(r) }
      var pad = stride - W * 3
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    out.toByteArray
  }

  test("P6, P3 and BMP encodings of the same image decode identically") {
    val expected = ImageCodec.decodeImage(p6).get
    assert((expected.width, expected.height) === ((W, H)))
    assert((expected.sumR, expected.sumG, expected.sumB) === sums)
    assert(ImageCodec.decodeImage(p3) === Some(expected))
    assert(ImageCodec.decodeImage(bmp(topDown = false)) === Some(expected))
    // negative-height BMPs store rows top-down; same normalized result
    assert(ImageCodec.decodeImage(bmp(topDown = true)) === Some(expected))
  }

  test("corrupt and unsupported payloads return None, never throw") {
    assert(ImageCodec.decodeImage("not an image at all".getBytes(US_ASCII)).isEmpty)
    assert(ImageCodec.decodeImage(Array.empty[Byte]).isEmpty)
    // P6 truncated mid-pixel-data
    assert(ImageCodec.decodeImage(p6.dropRight(1)).isEmpty)
    // P6 declaring 2-byte samples (maxval > 255)
    assert(ImageCodec.decodeImage(s"P6\n$W $H\n65535\n".getBytes(US_ASCII)
      ++ Array.fill(W * H * 6)(0.toByte)).isEmpty)
    // P3 with a sample over maxval
    assert(ImageCodec.decodeImage("P3\n1 1\n255\n256 0 0\n".getBytes(US_ASCII)).isEmpty)
    // BMP with unsupported depth (32bpp) and with a compressed format
    val b32 = bmp(topDown = false); b32(28) = 32
    assert(ImageCodec.decodeImage(b32).isEmpty)
    val bComp = bmp(topDown = false); bComp(30) = 1 // BI_RLE8
    assert(ImageCodec.decodeImage(bComp).isEmpty)
    // BMP whose header promises more pixel data than the payload holds
    assert(ImageCodec.decodeImage(bmp(topDown = false).dropRight(4)).isEmpty)
  }

  test("extractFeatures decodes image payloads for real and falls back for text") {
    import Multimodal._
    val rows = Seq(
      MediaRow(1L, p6, MediaMeta("image", -1, -1)),
      MediaRow(2L, bmp(topDown = false), MediaMeta("image", 999, 999)),
      MediaRow(3L, "plain text payload".getBytes(US_ASCII), MediaMeta("video", -1, -1)))
    val ds = spark.createDataset(rows)(rowEnc)
    val feats = extractFeatures(ds).collect().sortBy(_.id)

    val expected = ImageCodec.decodeImage(p6).get.pixelChecksum
    // image rows: header dimensions (even against wrong declared meta),
    // one frame, the normalized-pixel checksum — identical across formats
    assert((feats(0).width, feats(0).height, feats(0).nFrames) === ((W, H, 1)))
    assert((feats(1).width, feats(1).height, feats(1).nFrames) === ((W, H, 1)))
    assert(feats(0).checksum === expected)
    assert(feats(1).checksum === expected)
    assert(feats(0).byteLen !== feats(1).byteLen) // containers differ; pixels agree
    // text row: byte-stats fallback, unchanged behavior
    val (w, h, fr, ck) = Multimodal.byteStatsFallback(rows(2).payload, rows(2).meta)
    assert((feats(2).width, feats(2).height, feats(2).nFrames, feats(2).checksum)
      === ((w, h, fr, ck)))
    // batch path parity holds with mixed image/text payloads
    val batched = extractFeaturesBatched(ds, 2).collect().sortBy(_.id)
    assert(batched.toSeq === feats.toSeq)
  }
}

package graft.multimodal

/** Real decoders for two public image container formats that need no
  * codec library — netpbm PPM (`P6` binary and `P3` ASCII,
  * https://netpbm.sourceforge.net/doc/ppm.html) and uncompressed
  * 24-bit BMP (`BM` + BITMAPINFOHEADER) — producing
  * format-INDEPENDENT pixel statistics: header dimensions,
  * per-channel sums, and a checksum over the pixels in row-major
  * top-down RGB order. The same image encoded as P6, P3 or BMP
  * decodes to identical [[ImageStats]] (spec-enforced), because the
  * decoder normalizes each format's storage quirks: BMP's bottom-up
  * rows, BGR channel order and 4-byte row padding; P3's ASCII
  * samples.
  *
  * Both formats are a header plus raw samples, so "decoding" is plain
  * byte arithmetic — which is the point: the batched Spark plumbing
  * in [[Multimodal]] gets a REAL decoder to amortize, while payloads
  * that are not images (the harness's text bytes) simply return None
  * and fall back to byte statistics.
  */
object ImageCodec {

  /** Format-independent decoded-image summary. `pixelChecksum` is the
    * ×31 polynomial over (r,g,b) bytes in row-major top-down order. */
  final case class ImageStats(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, pixelChecksum: Long)

  /** Sniff the magic bytes and decode; None = not a supported image
    * (corrupt headers and truncated pixel data also return None — a
    * malformed payload must never crash a 100-TB scan). */
  def decodeImage(payload: Array[Byte]): Option[ImageStats] =
    if (payload.length >= 2 && payload(0) == 'P' &&
        (payload(1) == '6' || payload(1) == '3')) decodePpm(payload)
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      decodeBmp(payload)
    else None

  // ---------------------------------------------------------------- PPM

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Reads whitespace/comment-separated unsigned decimal tokens per the
    * netpbm spec: '#' starts a comment running to end-of-line and may
    * appear anywhere whitespace may. Returns -1 at end/overflow. */
  private final class PpmTokens(bytes: Array[Byte], private var pos: Int) {
    def dataPos: Int = pos
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
          (inComment || isWs(bytes(pos)) || bytes(pos) == '#')) {
        if (inComment) { if (bytes(pos) == '\n' || bytes(pos) == '\r') inComment = false }
        else if (bytes(pos) == '#') inComment = true
        pos += 1
      }
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9') return -1
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return -1
        pos += 1
      }
      v.toInt
    }
  }

  private def decodePpm(b: Array[Byte]): Option[ImageStats] = {
    val ascii = b(1) == '3'
    val t = new PpmTokens(b, 2)
    val w = t.nextInt(); val h = t.nextInt(); val maxval = t.nextInt()
    // one-byte samples only: maxval 256..65535 means two-byte samples
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    val nSamples = w.toLong * h * 3
    if (nSamples > Int.MaxValue) return None
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var ck = 0L
    if (ascii) {
      var i = 0L
      while (i < nSamples) {
        val r = t.nextInt(); val g = t.nextInt(); val bl = t.nextInt()
        if (r < 0 || g < 0 || bl < 0 || r > maxval || g > maxval || bl > maxval)
          return None
        sumR += r; sumG += g; sumB += bl
        ck = (ck * 31 + r) * 31 + g; ck = ck * 31 + bl
        i += 3
      }
    } else {
      // binary: exactly ONE whitespace byte after maxval, then raw RGB
      if (t.dataPos >= b.length || !isWs(b(t.dataPos))) return None
      val data = t.dataPos + 1
      if (data.toLong + nSamples > b.length) return None
      var i = 0
      val n = nSamples.toInt
      while (i < n) {
        val r = b(data + i) & 0xff
        val g = b(data + i + 1) & 0xff
        val bl = b(data + i + 2) & 0xff
        sumR += r; sumG += g; sumB += bl
        ck = (ck * 31 + r) * 31 + g; ck = ck * 31 + bl
        i += 3
      }
    }
    Some(ImageStats(w, h, sumR, sumG, sumB, ck))
  }

  // ---------------------------------------------------------------- BMP

  private def decodeBmp(b: Array[Byte]): Option[ImageStats] = {
    if (b.length < 54) return None
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val dataOff = i32(10)
    val dibSize = i32(14)
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = u16(28)
    val comp = i32(30)
    // BITMAPINFOHEADER or its extensions; BI_RGB 24-bit only
    // (hRaw == Int.MinValue has no positive magnitude — reject it too)
    if (dibSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      bpp != 24 || comp != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0 // negative height = rows stored top-down
    // stride in Long: an adversarial header width makes w*3 wrap in Int,
    // a negative stride, and a bounds check that can't save the pixel loop
    val strideL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    // one row alone can't exceed the buffer — and with strideL bounded
    // by b.length, strideL * h (< 2^31 · 2^31) can't overflow Long
    // either, so the area check below is itself overflow-safe
    if (strideL > b.length) return None
    if (dataOff < 54 || dataOff.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt // safe: strideL <= b.length fits in Int
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var ck = 0L
    var row = 0
    while (row < h) {
      // emit in top-down order regardless of storage order
      val srcRow = if (topDown) row else h - 1 - row
      val base = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val bl = b(base + x * 3) & 0xff // stored B,G,R
        val g = b(base + x * 3 + 1) & 0xff
        val r = b(base + x * 3 + 2) & 0xff
        sumR += r; sumG += g; sumB += bl
        ck = (ck * 31 + r) * 31 + g; ck = ck * 31 + bl
        x += 1
      }
      row += 1
    }
    Some(ImageStats(w, h, sumR, sumG, sumB, ck))
  }
}

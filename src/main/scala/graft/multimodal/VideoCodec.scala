package graft.multimodal

/** Real decoder for the public YUV4MPEG2 (`.y4m`) raw-video container
  * (mjpegtools, https://wiki.multimedia.cx/index.php/YUV4MPEG2) — the
  * video sibling of [[ImageCodec]]/[[AudioCodec]]. Y4M is an ASCII
  * stream header plus uncompressed planar frames, so "decoding" is a
  * header parse and byte arithmetic — no codec library — and the
  * stats are exact integers a DuckDB oracle can replay from the frame
  * bytes' arithmetic definition.
  *
  * Supported colorspaces: C420 (+jpeg/mpeg2 variants — same layout
  * size), C422, C444, Cmono; absent C defaults to 420 (the spec
  * default). Unknown stream/frame parameters are SKIPPED (the spec's
  * X extension rule). Malformed payloads — bad magic, unparsable
  * dimensions, truncated frames — return None, never throw.
  */
object VideoCodec {

  /** Exact-integer decoded-video summary. `lumaSum` is Σ of the Y
    * (first) plane bytes over every frame; `byteChecksum` the ×31
    * polynomial over ALL frame bytes (luma + chroma) in stream order;
    * `durationMs` = nFrames·1000·fpsDen / fpsNum, integer division.
    */
  final case class VideoStats(width: Int, height: Int,
      fpsNum: Int, fpsDen: Int, nFrames: Long, durationMs: Long,
      lumaSum: Long, byteChecksum: Long)

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Parsed stream header: dims, frame rate, frame/luma byte sizes and
    * the offset of the first FRAME marker.
    */
  private final case class Y4mHeader(w: Int, h: Int, fn: Int, fd: Int,
      frameBytes: Int, luma: Int, firstFrame: Int)

  private def parseHeader(payload: Array[Byte]): Option[Y4mHeader] = {
    if (payload.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (payload(i) != Magic(i)) return None
      i += 1
    }
    // The magic must be a complete token: a separator (space before
    // params, or the header-ending newline) must follow, else
    // "YUV4MPEG2W64 ..." would parse as a valid stream.
    if (payload(i) != ' '.toByte && payload(i) != '\n'.toByte) return None
    // stream header: space-separated params up to '\n'
    val nl = payload.indexOf('\n'.toByte, i)
    if (nl < 0) return None
    val header = new String(payload, i, nl - i, "US-ASCII")
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var cs = "420"
    header.trim.split("\\s+").filter(_.nonEmpty).foreach { p =>
      try p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val Array(a, b) = p.substring(1).split(":", 2)
          fn = a.toInt; fd = b.toInt
        case 'C' => cs = p.substring(1)
        case _   => () // I/A/X... skipped (the extension rule)
      } catch { case _: RuntimeException => return None }
    }
    if (w < 1 || h < 1 || w > 8192 || h > 8192) return None
    if (fn < 1 || fd < 1) return None
    val frameBytes: Long = cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        if (w % 2 != 0 || h % 2 != 0) return None
        w.toLong * h + 2L * (w / 2) * (h / 2)
      case "422" =>
        if (w % 2 != 0) return None
        w.toLong * h * 2
      case "444"  => w.toLong * h * 3
      case "mono" => w.toLong * h
      case _      => return None
    }
    if (frameBytes > Int.MaxValue) return None
    Some(Y4mHeader(w, h, fn, fd, frameBytes.toInt, w * h, nl + 1))
  }

  private val FrameTag = "FRAME".getBytes("US-ASCII")

  /** Walk the frames, calling `onFrame(frameIdx, bodyOffset)` per
    * frame; returns the frame count, or None on any malformation.
    */
  private def walkFrames(payload: Array[Byte], hd: Y4mHeader)
      (onFrame: (Long, Int) => Unit): Option[Long] = {
    var off = hd.firstFrame
    var nFrames = 0L
    // CONTRACT: a header-only stream (zero FRAME markers) decodes to
    // None, the same as a malformed payload. Zero-frame Y4M is legal
    // per the format, but a video document with no frames has no
    // stats to extract — the engine deliberately classifies it as
    // undecodable (decoded=false) rather than inventing a 0-frame
    // VideoStats row whose durationMs/lumaSum are vacuous.
    while (off < payload.length) {
      if (off + FrameTag.length > payload.length) return None
      var j = 0
      while (j < FrameTag.length) {
        if (payload(off + j) != FrameTag(j)) return None
        j += 1
      }
      val fnl = payload.indexOf('\n'.toByte, off + FrameTag.length)
      if (fnl < 0) return None
      val body = fnl + 1
      if (body.toLong + hd.frameBytes > payload.length) return None // truncated
      onFrame(nFrames, body)
      nFrames += 1
      off = body + hd.frameBytes
    }
    if (nFrames == 0) None else Some(nFrames)
  }

  def decodeY4m(payload: Array[Byte]): Option[VideoStats] =
    parseHeader(payload).flatMap { hd =>
      var lumaSum = 0L
      var checksum = 0L
      walkFrames(payload, hd) { (_, body) =>
        var k = 0
        while (k < hd.frameBytes) {
          val v = payload(body + k) & 0xff
          if (k < hd.luma) lumaSum += v
          checksum = checksum * 31 + v
          k += 1
        }
      }.map(n => VideoStats(hd.w, hd.h, hd.fn, hd.fd, n,
        n * 1000L * hd.fd / hd.fn, lumaSum, checksum))
    }

  /** Per-frame luma stats for every `step`-th frame — the REAL
    * frame-sampling primitive (the decode-per-sampled-frame shape of
    * video preprocessing): (frameIdx, lumaSum) for frames
    * 0, step, 2·step, … Skipped frames are never byte-scanned beyond
    * the marker walk. None on any malformation, like [[decodeY4m]].
    */
  def sampleFrameLuma(payload: Array[Byte], step: Int): Option[Seq[(Long, Long)]] = {
    require(step >= 1, s"step must be >= 1, got $step")
    parseHeader(payload).flatMap { hd =>
      val out = Seq.newBuilder[(Long, Long)]
      walkFrames(payload, hd) { (idx, body) =>
        if (idx % step == 0) {
          var s = 0L
          var k = 0
          while (k < hd.luma) { s += payload(body + k) & 0xff; k += 1 }
          out += ((idx, s))
        }
      }.map(_ => out.result())
    }
  }

  /** Y4M encoder (C420) — the fixture/sink side of the round-trip.
    * Each frame is the full w·h + 2·(w/2)·(h/2) plane bytes.
    */
  def encodeY4m420(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"bad dims ${w}x$h")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    frames.foreach(f => require(f.length == frameBytes,
      s"frame must be $frameBytes bytes, got ${f.length}"))
    val head = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      head.length + frames.map(_.length + 6).sum)
    out.write(head)
    frames.foreach { f => out.write("FRAME\n".getBytes("US-ASCII")); out.write(f) }
    out.toByteArray
  }
}

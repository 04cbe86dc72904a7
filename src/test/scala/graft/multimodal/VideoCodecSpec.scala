package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.VideoCodec.{decodeY4m, encodeY4m420}

/** The Y4M decoder against hand-computed stats (the AudioCodecSpec
  * doctrine: expected values come from the frame byte lists by hand,
  * never from the codec). Malformed streams return None, never throw.
  */
class VideoCodecSpec extends AnyFunSuite {

  test("C420 roundtrip recovers hand-computed exact stats") {
    // 2x2: luma 4 bytes + chroma 2x(1x1) = 6 bytes per frame
    val f0 = Array[Byte](10, 20, 30, 40, 1, 2)
    val f1 = Array[Byte](5, 5, 5, 5, 3, 4)
    val got = decodeY4m(encodeY4m420(2, 2, 25, 1, Seq(f0, f1))).get
    assert(got.width === 2 && got.height === 2)
    assert(got.fpsNum === 25 && got.fpsDen === 1)
    assert(got.nFrames === 2L)
    assert(got.durationMs === 80L) // 2 * 1000 / 25
    assert(got.lumaSum === (10 + 20 + 30 + 40 + 5 + 5 + 5 + 5).toLong)
    // checksum folds ALL bytes (luma + chroma) in stream order
    val expect = (f0 ++ f1).foldLeft(0L)((c, b) => c * 31 + (b & 0xff))
    assert(got.byteChecksum === expect)
  }

  test("header parameters: defaults, unknown params skipped, colorspace sizes") {
    def stream(header: String, frames: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write((header + "\n").getBytes("US-ASCII"))
      frames.foreach { f =>
        out.write("FRAME\n".getBytes("US-ASCII")); out.write(f)
      }
      out.toByteArray
    }
    // no C param -> 420 (the spec default); X/I/A params skipped
    val def420 = stream("YUV4MPEG2 W2 H2 F30:1 Ip A1:1 Xextension=1",
      Array[Byte](1, 2, 3, 4, 5, 6))
    assert(decodeY4m(def420).get.nFrames === 1L)
    // mono: exactly w*h bytes per frame
    val mono = stream("YUV4MPEG2 W2 H2 F30:1 Cmono", Array[Byte](7, 8, 9, 10))
    assert(decodeY4m(mono).get.lumaSum === 34L)
    // 444: 3*w*h
    val c444 = stream("YUV4MPEG2 W1 H1 F30:1 C444", Array[Byte](9, 1, 1))
    assert(decodeY4m(c444).get.lumaSum === 9L)
    // FRAME params after the tag are allowed
    val fparam = stream("YUV4MPEG2 W2 H2 F30:1 Cmono")
    val out = new java.io.ByteArrayOutputStream()
    out.write(fparam)
    out.write("FRAME Xsomething\n".getBytes("US-ASCII"))
    out.write(Array[Byte](1, 1, 1, 1))
    assert(decodeY4m(out.toByteArray).get.nFrames === 1L)
  }

  test("sampleFrameLuma decodes every step-th frame's luma only") {
    val f = (v: Int) => Array.fill[Byte](6)(v.toByte) // 2x2 C420: 4 luma + 2 chroma
    val stream = encodeY4m420(2, 2, 25, 1, Seq(f(1), f(2), f(3), f(4), f(5)))
    // step 2 -> frames 0, 2, 4; luma sum = 4 * v
    assert(VideoCodec.sampleFrameLuma(stream, 2).get ===
      Seq((0L, 4L), (2L, 12L), (4L, 20L)))
    // step 1 -> all frames
    assert(VideoCodec.sampleFrameLuma(stream, 1).get.map(_._1) ===
      Seq(0L, 1L, 2L, 3L, 4L))
    // malformed propagates as None here too
    assert(VideoCodec.sampleFrameLuma(stream.dropRight(1), 2).isEmpty)
    intercept[IllegalArgumentException](VideoCodec.sampleFrameLuma(stream, 0))
  }

  test("malformed streams return None, never throw") {
    val good = encodeY4m420(2, 2, 25, 1, Seq(Array[Byte](1, 2, 3, 4, 5, 6)))
    assert(decodeY4m(Array.empty[Byte]).isEmpty)
    assert(decodeY4m("JUNK4MPEG2 W2 H2 F25:1\n".getBytes).isEmpty)
    assert(decodeY4m(good.dropRight(2)).isEmpty)        // truncated frame
    assert(decodeY4m(good.take(good.length - 7)).isEmpty) // frame tag cut
    def hdr(s: String) = decodeY4m((s + "\nFRAME\n").getBytes ++ new Array[Byte](6))
    assert(hdr("YUV4MPEG2 W0 H2 F25:1").isEmpty)   // zero width
    assert(hdr("YUV4MPEG2 W2 H2 F0:1").isEmpty)    // zero fps
    assert(hdr("YUV4MPEG2 W2 H2 F25:1 Cweird").isEmpty) // unknown colorspace
    assert(hdr("YUV4MPEG2 WX H2 F25:1").isEmpty)   // unparsable int
    assert(hdr("YUV4MPEG2 W3 H2 F25:1").isEmpty)   // odd width under 420
    // zero frames is not a video (the documented contract: a legal
    // header-only stream classifies as undecodable, decoded=false)
    assert(decodeY4m("YUV4MPEG2 W2 H2 F25:1\n".getBytes).isEmpty)
    // the magic must be a complete token: a run-on header is rejected
    assert(decodeY4m(("YUV4MPEG2W2 H2 F25:1\nFRAME\n").getBytes
      ++ new Array[Byte](6)).isEmpty)
    // junk fuzz must not throw
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(b)
      decodeY4m(b)
    }
  }
}

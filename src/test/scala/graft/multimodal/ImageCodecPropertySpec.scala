package graft.multimodal

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property coverage for the real image decoders: arbitrary bytes — the
  * 100-TB media-scan reality — must never throw, and any well-formed
  * P6 image must decode back to the exact stats of the pixels that
  * were encoded (decode really reads the samples, not just headers).
  */
object ImageCodecPropertySpec extends Properties("imagecodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val junk: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  property("never throws on arbitrary bytes") = forAll(junk) { bytes =>
    ImageCodec.decodeImage(bytes) // may be Some or None, must not throw
    true
  }

  // adversarial: junk AFTER a valid magic, exercising every header parse
  property("never throws behind a valid magic") =
    forAll(Gen.oneOf("P6", "P3", "BM"), junk) { (magic, tail) =>
      ImageCodec.decodeImage(magic.getBytes("US-ASCII") ++ tail)
      true
    }

  // random bytes essentially never satisfy the BMP header gate with
  // huge dims — pin the overflow shapes explicitly: w·3 wrapping Int,
  // and stride·h wrapping Long past the area check
  property("adversarial BMP headers with overflowing dims decode to None, never throw") = {
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](64)
      b(0) = 'B'; b(1) = 'M'
      def put(o: Int, v: Int): Unit = {
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
        b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
      }
      put(10, 54); put(14, 40); put(18, w); put(22, h)
      b(28) = 24; put(30, 0)
      b
    }
    forAll(Gen.oneOf(
      (Int.MaxValue, Int.MaxValue), (Int.MaxValue, 1), (0x55555556, 3),
      (1, Int.MaxValue), (Int.MaxValue, Int.MinValue))) { case (w, h) =>
      ImageCodec.decodeImage(bmp(w, h)).isEmpty
    }
  }

  private val image: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 12)
    h <- Gen.chooseNum(1, 12)
    px <- Gen.containerOfN[Array, Byte](w * h * 3,
      Gen.chooseNum(0, 255).map(_.toByte))
  } yield (w, h, px)

  property("P6 encode/decode round-trips exact pixel stats") =
    forAll(image) { case (w, h, px) =>
      val encoded = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
      val got = ImageCodec.decodeImage(encoded)
      val rgb = px.map(_ & 0xff)
      def channel(off: Int) =
        rgb.indices.collect { case i if i % 3 == off => rgb(i).toLong }.sum
      val ck = rgb.foldLeft(0L)((a, b) => a * 31 + b)
      got.contains(ImageCodec.ImageStats(
        w, h, channel(0), channel(1), channel(2), ck))
    }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AudioCodec.{decodeWav, encodeWavPcm16, AudioStats}

/** The WAV decoder against hand-computed stats: the encode side is the
  * fixture, but every expected value below is computed BY HAND from
  * the sample lists (never by calling the codec back), so an encode
  * bug and a decode bug cannot cancel out. Malformed containers — the
  * 100-TB media-scan reality — must return None, never throw.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("PCM-16 mono roundtrip recovers hand-computed exact stats") {
    val samples = Array[Short](100, -5, 30, -1, -2)
    val got = decodeWav(encodeWavPcm16(8000, 1, samples)).get
    // sumAbs = 100+5+30+1+2; zc over signs (+,-,+,-,-) = 3 changes;
    // checksum = ((((100*31-5)*31+30)*31-1)*31-2)
    assert(got === AudioStats(8000, 1, 5L, 0L, 138L, 3L, 92231942L))
    // duration: 8000 frames at 8000 Hz = exactly 1000 ms
    val sec = decodeWav(encodeWavPcm16(8000, 1, Array.fill[Short](8000)(7))).get
    assert(sec.nSamples === 8000L && sec.durationMs === 1000L)
    assert(sec.zeroCrossings === 0L && sec.sumAbs === 7L * 8000L)
  }

  test("stereo: sumAbs/checksum interleave all channels, crossings follow channel 0") {
    val interleaved = Array[Short](100, -5, 30, -1, -2, 7) // 3 frames x 2ch
    val got = decodeWav(encodeWavPcm16(8000, 2, interleaved)).get
    assert(got.channels === 2 && got.nSamples === 3L)
    assert(got.sumAbs === 145L)
    // channel 0 sequence (100, 30, -2): one sign change
    assert(got.zeroCrossings === 1L)
    assert(got.sampleChecksum === 92231942L * 31 + 7)
  }

  test("8-bit samples center at 128 and scale to the 16-bit metric") {
    // hand-built container: fmt (code 1, 1ch, 4000 Hz, 8 bit) + data [128, 255, 0]
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    tag("RIFF"); le32(36 + 4); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(1); le32(4000); le32(4000); le16(1); le16(8)
    tag("data"); le32(3); out.write(128); out.write(255); out.write(0); out.write(0) // +pad
    val got = decodeWav(out.toByteArray).get
    // v = (x-128)<<8: [0, 32512, -32768]; zc: (0→32512) none, (→-32768) one
    assert(got === AudioStats(4000, 1, 3L, 0L, 65280L,
      1L, (0L * 31 + 32512L) * 31 - 32768L))
  }

  test("unknown chunks are skipped with word alignment") {
    val plain = encodeWavPcm16(8000, 1, Array[Short](5, -5))
    // splice a LIST chunk with an ODD size (3 -> 1 pad byte) after fmt
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(plain, 0, 36) // RIFF..WAVE + fmt chunk
    spliced.write("LIST".getBytes("US-ASCII"))
    spliced.write(Array[Byte](3, 0, 0, 0)); spliced.write("abc".getBytes); spliced.write(0)
    spliced.write(plain, 36, plain.length - 36) // data chunk
    assert(decodeWav(spliced.toByteArray) === decodeWav(plain))
  }

  test("malformed containers return None, never throw") {
    val good = encodeWavPcm16(8000, 1, Array[Short](1, 2, 3, 4))
    assert(decodeWav(Array.empty[Byte]).isEmpty)
    assert(decodeWav("RIFFxxxxWAVX".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(decodeWav(good.dropRight(3)).isEmpty)       // truncated data
    val nonPcm = good.clone(); nonPcm(20) = 3          // fmt code 3 (float)
    assert(decodeWav(nonPcm).isEmpty)
    val badBits = good.clone(); badBits(34) = 12       // 12-bit
    assert(decodeWav(badBits).isEmpty)
    val zeroCh = good.clone(); zeroCh(22) = 0
    assert(decodeWav(zeroCh).isEmpty)
    // data before fmt: move is awkward to splice; instead drop fmt
    val noFmt = new java.io.ByteArrayOutputStream()
    noFmt.write(good, 0, 12); noFmt.write(good, 36, good.length - 36)
    assert(decodeWav(noFmt.toByteArray).isEmpty)
    // arbitrary junk must not throw
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(b)
      decodeWav(b)
    }
  }

  test("encoder refuses zero samples (round-trip totality)") {
    // decodeWav rejects an empty data chunk, so the encoder must
    // refuse to produce one — encode∘decode stays total. (The sibling
    // overflow guard at (Int.MaxValue-44)/2 samples cannot be
    // exercised without a >2 GiB allocation; its boundary is exact:
    // cap·2 + 44 == Int.MaxValue - 1, so samples.length*2 never wraps.)
    intercept[IllegalArgumentException] {
      AudioCodec.encodeWavPcm16(8000, 1, Array.empty[Short])
    }
    assert(((Int.MaxValue - 44) / 2).toLong * 2L + 44L <= Int.MaxValue.toLong)
  }
}

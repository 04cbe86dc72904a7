package graft.multimodal

/** Real decoder for the public RIFF/WAVE container carrying
  * uncompressed PCM (format code 1, 8- or 16-bit, any channel count —
  * https://www.rfc-editor.org/rfc/rfc2361 and the original IBM/MS
  * RIFF spec): the audio sibling of [[ImageCodec]]. A WAV file is a
  * header plus raw samples, so "decoding" is plain byte arithmetic —
  * no codec library — and the stats are exact integers (no float),
  * so a DuckDB oracle can replay them from the waveform's arithmetic
  * definition without ever seeing the bytes.
  *
  * Chunk handling follows the container rules a real corpus needs:
  * unknown chunks (LIST, fact, cue …) are SKIPPED, chunk sizes are
  * word-aligned (odd sizes consume a pad byte), and `fmt ` must
  * precede `data`. Malformed payloads (bad magic, truncated chunks,
  * non-PCM format codes, absurd headers) return None — a malformed
  * payload must never crash a 100-TB scan.
  */
object AudioCodec {

  /** Exact-integer decoded-audio summary.
    *
    *   - `nSamples`: frames per channel;
    *   - `durationMs`: 1000·nSamples / sampleRate, integer division;
    *   - `sumAbs`: Σ |sample| over ALL channels (16-bit scale: 8-bit
    *     samples are centered at 128 and scaled ×256 so the metric is
    *     bit-depth comparable);
    *   - `zeroCrossings`: sign changes along CHANNEL 0 only (a
    *     well-defined single sequence whatever the channel count),
    *     where "negative" vs "non-negative" is the sign;
    *   - `sampleChecksum`: ×31 polynomial over the 16-bit-scale
    *     samples in interleaved order.
    */
  final case class AudioStats(sampleRate: Int, channels: Int,
      nSamples: Long, durationMs: Long, sumAbs: Long,
      zeroCrossings: Long, sampleChecksum: Long)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** Sniff + decode; None = not a PCM WAV this decoder serves. */
  def decodeWav(payload: Array[Byte]): Option[AudioStats] = {
    if (payload.length < 44) return None
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    var off = 12
    var haveFmt = false
    var channels = 0
    var sampleRate = 0
    var bits = 0
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val size = le32(payload, off + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      val body = off + 8
      if (body + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmtCode = le16(payload, body)
          if (fmtCode != 1) return None // PCM only (no float/ADPCM/extensible)
          channels = le16(payload, body + 2)
          sampleRate = le32(payload, body + 4).toInt
          bits = le16(payload, body + 14)
          if (channels < 1 || channels > 64) return None
          if (sampleRate < 1 || sampleRate > 1000000) return None
          if (bits != 8 && bits != 16) return None
          haveFmt = true
        case "data" =>
          if (!haveFmt) return None
          return decodeData(payload, body, size.toInt, channels, sampleRate, bits)
        case _ => () // LIST / fact / cue / bext ... skipped
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None // no data chunk
  }

  private def decodeData(b: Array[Byte], body: Int, size: Int,
      channels: Int, sampleRate: Int, bits: Int): Option[AudioStats] = {
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    if (size < frameBytes || size % frameBytes != 0) return None
    val nFrames = size / frameBytes
    var sumAbs = 0L
    var checksum = 0L
    var zc = 0L
    var prevNeg = false
    var first = true
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val off = body + (f * channels + c) * bytesPerSample
        // 16-bit scale: 8-bit unsigned centers at 128 and scales x256
        val v: Int =
          if (bits == 16) le16(b, off).toShort.toInt
          else ((b(off) & 0xff) - 128) << 8
        sumAbs += math.abs(v)
        checksum = checksum * 31 + v
        if (c == 0) {
          val neg = v < 0
          if (!first && neg != prevNeg) zc += 1
          prevNeg = neg
          first = false
        }
        c += 1
      }
      f += 1
    }
    Some(AudioStats(sampleRate, channels, nFrames.toLong,
      nFrames.toLong * 1000L / sampleRate, sumAbs, zc, checksum))
  }

  /** PCM-16 little-endian encoder — the fixture/sink side of the
    * round-trip (specs and the oracle query synthesize waveforms,
    * encode here, and the decode path must recover the exact stats).
    * `samples` is channel-interleaved.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"interleaved sample count ${samples.length} not divisible by $channels")
    // Round-trip totality: decodeData rejects an empty data chunk, so
    // refusing to ENCODE zero samples keeps encode∘decode total; and
    // samples.length*2 must not overflow Int (negative array size /
    // corrupt RIFF+data size fields past ~1G samples).
    require(samples.nonEmpty,
      "cannot encode a 0-sample WAV (decodeWav rejects an empty data chunk)")
    require(samples.length <= (Int.MaxValue - 44) / 2,
      s"sample count ${samples.length} overflows the 32-bit RIFF size model")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def putTag(off: Int, s: String): Unit = {
      out(off) = s(0).toByte; out(off + 1) = s(1).toByte
      out(off + 2) = s(2).toByte; out(off + 3) = s(3).toByte
    }
    def put32(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); put32(4, 36L + dataBytes); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(32, channels * 2); put16(34, 16)      // block align, bits
    putTag(36, "data"); put32(40, dataBytes.toLong)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }
}

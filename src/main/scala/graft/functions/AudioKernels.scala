package graft.functions

/** Sample-level WAV PCM codec + audio-analysis kernels — the audio
  * sibling of [[ImageKernels]] (pure public JVM, no codec library):
  * the decoder walks RIFF chunks to `fmt `/`data` and reads 16-bit PCM
  * samples (mono, or stereo mixed down `(l+r) >> 1`); the encoder
  * writes the canonical 44-byte-header mono file so the synthetic
  * corpus carries REAL spec-conformant audio whose samples are a closed
  * form of the row id — the DuckDB oracle replays every feature and
  * fingerprint bit from that closed form, so a decode bug anywhere
  * (chunk walk, endianness, sign) breaks the hash gates.
  */
object AudioKernels {

  /** Decoded clip: sample rate + mono 16-bit samples (as Ints). */
  final class PcmClip(val sampleRate: Int, val samples: Array[Int])

  import ByteReads.{ascii, le16, le32}

  /** Decode 16-bit PCM WAV; null for anything unsupported/malformed
    * (the in-band failure contract — this runs over untrusted payloads).
    */
  def decodeWav(bytes: Array[Byte]): PcmClip = {
    if (bytes == null || bytes.length < 44) return null
    if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE")) return null
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmtOk = false
    var samples: Array[Int] = null
    try {
      while (pos + 8 <= bytes.length) {
        val size = le32(bytes, pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length) return null
        if (ascii(bytes, pos, "fmt ")) {
          if (size < 16) return null
          val audioFormat = le16(bytes, pos + 8)
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
          fmtOk = audioFormat == 1 && (channels == 1 || channels == 2) &&
            bits == 16 && sampleRate > 0
        } else if (ascii(bytes, pos, "data")) {
          if (!fmtOk) return null // data before a valid fmt chunk
          val frameBytes = 2 * channels
          val n = size / frameBytes
          if (n.toLong * channels > 64L * 1024 * 1024) return null
          samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = pos + 8 + i * frameBytes
            val s0 = le16(bytes, off).toShort.toInt
            samples(i) =
              if (channels == 1) s0
              else (s0 + le16(bytes, off + 2).toShort.toInt) >> 1
            i += 1
          }
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    } catch { case _: Exception => return null }
    if (!fmtOk || samples == null) return null
    new PcmClip(sampleRate, samples)
  }

  /** Encode mono 16-bit PCM (canonical 44-byte header). */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putAscii(i: Int, s: String): Unit =
      s.indices.foreach(j => out(i + j) = s.charAt(j).toByte)
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, 1)
    putLe32(24, sampleRate); putLe32(28, sampleRate * 2); putLe16(32, 2)
    putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataSize)
    samples.indices.foreach(i => putLe16(44 + i * 2, samples(i) & 0xffff))
    out
  }

  /** 64-bit block-energy fingerprint: samples land in 65 blocks (block
    * = t·65 div n), block energy = Σ|s|; bit b (0..63) set iff
    * E(b+1) > E(b). Invariant under exact amplitude scaling (every
    * block energy multiplies by the same factor — the audio analog of
    * dHash's brightness invariance). Requires n ≥ 65; smaller clips
    * yield null.
    */
  def audioFingerprint(clip: PcmClip): java.lang.Long = {
    val n = clip.samples.length
    if (n < 65) return null
    val energy = new Array[Long](65)
    var t = 0
    while (t < n) {
      energy((t.toLong * 65 / n).toInt) += math.abs(clip.samples(t))
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (energy(b + 1) > energy(b)) fp |= 1L << b
      b += 1
    }
    fp
  }

  // --- the synthetic corpus's closed form (mirrored in the oracle) ----

  /** Pair group: clips 2k and 2k+1 differ only by an exact ×2 amplitude
    * scale — fingerprint-invariant, the planted near-dup pairs.
    */
  def synthGroup(id: Long): Long = id / 2
  def synthLen(id: Long): Int = (650 + (synthGroup(id) % 7) * 50).toInt
  def synthRate(id: Long): Int =
    Array(8000, 16000, 22050, 44100, 48000)((synthGroup(id) % 5).toInt)
  /** Sample t: `((t·(7 + g mod 5) + 13·g) mod 2003 − 1001) · (1 + id mod 2)`
    * — base amplitude ≤ 1001, scaled ≤ 2002: far from int16 clipping,
    * so the ×2 scale is EXACT.
    */
  def synthSample(id: Long)(t: Int): Int = {
    val g = synthGroup(id)
    (((t * (7 + g % 5) + 13 * g) % 2003 - 1001) * (1 + id % 2)).toInt
  }

  def synthWav(id: Long): Array[Byte] =
    encodeWav(synthRate(id), Array.tabulate(synthLen(id))(synthSample(id)))
}

package graft.codec

/** Bit-exact pure-Scala audio codecs (SURVEY §7.2 step 2).
  *
  * Three codecs cover the fixture's codec column: identity 16-bit PCM,
  * G.711 µ-law (public ITU-T spec), and a 4-bit IMA-ADPCM (public IMA spec,
  * continuous state, 4-byte LE sample-count header — our own framing).
  * All integer math ⇒ identical output on every JVM (the SNR≥30 dB and
  * determinism gates, SURVEY §7.4 hard part (a)).
  *
  * Reference analog: codec-aware sniff-decode with per-record failure
  * (`Backend/app.py:50-62` returns None on bad bytes → error-as-value);
  * here decode returns `Either[String, Array[Float]]` and never throws.
  */
object Codecs {

  val PcmS16le = "pcm_s16le"
  val Ulaw8    = "ulaw8"
  val Alaw8    = "alaw8"
  val Adpcm4   = "adpcm4"
  val known: Set[String] = Set(PcmS16le, Ulaw8, Alaw8, Adpcm4)

  /** Decode clip bytes to normalized mono float PCM in [-1, 1).
    * Total function over arbitrary bytes: malformed input → Left(reason). */
  def decode(codec: String, bytes: Array[Byte]): Either[String, Array[Float]] = {
    if (bytes == null || bytes.isEmpty) Left("empty_bytes")
    else codec match {
      case PcmS16le => decodePcmS16le(bytes)
      case Ulaw8    => Right(decodeUlaw(bytes))
      case Alaw8    => Right(decodeAlaw(bytes))
      case Adpcm4   => decodeAdpcm(bytes)
      case other    => Left(s"unknown_codec:$other")
    }
  }

  /** Encode int16 samples with the given codec (used by the fixture
    * generator and round-trip tests; seeded, deterministic). */
  def encode(codec: String, samples: Array[Short]): Array[Byte] = codec match {
    case PcmS16le => encodePcmS16le(samples)
    case Ulaw8    => encodeUlaw(samples)
    case Alaw8    => encodeAlaw(samples)
    case Adpcm4   => encodeAdpcm(samples)
    case other    => throw new IllegalArgumentException(s"unknown codec $other")
  }

  @inline private def s16ToFloat(s: Short): Float = s / 32768.0f

  /** Linear-interpolation resample to a target rate (SURVEY P21: align to a
    * common reference grid before cross-rate comparison). Deterministic
    * double math; output length = floor(n * to / from). */
  def resampleLinear(pcm: Array[Float], fromHz: Int, toHz: Int): Array[Float] = {
    if (fromHz == toHz || pcm.length == 0) return pcm
    val n = (pcm.length.toLong * toHz / fromHz).toInt
    val out = new Array[Float](n)
    if (fromHz % toHz == 0) {
      // integral decimation (e.g. 16k→8k): every position lands exactly on a
      // source sample (frac = 0) — a stride copy, bit-identical to the
      // general path below
      val stride = fromHz / toHz
      var i = 0
      while (i < n) { out(i) = pcm(i * stride); i += 1 }
      return out
    }
    val step = fromHz.toDouble / toHz
    // interior: j+1 < pcm.length is guaranteed while i*step < len-1, so the
    // two per-sample min() clamps (no-ops there) are hoisted out of the hot
    // loop; the few tail samples run the original clamped form. Identical
    // arithmetic and rounding — bit-identical output.
    // −1 guards the float-rounding edge of the division so the unclamped
    // loop can never index pcm(len): the one extra sample runs clamped
    val nSafe = math.min(n,
      math.max(0, (((pcm.length - 1).toDouble) / step).toInt - 1))
    var i = 0
    while (i < nSafe) {
      val pos = i * step
      val j = pos.toInt
      val frac = pos - j
      val a = pcm(j)
      val b = pcm(j + 1)
      out(i) = (a + (b - a) * frac).toFloat
      i += 1
    }
    while (i < n) {
      val pos = i * step
      val j = pos.toInt
      val frac = pos - j
      val a = pcm(math.min(j, pcm.length - 1))
      val b = pcm(math.min(j + 1, pcm.length - 1))
      out(i) = (a + (b - a) * frac).toFloat
      i += 1
    }
    out
  }

  // ---- pcm_s16le -----------------------------------------------------------

  def decodePcmS16le(bytes: Array[Byte]): Either[String, Array[Float]] = {
    if ((bytes.length & 1) != 0) Left("pcm16_odd_length")
    else {
      val n = bytes.length >> 1
      val out = new Array[Float](n)
      // bulk LE short view + a flat int16→float loop the JIT can
      // auto-vectorize, instead of per-sample byte combines; the LE
      // reassembly is identical so values are bit-identical
      val sh = new Array[Short](n)
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().get(sh)
      var i = 0
      while (i < n) {
        out(i) = sh(i) / 32768.0f
        i += 1
      }
      Right(out)
    }
  }

  def encodePcmS16le(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xFF).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  // ---- G.711 µ-law ---------------------------------------------------------

  private final val UlawBias = 0x84
  private final val UlawClip = 32635

  def ulawEncodeSample(pcm: Short): Byte = {
    var s = pcm.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > UlawClip) s = UlawClip
    s += UlawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0F
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  def ulawDecodeSample(b: Byte): Short = {
    val u = ~b & 0xFF
    val sign = u & 0x80
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0F
    var s = (((mantissa << 3) + UlawBias) << exponent) - UlawBias
    if (sign != 0) s = -s
    s.toShort
  }

  def encodeUlaw(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = ulawEncodeSample(samples(i)); i += 1 }
    out
  }

  // 256-entry decode LUT (µ-law is a pure byte→level map); built from the
  // spec decoder above, so bit-identical to per-sample arithmetic
  private val UlawTable: Array[Float] =
    Array.tabulate(256)(b => s16ToFloat(ulawDecodeSample(b.toByte)))

  def decodeUlaw(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = UlawTable(bytes(i) & 0xFF); i += 1 }
    out
  }

  // ---- G.711 A-law ---------------------------------------------------------
  // Published ITU-T G.711 A-law companding: 13-bit magnitude domain, even
  // bits inverted on the wire (the 0x55 toggle), segment/mantissa layout
  // (seg << 4) | mantissa with segment ends 0x1F, 0x3F, … 0xFFF.

  /** Encode one 16-bit sample to A-law (operates on the top 13 bits per
    * the spec; sign bit SET means non-negative in A-law). */
  def alawEncodeSample(pcm: Short): Byte = {
    var s = pcm.toInt >> 3 // 13-bit domain
    val mask = if (s >= 0) 0xD5 else { s = -s - 1; 0x55 }
    if (s > 0xFFF) s = 0xFFF
    // segment = index of the highest set bit above the seg-0 range
    var seg = 0
    var end = 0x1F
    while (seg < 7 && s > end) { seg += 1; end = (end << 1) | 1 }
    val mantissa = if (seg < 2) (s >> 1) & 0xF else (s >> seg) & 0xF
    (((seg << 4) | mantissa) ^ mask).toByte
  }

  def alawDecodeSample(b: Byte): Short = {
    val u = (b & 0xFF) ^ 0x55
    val seg = (u >> 4) & 0x07
    var t = (u & 0x0F) << 4
    if (seg == 0) t += 8
    else { t += 0x108; t <<= seg - 1 }
    (if ((u & 0x80) != 0) t else -t).toShort
  }

  def encodeAlaw(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = alawEncodeSample(samples(i)); i += 1 }
    out
  }

  // byte→level LUT, same shape as the µ-law decoder
  private val AlawTable: Array[Float] =
    Array.tabulate(256)(b => s16ToFloat(alawDecodeSample(b.toByte)))

  def decodeAlaw(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = AlawTable(bytes(i) & 0xFF); i += 1 }
    out
  }

  // ---- 4-bit IMA ADPCM (continuous state, LE sample-count header) ----------

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  def encodeAdpcm(samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](4 + (n + 1) / 2)
    out(0) = (n & 0xFF).toByte
    out(1) = ((n >> 8) & 0xFF).toByte
    out(2) = ((n >> 16) & 0xFF).toByte
    out(3) = ((n >> 24) & 0xFF).toByte
    var predictor = 0
    var index = 0
    var i = 0
    while (i < n) {
      var diff = samples(i) - predictor
      var nibble = if (diff < 0) { diff = -diff; 8 } else 0
      var step = StepTable(index)
      var vpdiff = step >> 3
      if (diff >= step) { nibble |= 4; diff -= step; vpdiff += step }
      step >>= 1
      if (diff >= step) { nibble |= 2; diff -= step; vpdiff += step }
      step >>= 1
      if (diff >= step) { nibble |= 1; vpdiff += step }
      if ((nibble & 8) != 0) predictor -= vpdiff else predictor += vpdiff
      if (predictor > 32767) predictor = 32767
      else if (predictor < -32768) predictor = -32768
      index += IndexTable(nibble)
      if (index < 0) index = 0 else if (index > 88) index = 88
      val bi = 4 + (i >> 1)
      if ((i & 1) == 0) out(bi) = (nibble & 0x0F).toByte
      else out(bi) = (out(bi) | ((nibble & 0x0F) << 4)).toByte
      i += 1
    }
    out
  }

  def decodeAdpcm(bytes: Array[Byte]): Either[String, Array[Float]] = {
    if (bytes.length < 4) return Left("adpcm_truncated_header")
    val n = (bytes(0) & 0xFF) | ((bytes(1) & 0xFF) << 8) |
      ((bytes(2) & 0xFF) << 16) | ((bytes(3) & 0xFF) << 24)
    if (n < 0) return Left("adpcm_bad_count")
    if (bytes.length - 4 != (n + 1) / 2) return Left("adpcm_length_mismatch")
    val out = new Array[Float](n)
    var predictor = 0
    var index = 0
    var i = 0
    while (i < n) {
      val b = bytes(4 + (i >> 1)) & 0xFF
      val nibble = if ((i & 1) == 0) b & 0x0F else (b >> 4) & 0x0F
      val step = StepTable(index)
      // branch-free magnitude/sign reconstruction — arithmetically equal to
      // the spec's conditional adds (mask = 0 or −1 selects each term)
      val vpdiff = (step >> 3) +
        ((-((nibble >> 2) & 1)) & step) +
        ((-((nibble >> 1) & 1)) & (step >> 1)) +
        ((-(nibble & 1)) & (step >> 2))
      val sgn = -((nibble >> 3) & 1) // 0 or −1
      predictor += (vpdiff ^ sgn) - sgn
      if (predictor > 32767) predictor = 32767
      else if (predictor < -32768) predictor = -32768
      index += IndexTable(nibble)
      if (index < 0) index = 0 else if (index > 88) index = 88
      out(i) = s16ToFloat(predictor.toShort)
      i += 1
    }
    Right(out)
  }
}

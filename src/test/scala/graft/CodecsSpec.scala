package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Codecs
import graft.fixture.Prng
import graft.oracle.Oracle

class CodecsSpec extends AnyFunSuite {

  private def randWave(seed: Long, n: Int): Array[Short] = {
    val rng = new Prng(seed)
    Array.fill(n)(((rng.nextLong() % 20000).toShort))
  }

  private def snrDb(ref: Array[Float], got: Array[Float]): Double = {
    require(ref.length == got.length, s"len ${ref.length} != ${got.length}")
    var sig = 0.0; var err = 0.0
    for (i <- ref.indices) {
      sig += ref(i).toDouble * ref(i)
      val d = ref(i).toDouble - got(i)
      err += d * d
    }
    if (err == 0) Double.PositiveInfinity else 10 * math.log10(sig / err)
  }

  test("pcm_s16le round-trips bit-exactly") {
    val w = randWave(1, 4321)
    val Right(dec) = Codecs.decode(Codecs.PcmS16le, Codecs.encodePcmS16le(w))
    assert(dec.length == w.length)
    assert(w.indices.forall(i => dec(i) == w(i) / 32768.0f))
  }

  test("ulaw8 decode matches independent oracle decode exactly") {
    val bytes = Array.tabulate(256)(i => i.toByte)
    val engine = Codecs.decodeUlaw(bytes)
    val oracle = Oracle.decodeUlaw(bytes)
    assert(engine.sameElements(oracle), "all 256 µ-law codes must agree")
  }

  test("ulaw8 round-trip SNR is high for speech-level signals") {
    val w = randWave(2, 8000)
    val dec = Codecs.decodeUlaw(Codecs.encodeUlaw(w))
    val ref = w.map(_ / 32768.0f)
    assert(snrDb(ref, dec) > 25.0) // µ-law ≈ 38 dB SQNR on full-scale uniform
  }

  test("alaw8 decode matches independent oracle decode exactly") {
    // engine: shift-accumulate spec decoder; oracle: closed-form
    // (2m+1)·8 / (2m+33)·2^(e+2) magnitude expression — all 256 codes
    val bytes = Array.tabulate(256)(i => i.toByte)
    assert(Codecs.decodeAlaw(bytes).sameElements(Oracle.decodeAlaw(bytes)),
      "all 256 A-law codes must agree")
  }

  test("alaw8 round-trip SNR is high; encode/decode are spec-consistent") {
    val w = randWave(7, 8000)
    val dec = Codecs.decodeAlaw(Codecs.encodeAlaw(w))
    val ref = w.map(_ / 32768.0f)
    assert(snrDb(ref, dec) > 25.0) // A-law ≈ 37 dB SQNR on uniform input
    // re-encoding a decoded level is a fixed point (companding idempotence)
    val codes = Array.tabulate(256)(i => i.toByte)
    val levels = codes.map(Codecs.alawDecodeSample)
    assert(levels.indices.forall(i =>
      Codecs.alawDecodeSample(Codecs.alawEncodeSample(levels(i))) == levels(i)))
  }

  test("adpcm4 decode matches independent oracle decode exactly (SNR gate ∞)") {
    val w = randWave(3, 10000)
    val enc = Codecs.encodeAdpcm(w)
    val Right(engine) = Codecs.decodeAdpcm(enc)
    val Some(oracle) = Oracle.decodeAdpcm(enc)
    assert(engine.sameElements(oracle))
  }

  test("adpcm4 odd-length sample count round-trips") {
    val w = randWave(4, 1001)
    val Right(dec) = Codecs.decodeAdpcm(Codecs.encodeAdpcm(w))
    assert(dec.length == 1001)
  }

  test("engine vs oracle decode SNR >= 30 dB across codecs (gate)") {
    for ((codec, seed) <- Seq(Codecs.PcmS16le -> 5L, Codecs.Ulaw8 -> 6L,
        Codecs.Alaw8 -> 9L, Codecs.Adpcm4 -> 7L)) {
      val w = randWave(seed, 16000)
      val enc = Codecs.encode(codec, w)
      val Right(engine) = Codecs.decode(codec, enc)
      val Some(oracle) = Oracle.decode(codec, enc)
      assert(snrDb(oracle, engine) >= 30.0, s"codec $codec")
    }
  }

  test("decode is total: never throws on arbitrary bytes (property, 2000 cases)") {
    val rng = new Prng(99)
    val codecs = IndexedSeq("pcm_s16le", "ulaw8", "alaw8", "adpcm4", "junk")
    for (_ <- 0 until 2000) {
      val codec = codecs(rng.nextInt(codecs.length))
      val bytes = Array.fill(rng.nextInt(512))(rng.nextLong().toByte)
      Codecs.decode(codec, bytes) match {
        case Right(pcm) => assert(pcm.forall(s => s >= -1.0f && s < 1.0f))
        case Left(reason) => assert(reason.nonEmpty)
      }
    }
  }

  test("linear resample preserves a sinusoid (P21 reference-grid alignment)") {
    val sr = 44100
    val n = sr / 2
    val src = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * 440.0 * i / sr)).toFloat)
    val out = Codecs.resampleLinear(src, sr, 16000)
    assert(out.length == n.toLong * 16000 / sr)
    // compare against the analytically resampled sinusoid
    var maxErr = 0.0
    for (i <- out.indices) {
      val expected = 0.5 * math.sin(2 * math.Pi * 440.0 * i / 16000.0)
      maxErr = math.max(maxErr, math.abs(out(i) - expected))
    }
    assert(maxErr < 0.02, s"max resample error $maxErr")
    // identity when rates match
    assert(Codecs.resampleLinear(src, sr, sr) eq src)
  }

  test("pcm16 rejects odd length; adpcm rejects header/length mismatch") {
    assert(Codecs.decode(Codecs.PcmS16le, Array[Byte](1, 2, 3)).isLeft)
    assert(Codecs.decode(Codecs.Adpcm4, Array[Byte](1, 2)).isLeft)
    val enc = Codecs.encodeAdpcm(randWave(8, 100))
    assert(Codecs.decode(Codecs.Adpcm4, enc.take(enc.length - 1)).isLeft)
    assert(Codecs.decode(Codecs.Ulaw8, Array.empty[Byte]).isLeft)
  }
}

package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import MediaCodecs._

/** Byte-level codec contract. Two layers of evidence:
  *   1. GOLDEN fixtures — BMP / PPM / WAV byte streams hand-assembled here
  *      from the format specs (NOT produced by our encoder), decoded to
  *      known pixels/samples. This pins the decoder to the spec
  *      independently of the encoder.
  *   2. Round-trip identity — encode∘decode == id over a deterministic
  *      sweep of shapes, covering row padding, odd widths, bottom-up vs
  *      top-down, multi-channel audio, 8 vs 16 bps.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- golden BMP: 2x2, 24bpp, bottom-up, rows padded 6→8 bytes ---------
  //
  // Image (top-down RGB):  (10,20,30) (40,50,60)
  //                        (70,80,90) (100,110,120)
  // File stores BOTTOM row first, BGR, each row padded with 2 zero bytes.
  private val goldenBmp: Array[Byte] = b(
    'B', 'M',
    70, 0, 0, 0, // file size 14+40+16
    0, 0, 0, 0, // reserved
    54, 0, 0, 0, // pixel offset
    40, 0, 0, 0, // info header size
    2, 0, 0, 0, // width
    2, 0, 0, 0, // height (positive => bottom-up)
    1, 0, // planes
    24, 0, // bpp
    0, 0, 0, 0, // BI_RGB
    16, 0, 0, 0, // image size (2 rows * 8)
    0, 0, 0, 0, 0, 0, 0, 0, // ppm resolutions
    0, 0, 0, 0, 0, 0, 0, 0, // palette counts
    // bottom row: (70,80,90) (100,110,120) as BGR + pad
    90, 80, 70, 120, 110, 100, 0, 0,
    // top row: (10,20,30) (40,50,60) as BGR + pad
    30, 20, 10, 60, 50, 40, 0, 0)

  test("golden BMP decodes to the spec'd pixels (bottom-up + BGR + padding)") {
    val img = decodeBmp(goldenBmp)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
  }

  test("top-down BMP (negative height) decodes without row flip") {
    val td = goldenBmp.clone()
    // height = -2 (two's complement LE)
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte; td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val img = decodeBmp(td)
    // now the FIRST stored row is the TOP row
    assert(img.pixels.map(_ & 0xff).toSeq ==
      Seq(70, 80, 90, 100, 110, 120, 10, 20, 30, 40, 50, 60))
  }

  // ---- golden PPM: comments + multi-whitespace header -------------------
  private val goldenPpm: Array[Byte] =
    "P6 # inline comment\n# full comment line\n 2\t1 \n255\n".getBytes("US-ASCII") ++
      b(1, 2, 3, 250, 251, 252)

  test("golden PPM decodes through comments and mixed whitespace") {
    val img = decodePpm(goldenPpm)
    assert(img.width == 2 && img.height == 1)
    assert(img.pixels.map(_ & 0xff).toSeq == Seq(1, 2, 3, 250, 251, 252))
  }

  // ---- golden WAV: extra LIST chunk before data, odd-size pad -----------
  private val goldenWav: Array[Byte] = {
    // samples: -1, 0, 32767, -32768  (mono, 8kHz, 16-bit)
    val data = b(0xff, 0xff, 0, 0, 0xff, 0x7f, 0, 0x80)
    val list = b('L', 'I', 'S', 'T', 3, 0, 0, 0, 'I', 'N', 'F') ++ b(0) // odd size => pad byte
    val fmt = b('f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1f, 0, 0, // 8000
      0x80, 0x3e, 0, 0, // byte rate 16000
      2, 0, // block align
      16, 0) // bits
    val dataChunk = b('d', 'a', 't', 'a', 8, 0, 0, 0) ++ data
    val body = list ++ fmt ++ dataChunk
    b('R', 'I', 'F', 'F', body.length + 4, 0, 0, 0, 'W', 'A', 'V', 'E') ++ body
  }

  test("golden WAV decodes via chunk walk with sign extension") {
    val wav = decodeWav(goldenWav)
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == Seq(-1, 0, 32767, -32768))
    assert(wav.nFrames == 4)
    assert(wav.durationMicros == 500L) // 4 frames / 8000 Hz = 500 µs
  }

  test("malformed payloads fail loudly, not silently") {
    assertThrows[IllegalArgumentException](decodeBmp(b(0, 1, 2)))
    assertThrows[IllegalArgumentException](decodePpm("P5 1 1 255\n".getBytes ++ b(9)))
    assertThrows[IllegalArgumentException](decodeWav(b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'A', 'V', 'I', ' ')))
    assertThrows[IllegalArgumentException](decodeImage(b(0x89, 'P', 'N', 'G'))) // unsupported container
    // truncated pixel data
    assertThrows[IllegalArgumentException](decodeBmp(goldenBmp.take(60)))
    // corrupt RIFF chunk size (0xFFFFFFF8 -> -8 through toInt) must THROW,
    // not hang the chunk walk in place (r16 review sweep)
    val hugefChunk = b('R', 'I', 'F', 'F', 4, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 0xf8, 0xff, 0xff, 0xff, 0, 0, 0, 0)
    assertThrows[IllegalArgumentException](decodeWav(hugefChunk))
    // chunk size past EOF is equally corrupt
    val pastEof = b('R', 'I', 'F', 'F', 4, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 64, 0, 0, 0)
    assertThrows[IllegalArgumentException](decodeWav(pastEof))
  }

  // ---- round trips -------------------------------------------------------

  private def raster(w: Int, h: Int): ImageRgb = {
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    ImageRgb(w, h, px)
  }

  test("BMP and PPM encode∘decode are identity across shapes (incl. padding-odd widths)") {
    for (w <- Seq(1, 2, 3, 5, 16); h <- Seq(1, 2, 7)) {
      val img = raster(w, h)
      assert(decodeBmp(encodeBmp(img)).pixels.toSeq == img.pixels.toSeq, s"bmp ${w}x$h")
      assert(decodePpm(encodePpm(img)).pixels.toSeq == img.pixels.toSeq, s"ppm ${w}x$h")
    }
  }

  test("WAV encode∘decode is identity for 16-bit stereo and 8-bit mono") {
    val s16 = WavPcm(44100, 2, 16, Array.tabulate(64)(i => (i * 1021 % 65536) - 32768))
    val got16 = decodeWav(encodeWav(s16))
    assert(got16.samples.toSeq == s16.samples.toSeq)
    assert(got16.channels == 2 && got16.sampleRate == 44100)
    val s8 = WavPcm(8000, 1, 8, Array.tabulate(13)(i => i * 19 % 256))
    assert(decodeWav(encodeWav(s8)).samples.toSeq == s8.samples.toSeq)
  }

  test("position digest is order-sensitive (catches BGR/row-order bugs a sum misses)") {
    val a = positionDigest(Iterator(1, 2, 3))
    val bb = positionDigest(Iterator(3, 2, 1))
    assert(a != bb)
    assert(a == 1L * 1 + 2L * 2 + 3L * 3)
  }

  test("resizeNearest floor-maps source pixels (odd dimensions)") {
    val img = raster(5, 3)
    val out = resizeNearest(img, 3, 2)
    // out(x=1,y=1) should be source (x=1*5/3=1, y=1*3/2=1)
    val exp = img.pixels.slice((1 * 5 + 1) * 3, (1 * 5 + 1) * 3 + 3).toSeq
    assert(out.pixels.slice((1 * 3 + 1) * 3, (1 * 3 + 1) * 3 + 3).toSeq == exp)
  }
}

/** The Spark-side contract of the real-codec queries: schema, determinism,
  * and agreement with a driver-side recomputation on a small slice. */
class MediaCodecsQuerySpec extends SparkSpec {
  test("mm_decode_image emits real decoded dims + digest and dispatches on magic") {
    val df = Multimodal.decodeImageFeatures(spark, sf("sf0.001")).limit(50).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "bmp" else "ppm"))
      assert(r.getLong(2) == 4 + id % 13)
      assert(r.getLong(3) == 3 + id % 7)
      val img = Multimodal.synthImage(id)
      assert(r.getLong(4) == MediaCodecs.pixelDigest(img))
    }
  }

  test("mm_decode_wav emits real duration from the RIFF parse") {
    val rows = Multimodal.decodeWavFeatures(spark, sf("sf0.001")).limit(20).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val nf = 50 + id % 97
      assert(r.getLong(1) == 8000L)
      assert(r.getLong(2) == 1 + id % 2)
      assert(r.getLong(3) == nf)
      assert(r.getLong(4) == nf * 125)
    }
  }
}

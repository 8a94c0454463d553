package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Codec

/**
 * Pins the BMP/WAV codecs against HAND-WRITTEN golden byte arrays
 * (transcribed from the public format specs, not produced by the code
 * under test) — so an encode/decode pair that is mutually inverse but
 * wrong against the real format cannot pass.
 */
class CodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(h => Integer.parseInt(h, 16).toByte)

  // 2x2 24-bit BMP: top-down pixels R G / B W, bottom-up BGR file rows,
  // stride 8 (2 pad bytes), 2835 ppm (= 0x0B13) resolution.
  private val goldenBmp = hex(
    """42 4D 46 00 00 00 00 00 00 00 36 00 00 00
      |28 00 00 00 02 00 00 00 02 00 00 00 01 00 18 00
      |00 00 00 00 10 00 00 00 13 0B 00 00 13 0B 00 00
      |00 00 00 00 00 00 00 00
      |FF 00 00 FF FF FF 00 00
      |00 00 FF 00 FF 00 00 00""".stripMargin.replace("\n", " "))

  private val goldenPixels: Array[Byte] = Array(
    255, 0, 0,   0, 255, 0,    // row 0: red, green
    0, 0, 255,   255, 255, 255 // row 1: blue, white
  ).map(_.toByte)

  test("BMP encode matches the golden bytes") {
    val got = Codec.encodeBmp(Codec.Image(2, 2, goldenPixels))
    assert(got.toSeq == goldenBmp.toSeq)
  }

  test("BMP decode of the golden bytes recovers top-down RGB pixels") {
    val img = Codec.decodeBmp(goldenBmp).get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == goldenPixels.toSeq)
  }

  test("BMP decode handles TOP-DOWN files (negative height)") {
    // same image stored top-down: height = -2, file rows in image order
    val td = goldenBmp.clone()
    td(22) = 0xFE.toByte; td(23) = 0xFF.toByte; td(24) = 0xFF.toByte; td(25) = 0xFF.toByte
    // swap the two 8-byte file rows
    val r0 = td.slice(54, 62); val r1 = td.slice(62, 70)
    System.arraycopy(r1, 0, td, 54, 8); System.arraycopy(r0, 0, td, 62, 8)
    val img = Codec.decodeBmp(td).get
    assert(img.pixels.toSeq == goldenPixels.toSeq)
  }

  test("BMP decode rejects malformed payloads instead of throwing") {
    assert(Codec.decodeBmp(null).isEmpty)
    assert(Codec.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codec.decodeBmp("not a bitmap at all, just ascii padding to 54+ bytes......."
      .getBytes).isEmpty)
    assert(Codec.decodeBmp(goldenBmp.take(60)).isEmpty) // truncated pixels
    val badBpp = goldenBmp.clone(); badBpp(28) = 8
    assert(Codec.decodeBmp(badBpp).isEmpty)
  }

  test("nearest resize picks floor-sampled source pixels") {
    val img = Codec.Image(2, 2, goldenPixels)
    val one = Codec.resizeNearest(img, 1, 1)
    assert(one.pixels.toSeq == Seq[Byte](255.toByte, 0, 0)) // (0,0) = red
    val up = Codec.resizeNearest(img, 4, 4)
    // (3,3) samples src (3*2/4, 3*2/4) = (1,1) = white
    assert(up.pixels.slice((3 * 4 + 3) * 3, (3 * 4 + 3) * 3 + 3).forall(_ == -1))
  }

  // mono 8 kHz PCM16, samples [1000, -1000]
  private val goldenWav = hex(
    """52 49 46 46 28 00 00 00 57 41 56 45
      |66 6D 74 20 10 00 00 00 01 00 01 00 40 1F 00 00
      |80 3E 00 00 02 00 10 00
      |64 61 74 61 04 00 00 00 E8 03 18 FC""".stripMargin.replace("\n", " "))

  test("WAV encode matches the golden bytes") {
    val got = Codec.encodeWav(Codec.Audio(8000, 1, Array[Short](1000, -1000)))
    assert(got.toSeq == goldenWav.toSeq)
  }

  test("WAV decode of the golden bytes recovers rate/channels/samples") {
    val a = Codec.decodeWav(goldenWav).get
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == Seq[Short](1000, -1000))
  }

  test("WAV decode WALKS chunks: junk LIST chunk (odd length, padded) before data") {
    // insert a 3-byte "LIST" chunk (odd -> 1 pad byte) between fmt and data
    val head = goldenWav.take(36) // RIFF..fmt chunk end
    val junk = hex("4C 49 53 54 03 00 00 00 AA BB CC 00")
    val tail = goldenWav.drop(36)
    val spliced = head ++ junk ++ tail
    // fix RIFF size
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte; spliced(5) = ((sz >> 8) & 0xff).toByte
    val a = Codec.decodeWav(spliced).get
    assert(a.samples.toSeq == Seq[Short](1000, -1000))
  }

  test("WAV decode rejects non-PCM16 and truncated payloads") {
    assert(Codec.decodeWav(null).isEmpty)
    assert(Codec.decodeWav(goldenWav.take(40)).isEmpty)
    val ieee = goldenWav.clone(); ieee(20) = 3 // IEEE float format tag
    assert(Codec.decodeWav(ieee).isEmpty)
  }

  test("WAV decode picks channel 0 of interleaved stereo frames") {
    val stereo = Codec.encodeWav(Codec.Audio(8000, 2, Array[Short](1, 2, 3, 4)))
    val a = Codec.decodeWav(stereo).get
    assert(a.channels == 2 && a.samples.toSeq == Seq[Short](1, 3))
  }

  test("synth formula image round-trips encode->decode bit-exactly") {
    val w = 16; val h = 16
    val px = Array.tabulate(w * h * 3) { i =>
      val c = i % 3; val x = (i / 3) % w; val y = i / (3 * w)
      graft.operators.Multimodal.pixelFormula(42L, x, y, c).toByte
    }
    val img = Codec.Image(w, h, px)
    val back = Codec.decodeBmp(Codec.encodeBmp(img)).get
    assert(back.width == w && back.height == h && back.pixels.toSeq == px.toSeq)
  }
}

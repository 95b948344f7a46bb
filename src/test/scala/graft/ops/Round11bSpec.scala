package graft.ops

import graft.etl.EtlSpecBase

/** Round-11 multimodal units: the JPEG marker-walk parser pinned
  * against hand-written spec-literal bytes (the q143/q145 discipline —
  * synth+parse sharing a bug must not cancel out).
  */
class Round11bSpec extends EtlSpecBase {

  // SOI + COM("ab") + SOF0 640x480, 8-bit, 3 components — laid out
  // by hand from the JPEG/JFIF marker description, NOT via jpegHeader
  private val specJpeg: Array[Byte] = Array[Int](
    0xFF, 0xD8, // SOI
    0xFF, 0xFE, 0, 4, 'a', 'b', // COM, length 4 (includes itself)
    0xFF, 0xC0, 0, 17, // SOF0, length 17
    8, // precision
    0x01, 0xE0, // height 480
    0x02, 0x80, // width 640
    3, // components
    1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0
  ).map(_.toByte)

  test("jpegDims: parses hand-written spec-literal bytes (walks a COM " +
    "segment to SOF0)") {
    val got = MultimodalKernels.jpegDims(specJpeg)
    assert(got != null && got.toLongArray().toSeq == Seq(640L, 480L, 8L, 3L))
  }

  test("jpegDims: skips standalone RST/TEM markers (no length field)") {
    val withStandalone = specJpeg.take(2) ++
      Array(0xFF, 0xD3, 0xFF, 0x01).map(_.toByte) ++ specJpeg.drop(2)
    val got = MultimodalKernels.jpegDims(withStandalone)
    assert(got != null && got.toLongArray().toSeq == Seq(640L, 480L, 8L, 3L))
  }

  test("jpegDims: rejects bad SOI, EOI-before-SOF, truncated chain, " +
    "and DHT masquerading as a frame header") {
    assert(MultimodalKernels.jpegDims(null) == null)
    assert(MultimodalKernels.jpegDims(Array(0xFF, 0xD7).map(_.toByte)) == null)
    // corrupt SOI
    val bad = specJpeg.clone(); bad(1) = 0x00
    assert(MultimodalKernels.jpegDims(bad) == null)
    // EOI straight after SOI: chain ends with no SOF
    assert(MultimodalKernels.jpegDims(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) == null)
    // segment length runs past the buffer
    assert(MultimodalKernels.jpegDims(
      Array(0xFF, 0xD8, 0xFF, 0xFE, 0x40, 0x00, 'x').map(_.toByte)) == null)
    // DHT (C4) is in C0..CF but is NOT a frame header: walk must skip
    // it — and then reject at EOI, never return DHT payload as dims
    val dht = Array[Int](0xFF, 0xD8, 0xFF, 0xC4, 0, 8, 8, 1, 2, 3, 4, 5,
      0xFF, 0xD9).map(_.toByte)
    assert(MultimodalKernels.jpegDims(dht) == null)
  }

  test("jpegHeader/jpegDims roundtrip across comment lengths") {
    for (comLen <- Seq(0, 1, 31)) {
      val got = MultimodalKernels.jpegDims(
        MultimodalKernels.jpegHeader(1920, 1080, comLen, valid = true))
      assert(got != null && got.toLongArray().toSeq ==
        Seq(1920L, 1080L, 8L, 3L), s"comLen=$comLen")
    }
    assert(MultimodalKernels.jpegDims(
      MultimodalKernels.jpegHeader(1920, 1080, 0, valid = false)) == null)
  }
}

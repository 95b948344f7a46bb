package graft.ops

import graft.etl.EtlSpecBase

/** Round-11 second multimodal unit set: the ISO-BMFF (MP4) NESTED box
  * walk pinned against hand-written spec-literal bytes (the q143/q145/
  * q198 discipline — synth+parse sharing a bug must not cancel out).
  */
class Round11cSpec extends EtlSpecBase {

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8 + body.length) ++ t.getBytes("US-ASCII") ++ body

  // mvhd version-0 body: version/flags, ctime, mtime, TIMESCALE=90000,
  // DURATION=450000, then 80 bytes of rate/volume/matrix/etc — laid
  // out by hand from ISO/IEC 14496-12 §8.2.2, NOT via mp4Header
  private def specMvhdBody: Array[Byte] =
    be32(0) ++ be32(0) ++ be32(0) ++ be32(90000) ++ be32(450000) ++
      new Array[Byte](80)

  private def specMp4: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("mvhd", specMvhdBody) ++
        box("trak", box("free", Array.empty[Byte])) ++
        box("trak", box("free", Array.empty[Byte]))) ++
      box("mdat", "hello".getBytes("US-ASCII"))

  test("mp4Meta: parses hand-written spec-literal boxes (recurses " +
    "moov -> mvhd, counts sibling traks)") {
    val got = MultimodalKernels.mp4Meta(specMp4)
    assert(got != null && got.toLongArray().toSeq == Seq(90000L, 450000L, 2L))
  }

  test("mp4Meta: an unknown box BEFORE moov is skipped at top level; " +
    "an unknown box INSIDE moov is skipped at child level") {
    val withTop = specMp4.take(16) ++ box("skip", new Array[Byte](7)) ++
      specMp4.drop(16)
    assert(MultimodalKernels.mp4Meta(withTop).toLongArray().toSeq ==
      Seq(90000L, 450000L, 2L))
    val moovBody = box("udta", new Array[Byte](3)) ++ box("mvhd", specMvhdBody) ++
      box("trak", Array.empty[Byte])
    val withChild = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", moovBody)
    assert(MultimodalKernels.mp4Meta(withChild).toLongArray().toSeq ==
      Seq(90000L, 450000L, 1L))
  }

  test("mp4Meta: rejects non-ftyp start, child box overrunning its " +
    "parent, sub-8 sizes, non-v0 mvhd, and a moov without mvhd") {
    assert(MultimodalKernels.mp4Meta(null) == null)
    assert(MultimodalKernels.mp4Meta(new Array[Byte](8)) == null)
    // first box is not ftyp
    val notFtyp = box("mdat", new Array[Byte](8)) ++ specMp4.drop(16)
    assert(MultimodalKernels.mp4Meta(notFtyp) == null)
    // child size runs past the moov end
    val overrun = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", be32(9999) ++ "mvhd".getBytes("US-ASCII"))
    assert(MultimodalKernels.mp4Meta(overrun) == null)
    // top-level size < 8
    val tiny = specMp4.clone(); System.arraycopy(be32(4), 0, tiny, 0, 4)
    assert(MultimodalKernels.mp4Meta(tiny) == null)
    // version-1 mvhd (64-bit fields) must be rejected, not misread
    val v1Body = specMvhdBody.clone(); v1Body(0) = 1
    val v1 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("mvhd", v1Body))
    assert(MultimodalKernels.mp4Meta(v1) == null)
    // moov with traks but no mvhd
    val noMvhd = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("trak", Array.empty[Byte]))
    assert(MultimodalKernels.mp4Meta(noMvhd) == null)
  }

  test("mp4Header/mp4Meta roundtrip across track counts; corrupt ftyp " +
    "rejects") {
    for (tracks <- Seq(1, 2, 4)) {
      val got = MultimodalKernels.mp4Meta(
        MultimodalKernels.mp4Header(1000, 123456, tracks, valid = true))
      assert(got != null && got.toLongArray().toSeq ==
        Seq(1000L, 123456L, tracks.toLong), s"tracks=$tracks")
    }
    assert(MultimodalKernels.mp4Meta(
      MultimodalKernels.mp4Header(1000, 1, 1, valid = false)) == null)
  }
}

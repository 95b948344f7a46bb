package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs as a partition-wise operator (`mapPartitions`) so a real
  * decoder would amortize per-partition setup (codec init, model
  * load) across rows — the 100 TB shape for image/audio pipelines.
  *
  * The actual byte→pixels decode is STUBBED with a deterministic fake
  * (no image/audio libraries ship in this environment): features are
  * computed from the raw bytes (length / first byte / mod-251
  * checksum / a tiny fake embedding). The Spark-side plumbing —
  * binary schema, partition batching, feature struct — is real and
  * oracle-verified.
  */
object MultimodalOps {

  /** Feature row produced by the (stub) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      first_byte: Int,
      checksum: Int,
      fake_embedding: Array[Float])

  /** Attach an opaque binary payload column (here: UTF-8 of `text`,
    * standing in for image/audio bytes).
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** STUB decoder — deterministic fake features from raw bytes.
    * A real implementation would decode pixels/samples here; the
    * signature (bytes => features) and the per-partition batching are
    * what a real codec plugs into.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val first = if (n == 0) 0 else bytes(0) & 0xff
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    // divide in DOUBLE then narrow (float-divide would round differently
    // from the oracle's double-divide-then-cast)
    val emb = Array.tabulate(4)(d => (((sum + d * first) % 97).toDouble / 97.0).toFloat)
    MediaFeatures(id, n, first, (sum % 251).toInt, emb)
  }

  /** Partition-wise feature extraction over (id, payload). */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec/model init)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
  }

  /** Column expression for the payload byte length (metadata op kept
    * in the projection layer — no decode needed).
    */
  def payloadBytes(payload: Column): Column = octet_length(payload)

  /** Kernel-backed PNG header synthesis (see
    * [[MultimodalKernels.pngHeader]]).
    */
  def pngHeader(width: Column, height: Column, valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "pngHeader",
      Seq(ExprBridge.expression(width.cast(IntegerType)),
        ExprBridge.expression(height.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed PNG header parse: array [width, height, bit_depth,
    * color_type], NULL when the signature/IHDR validation fails (see
    * [[MultimodalKernels.pngDims]]).
    */
  def pngDims(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "pngDims",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed WAV/RIFF header synthesis (see
    * [[MultimodalKernels.wavHeader]]).
    */
  def wavHeader(sampleRate: Column, channels: Column, nFrames: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "wavHeader",
      Seq(ExprBridge.expression(sampleRate.cast(IntegerType)),
        ExprBridge.expression(channels.cast(IntegerType)),
        ExprBridge.expression(nFrames.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed WAV header parse: array [sample_rate, channels,
    * bits_per_sample, n_frames, duration_ms], NULL when the RIFF/WAVE
    * validation fails (see [[MultimodalKernels.wavDims]]).
    */
  def wavDims(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "wavDims",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed JPEG/JFIF header synthesis (see
    * [[MultimodalKernels.jpegHeader]]).
    */
  def jpegHeader(width: Column, height: Column, comLen: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "jpegHeader",
      Seq(ExprBridge.expression(width.cast(IntegerType)),
        ExprBridge.expression(height.cast(IntegerType)),
        ExprBridge.expression(comLen.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed JPEG marker-walk parse: array [width, height,
    * precision, n_components], NULL when SOI validation or the
    * segment walk fails (see [[MultimodalKernels.jpegDims]]).
    */
  def jpegDims(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "jpegDims",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed minimal ISO-BMFF (MP4) build: ftyp + moov(mvhd +
    * `nTracks` stub traks) + mdat. `valid=false` corrupts the ftyp
    * box type. See [[MultimodalKernels.mp4Header]].
    */
  def mp4Header(timescale: Column, duration: Column, nTracks: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "mp4Header",
      Seq(ExprBridge.expression(timescale.cast(IntegerType)),
        ExprBridge.expression(duration.cast(IntegerType)),
        ExprBridge.expression(nTracks.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed NESTED box walk: array [timescale, duration,
    * n_tracks], NULL on malformed input — see
    * [[MultimodalKernels.mp4Meta]].
    */
  def mp4Meta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "mp4Meta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER)
    * synthesis — see [[MultimodalKernels.bmpHeader]].
    */
  def bmpHeader(width: Column, height: Column, topDown: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "bmpHeader",
      Seq(ExprBridge.expression(width.cast(IntegerType)),
        ExprBridge.expression(height.cast(IntegerType)),
        ExprBridge.expression(topDown.cast(BooleanType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed BMP header parse: array [width, height, bpp,
    * top_down, file_size], NULL when validation fails — see
    * [[MultimodalKernels.bmpDims]].
    */
  def bmpDims(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "bmpDims",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed GIF header builder — see
    * [[MultimodalKernels.gifHeader]].
    */
  def gifHeader(width: Column, height: Column, hasGct: Column,
      gctExp: Column, valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "gifHeader",
      Seq(ExprBridge.expression(width.cast(IntegerType)),
        ExprBridge.expression(height.cast(IntegerType)),
        ExprBridge.expression(hasGct.cast(BooleanType)),
        ExprBridge.expression(gctExp.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed GIF logical-screen-descriptor parse: array [width,
    * height, has_gct, gct_colors, is_89a], NULL on any validation
    * failure — see [[MultimodalKernels.gifMeta]].
    */
  def gifMeta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "gifMeta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed TIFF header synthesis (both byte orders) — see
    * [[MultimodalKernels.tiffHeader]].
    */
  def tiffHeader(width: Column, height: Column, bigEndian: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "tiffHeader",
      Seq(ExprBridge.expression(width.cast(IntegerType)),
        ExprBridge.expression(height.cast(IntegerType)),
        ExprBridge.expression(bigEndian.cast(BooleanType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed TIFF parse: array [width, height, big_endian,
    * n_entries], NULL on any validation failure — see
    * [[MultimodalKernels.tiffMeta]].
    */
  def tiffMeta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "tiffMeta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed ustar entry-header synthesis — see
    * [[MultimodalKernels.tarHeader]].
    */
  def tarHeader(name: Column, size: Column, mtime: Column,
      typeflag: Column, valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType,
      IntegerType, LongType, StringType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "tarHeader",
      Seq(ExprBridge.expression(name.cast(StringType)),
        ExprBridge.expression(size.cast(LongType)),
        ExprBridge.expression(mtime.cast(LongType)),
        ExprBridge.expression(typeflag.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(StringType, LongType, LongType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed ustar parse: array [size, mtime, typeflag], NULL
    * when the magic or the spaces-for-chksum checksum fails — see
    * [[MultimodalKernels.tarMeta]].
    */
  def tarMeta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "tarMeta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed ustar name extraction (null when the header fails
    * [[tarMeta]] validation) — see [[MultimodalKernels.tarName]].
    */
  def tarName(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, StringType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, StringType, "tarName",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed gzip member synthesis — see
    * [[MultimodalKernels.gzipHeader]].
    */
  def gzipHeader(mtime: Column, fnameLen: Column, hasExtra: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "gzipHeader",
      Seq(ExprBridge.expression(mtime.cast(IntegerType)),
        ExprBridge.expression(fnameLen.cast(IntegerType)),
        ExprBridge.expression(hasExtra.cast(BooleanType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed gzip member parse: array [mtime, os, has_extra,
    * fname_len, header_len, isize], NULL on any validation failure —
    * see [[MultimodalKernels.gzipMeta]].
    */
  def gzipMeta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "gzipMeta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed ZIP catalog synthesis — see
    * [[MultimodalKernels.zipCatalog]].
    */
  def zipCatalog(nEntries: Column, commentLen: Column,
      valid: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, BinaryType, "zipCatalog",
      Seq(ExprBridge.expression(nEntries.cast(IntegerType)),
        ExprBridge.expression(commentLen.cast(IntegerType)),
        ExprBridge.expression(valid.cast(BooleanType))),
      Seq(IntegerType, IntegerType, BooleanType),
      propagateNull = true, returnNullable = true))
  }

  /** Kernel-backed ZIP catalog parse: array [n_entries, cd_size,
    * comment_len, total_name_len, total_usize], NULL on any
    * validation failure — see [[MultimodalKernels.zipMeta]].
    */
  def zipMeta(payload: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "zipMeta",
      Seq(ExprBridge.expression(payload.cast(BinaryType))),
      Seq(BinaryType), propagateNull = true, returnNullable = true))
  }

  /** Frame sampling (the video-pipeline shape): split a payload into
    * `n` contiguous frames and compute one feature per frame — here a
    * code-unit sum standing in for a real per-frame decode (the
    * fixtures are ASCII, so code units == bytes == what a byte-range
    * codec would see). Callers `posexplode` the result to scatter
    * per-frame rows, process them, and re-aggregate — the
    * scatter-gather every frame-level media pipeline needs.
    */
  def frameSums(textPayload: Column, n: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
    ExprBridge.column(StaticInvoke(
      MultimodalKernels.getClass, ArrayType(LongType, containsNull = false),
      "frameSums",
      Seq(ExprBridge.expression(textPayload.cast(StringType)), Literal(n)),
      Seq(StringType, IntegerType), propagateNull = true, returnNullable = true))
  }
}

/** JVM kernel for the frame-sampling stub (StaticInvoke — same
  * codegen-friendly pattern as [[TextKernels]]).
  */
object MultimodalKernels {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  // ---- PNG container header (REAL format, no codec needed) ---------------
  // Media metadata extraction does not require a decoder: the PNG
  // 8-byte signature + IHDR chunk carry width/height/bit-depth/
  // color-type at fixed offsets (PNG spec §5.2/§11.2.2 — public
  // format documentation). The synthesizer below writes a
  // spec-correct 26-byte header and the parser reads it back
  // INDEPENDENTLY (offset-by-offset per the spec, validating the
  // signature and the IHDR tag) — so a wrong offset or endianness in
  // either direction breaks the oracle roundtrip, and the parser is
  // additionally pinned against a hand-written spec-literal header
  // in the unit suite.

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def writeBE(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >>> 24) & 0xff).toByte
    out(off + 1) = ((v >>> 16) & 0xff).toByte
    out(off + 2) = ((v >>> 8) & 0xff).toByte
    out(off + 3) = (v & 0xff).toByte
  }

  private def readBE(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Spec-correct PNG signature + IHDR prefix (26 bytes): magic,
    * IHDR length (13), "IHDR", width/height as big-endian uint32,
    * bit depth 8, color type 6 (RGBA). `valid=false` corrupts the
    * first magic byte — the truncated/mis-uploaded payload case a
    * metadata pass must reject, not crash on.
    */
  def pngHeader(width: Int, height: Int, valid: Boolean): Array[Byte] = {
    val out = new Array[Byte](26)
    System.arraycopy(PngMagic, 0, out, 0, 8)
    writeBE(out, 8, 13) // IHDR data length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    writeBE(out, 16, width)
    writeBE(out, 20, height)
    out(24) = 8 // bit depth
    out(25) = 6 // color type: truecolor + alpha
    if (!valid) out(0) = 0x00
    out
  }

  /** Parse (width, height, bit_depth, color_type) out of a PNG
    * header; NULL (not an exception) for anything that fails the
    * signature/IHDR validation — short buffers included.
    */
  def pngDims(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 26) return null
    var i = 0
    while (i < 8) { if (bytes(i) != PngMagic(i)) return null; i += 1 }
    if (readBE(bytes, 8) != 13L) return null
    if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' ||
      bytes(15) != 'R') return null
    new GenericArrayData(Array(readBE(bytes, 16), readBE(bytes, 20),
      (bytes(24) & 0xff).toLong, (bytes(25) & 0xff).toLong))
  }

  // ---- WAV/RIFF container header (REAL format, LITTLE-endian) ------------
  // The audio sibling of the PNG pass above, and deliberately the
  // OPPOSITE byte order: RIFF/WAVE fields are little-endian per the
  // public WAVE format documentation (RIFF chunk + "WAVE" form +
  // canonical 16-byte PCM "fmt " chunk + "data" chunk = 44 bytes), so
  // a parser that silently reuses the PNG big-endian reader fails the
  // oracle on every multi-byte field. The parser validates all four
  // magic tags, the PCM format code, AND the two REDUNDANT fields the
  // spec derives from the primaries (byte_rate, block_align) — a
  // metadata pass must reject internally-inconsistent headers, not
  // just truncated ones.

  private def writeLE32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
    out(off + 2) = ((v >>> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def writeLE16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def readLE32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def readLE16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)

  private val WavBits = 16 // canonical PCM-16 fixture payloads

  /** Spec-correct 44-byte canonical WAV header: RIFF size, "WAVE",
    * PCM "fmt " chunk (format 1, derived byte_rate/block_align), and
    * a "data" chunk sized `nFrames * block_align`. `valid=false`
    * writes the big-endian "RIFX" container tag instead of "RIFF" —
    * a real byte-order variant this little-endian parser must reject.
    */
  def wavHeader(sampleRate: Int, channels: Int, nFrames: Int,
      valid: Boolean): Array[Byte] = {
    val blockAlign = channels * (WavBits / 8)
    val dataSize = nFrames * blockAlign
    val out = new Array[Byte](44)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'
    out(3) = if (valid) 'F' else 'X'
    writeLE32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    writeLE32(out, 16, 16) // canonical PCM fmt-chunk size
    writeLE16(out, 20, 1) // audio format: PCM
    writeLE16(out, 22, channels)
    writeLE32(out, 24, sampleRate)
    writeLE32(out, 28, sampleRate * blockAlign) // byte rate (derived)
    writeLE16(out, 32, blockAlign)
    writeLE16(out, 34, WavBits)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    writeLE32(out, 40, dataSize)
    out
  }

  /** Parse (sample_rate, channels, bits_per_sample, n_frames,
    * duration_ms) out of a canonical WAV header; NULL (not an
    * exception) for short buffers, wrong magics, non-PCM format, or
    * derived-field inconsistency. duration_ms is exact integer floor
    * (frames*1000 div rate) so both engines agree without float math.
    */
  def wavDims(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 44) return null
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F') return null
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
      bytes(11) != 'E') return null
    if (bytes(12) != 'f' || bytes(13) != 'm' || bytes(14) != 't' ||
      bytes(15) != ' ') return null
    if (readLE32(bytes, 16) != 16L || readLE16(bytes, 20) != 1L) return null
    if (bytes(36) != 'd' || bytes(37) != 'a' || bytes(38) != 't' ||
      bytes(39) != 'a') return null
    val channels = readLE16(bytes, 22)
    val rate = readLE32(bytes, 24)
    val bits = readLE16(bytes, 34)
    val blockAlign = readLE16(bytes, 32)
    if (channels < 1 || rate < 1 || bits % 8 != 0) return null
    if (blockAlign != channels * (bits / 8)) return null
    if (readLE32(bytes, 28) != rate * blockAlign) return null
    val dataSize = readLE32(bytes, 40)
    if (dataSize % blockAlign != 0) return null
    val nFrames = dataSize / blockAlign
    new GenericArrayData(Array(rate, channels, bits, nFrames,
      nFrames * 1000L / rate))
  }

  // ---- JPEG/JFIF container header (REAL format, marker WALK) --------------
  // The third container family, and structurally the hardest: JPEG
  // metadata is NOT at a fixed offset — the SOF frame header sits
  // behind a variable number of variable-LENGTH marker segments
  // (JPEG/JFIF public spec: SOI, then FF-prefixed segments each
  // carrying a big-endian 16-bit length that INCLUDES the length
  // field). The synthesizer writes SOI + a variable-length COM
  // segment + APP0/JFIF + SOF0, so the parser can only find the
  // dimensions by actually walking the segment chain — a fixed-offset
  // reader (the PNG/WAV shortcut) fails on every comLen > 0 payload.

  private def writeBE16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >>> 8) & 0xff).toByte
    out(off + 1) = (v & 0xff).toByte
  }

  private def readBE16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** SOI + COM(2+2+comLen) + APP0/JFIF(18) + SOF0(2+19 for 3
    * components). `valid=false` corrupts the SOI second byte (a
    * non-JPEG payload the walk must reject up front). comLen filler
    * bytes are 'x'.
    */
  def jpegHeader(width: Int, height: Int, comLen: Int,
      valid: Boolean): Array[Byte] = {
    val sofLen = 2 + 1 + 2 + 2 + 1 + 3 * 3 // 17: len+prec+h+w+ncomp+3 comps
    val out = new Array[Byte](2 + (4 + comLen) + 18 + 2 + sofLen)
    var p = 0
    out(p) = 0xFF.toByte; out(p + 1) = 0xD8.toByte; p += 2 // SOI
    out(p) = 0xFF.toByte; out(p + 1) = 0xFE.toByte         // COM
    writeBE16(out, p + 2, 2 + comLen)
    var i = 0
    while (i < comLen) { out(p + 4 + i) = 'x'; i += 1 }
    p += 4 + comLen
    out(p) = 0xFF.toByte; out(p + 1) = 0xE0.toByte         // APP0
    writeBE16(out, p + 2, 16)
    val jfif = Array[Byte]('J', 'F', 'I', 'F', 0)
    System.arraycopy(jfif, 0, out, p + 4, 5)
    out(p + 9) = 1; out(p + 10) = 1 // version 1.1
    out(p + 11) = 0                 // units: none
    writeBE16(out, p + 12, 1); writeBE16(out, p + 14, 1) // densities
    out(p + 16) = 0; out(p + 17) = 0 // no thumbnail
    p += 18
    out(p) = 0xFF.toByte; out(p + 1) = 0xC0.toByte         // SOF0
    writeBE16(out, p + 2, sofLen)
    out(p + 4) = 8 // precision
    writeBE16(out, p + 5, height)
    writeBE16(out, p + 7, width)
    out(p + 9) = 3 // components
    var c = 0
    while (c < 3) { // id, sampling 0x11, quant table 0
      out(p + 10 + 3 * c) = (c + 1).toByte
      out(p + 11 + 3 * c) = 0x11
      out(p + 12 + 3 * c) = 0
      c += 1
    }
    if (!valid) out(1) = 0x00
    out
  }

  /** Walk the marker chain to the first SOF segment and return
    * [width, height, precision, n_components]; NULL (never a throw)
    * on bad SOI, a broken chain, short buffers, or a chain that ends
    * (EOI/SOS/EOF) before any SOF.
    */
  def jpegDims(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 4) return null
    if (bytes(0) != 0xFF.toByte || bytes(1) != 0xD8.toByte) return null
    var p = 2
    while (p + 4 <= bytes.length) {
      if (bytes(p) != 0xFF.toByte) return null
      val m = bytes(p + 1) & 0xff
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        p += 2 // standalone markers carry no length
      } else if (m == 0xD9 || m == 0xDA) {
        return null // EOI / start-of-scan before any SOF
      } else {
        val len = readBE16(bytes, p + 2)
        if (len < 2 || p + 2 + len > bytes.length) return null
        val isSof = (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 &&
          m != 0xCC // DHT/JPG/DAC are not frame headers
        if (isSof) {
          if (len < 8) return null
          return new GenericArrayData(Array(
            readBE16(bytes, p + 7).toLong, // width
            readBE16(bytes, p + 5).toLong, // height
            (bytes(p + 4) & 0xff).toLong,  // precision
            (bytes(p + 9) & 0xff).toLong)) // components
        }
        p += 2 + len
      }
    }
    null
  }

  private def writeType(out: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { out(off + i) = t.charAt(i).toByte; i += 1 }
  }

  private def typeAt(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Minimal ISO-BMFF: ftyp(16) + moov(8 + mvhd(108) + nTracks ×
    * trak(16, holding one 'free' child)) + mdat(8 + 5 filler). The
    * fourth container family and the first NESTED one: metadata sits
    * two levels down (moov → mvhd), so the reader must recurse into
    * box payloads, not just walk a flat chain (PNG/WAV fixed-offset,
    * JPEG flat marker walk). mvhd is the full 108-byte version-0 box
    * (ISO/IEC 14496-12 §8.2.2): timescale at body offset +12,
    * duration at +16, unity rate/volume matrix fields zeroed.
    * `valid=false` corrupts the ftyp type tag.
    */
  def mp4Header(timescale: Int, duration: Int, nTracks: Int,
      valid: Boolean): Array[Byte] = {
    val mvhd = 108
    val trak = 16
    val moov = 8 + mvhd + nTracks * trak
    val out = new Array[Byte](16 + moov + 8 + 5)
    var p = 0
    writeBE(out, p, 16); writeType(out, p + 4, if (valid) "ftyp" else "fxyp")
    writeType(out, p + 8, "isom"); writeBE(out, p + 12, 0)
    p += 16
    writeBE(out, p, moov); writeType(out, p + 4, "moov")
    var q = p + 8
    writeBE(out, q, mvhd); writeType(out, q + 4, "mvhd")
    // body: version/flags(4) ctime(4) mtime(4) TIMESCALE(4) DURATION(4)
    writeBE(out, q + 8, 0); writeBE(out, q + 12, 0); writeBE(out, q + 16, 0)
    writeBE(out, q + 20, timescale); writeBE(out, q + 24, duration)
    q += mvhd
    var t = 0
    while (t < nTracks) {
      writeBE(out, q, trak); writeType(out, q + 4, "trak")
      writeBE(out, q + 8, 8); writeType(out, q + 12, "free")
      q += trak; t += 1
    }
    p += moov
    writeBE(out, p, 8 + 5); writeType(out, p + 4, "mdat")
    var i = 0
    while (i < 5) { out(p + 8 + i) = 'm'; i += 1 }
    out
  }

  /** Nested box walk: validate the leading ftyp, find the top-level
    * moov, walk its CHILD boxes for mvhd (version 0) and trak counts.
    * Returns [timescale, duration, n_tracks]; NULL (never a throw) on
    * short buffers, a non-ftyp start, malformed sizes (< 8 or past
    * the parent), 64-bit sizes (unsupported here), a missing moov or
    * mvhd, or a non-v0 mvhd.
    */
  def mp4Meta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 16) return null
    if (readBE(bytes, 0) < 16 || typeAt(bytes, 4) != "ftyp") return null
    var p = 0
    while (p + 8 <= bytes.length) {
      val size = readBE(bytes, p)
      if (size < 8 || p + size > bytes.length) return null
      if (typeAt(bytes, p + 4) == "moov") {
        var q = p + 8
        val end = p + size.toInt
        var timescale = -1L
        var duration = -1L
        var tracks = 0L
        while (q + 8 <= end) {
          val cs = readBE(bytes, q)
          if (cs < 8 || q + cs > end) return null
          val ct = typeAt(bytes, q + 4)
          if (ct == "mvhd") {
            if (cs < 32 || bytes(q + 8) != 0) return null // v0 only
            timescale = readBE(bytes, q + 20)
            duration = readBE(bytes, q + 24)
          } else if (ct == "trak") {
            tracks += 1
          }
          q += cs.toInt
        }
        if (timescale <= 0 || duration < 0) return null
        return new GenericArrayData(Array(timescale, duration, tracks))
      }
      p += size.toInt
    }
    null
  }

  // ---- BMP container header (REAL format, LITTLE-endian, SIGNED) --------
  // The bitmap sibling completing the container family: BMP's
  // BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes) are
  // little-endian per the public format documentation, and the height
  // field is SIGNED — a negative height means a top-down row order, a
  // real-world flag the other four parsers never exercise. The file
  // size is DERIVED (54 + 4-byte-padded row stride × |height|) and
  // re-validated on parse, the WAV redundant-field discipline.

  /** Spec-correct 54-byte BMP header at 24 bpp: "BM", derived file
    * size, pixel offset 54, header size 40, signed height
    * (negative when `topDown`), 1 plane, BI_RGB. `valid=false`
    * corrupts the second magic byte.
    */
  def bmpHeader(width: Int, height: Int, topDown: Boolean,
      valid: Boolean): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    val fileSize = 54 + stride * height
    val out = new Array[Byte](54)
    out(0) = 'B'; out(1) = if (valid) 'M' else 'A'
    writeLE32(out, 2, fileSize)
    writeLE32(out, 10, 54) // pixel data offset
    writeLE32(out, 14, 40) // BITMAPINFOHEADER size
    writeLE32(out, 18, width)
    writeLE32(out, 22, if (topDown) -height else height)
    writeLE16(out, 26, 1) // planes
    writeLE16(out, 28, 24) // bits per pixel
    writeLE32(out, 30, 0) // compression: BI_RGB
    writeLE32(out, 34, stride * height) // image size
    out
  }

  /** Parse [width, height, bpp, top_down, file_size] out of a BMP
    * header; NULL for anything failing the magic/header-size/planes/
    * compression checks, a non-positive dimension, or a file size
    * inconsistent with the derived stride — short buffers included.
    */
  def bmpDims(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    if (readLE32(bytes, 14) != 40L) return null
    if (readLE16(bytes, 26) != 1L) return null
    if (readLE32(bytes, 30) != 0L) return null
    val width = readLE32(bytes, 18)
    val rawH = readLE32(bytes, 22).toInt // reinterpret as SIGNED int32
    val height = math.abs(rawH.toLong)
    val topDown = if (rawH < 0) 1L else 0L
    if (width <= 0 || width > Int.MaxValue || height <= 0) return null
    val bpp = readLE16(bytes, 28)
    if (bpp != 24L) return null
    val stride = (width * 3 + 3) / 4 * 4
    val fileSize = readLE32(bytes, 2)
    if (fileSize != 54L + stride * height) return null
    new GenericArrayData(Array(width, height, bpp, topDown, fileSize))
  }

  // ---- GIF container header (REAL format — the sixth family member,
  // chosen for the two things the other five never exercise: a PACKED
  // bit-field byte (flag + 3-bit size exponent sharing one octet) and
  // a version string that changes semantics, 87a vs 89a) -------------

  /** GIF header + logical screen descriptor (13 bytes): "GIF89a" when
    * valid ("GIX89a" otherwise — a one-byte magic corruption), width/
    * height LE16, packed byte = GCT flag (bit 7) | color resolution
    * 7 (bits 4-6) | sort 0 (bit 3) | GCT size exponent (bits 0-2),
    * background index 0, aspect 0.
    *
    * Inputs are RANGE-CHECKED, not silently masked: width/height must
    * fit LE16 (1..65535) and gctExp the 3-bit field (0..7), else
    * IllegalArgumentException — a masked out-of-range value would
    * produce a header [[gifMeta]] decodes to DIFFERENT dimensions
    * than the caller asked for.
    */
  def gifHeader(width: Int, height: Int, hasGct: Boolean, gctExp: Int,
      valid: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 0xffff,
      s"gif width must fit LE16 (1..65535): $width")
    require(height >= 1 && height <= 0xffff,
      s"gif height must fit LE16 (1..65535): $height")
    require(gctExp >= 0 && gctExp <= 7,
      s"gif gctExp must fit the 3-bit field (0..7): $gctExp")
    val out = new Array[Byte](13)
    out(0) = 'G'; out(1) = 'I'; out(2) = if (valid) 'F' else 'X'
    out(3) = '8'; out(4) = '9'; out(5) = 'a'
    out(6) = (width & 0xff).toByte; out(7) = ((width >> 8) & 0xff).toByte
    out(8) = (height & 0xff).toByte; out(9) = ((height >> 8) & 0xff).toByte
    val packed = (if (hasGct) 0x80 else 0) | 0x70 | (gctExp & 0x7)
    out(10) = packed.toByte
    out(11) = 0; out(12) = 0
    out
  }

  /** Parse [width, height, has_gct, gct_colors, is_89a] out of a GIF
    * header; NULL on a bad magic/version, a short buffer, or a
    * non-positive dimension. gct_colors = 2^(exp+1) when the flag is
    * set, else 0 — the packed-bit-field decode the other containers
    * never exercise.
    */
  def gifMeta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 13) return null
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') return null
    val is89 = bytes(3) == '8' && bytes(4) == '9' && bytes(5) == 'a'
    val is87 = bytes(3) == '8' && bytes(4) == '7' && bytes(5) == 'a'
    if (!is89 && !is87) return null
    def le16(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8)
    val w = le16(6); val h = le16(8)
    if (w <= 0 || h <= 0) return null
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctColors = if (hasGct) 1L << ((packed & 0x7) + 1) else 0L
    new GenericArrayData(Array(w, h, if (hasGct) 1L else 0L, gctColors,
      if (is89) 1L else 0L))
  }

  // ---- TIFF container header (REAL format — the seventh family
  // member; what's NEW is that the byte-order FLAG is itself data:
  // "II" little-endian vs "MM" big-endian changes how every later
  // field decodes, per the public TIFF 6.0 specification) -----------

  /** Minimal spec-correct TIFF: byte-order mark, magic 42, IFD at
    * offset 8 with two LONG-typed entries (tag 256 ImageWidth, tag
    * 257 ImageLength) and a zero next-IFD pointer — 38 bytes. Both
    * byte orders are legal TIFF and both are exercised; `valid=false`
    * writes magic 43 (the corruption a metadata pass must reject).
    * Range-checked like [[gifHeader]]: dims must be positive (LONG
    * fields hold the full int range, so 2³¹−1 is the only cap).
    */
  def tiffHeader(width: Int, height: Int, bigEndian: Boolean,
      valid: Boolean): Array[Byte] = {
    require(width >= 1, s"tiff width must be positive: $width")
    require(height >= 1, s"tiff height must be positive: $height")
    val out = new Array[Byte](38)
    def put16(off: Int, v: Int): Unit =
      if (bigEndian) { out(off) = ((v >> 8) & 0xff).toByte
        out(off + 1) = (v & 0xff).toByte }
      else { out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte }
    def put32(off: Int, v: Int): Unit =
      if (bigEndian) { out(off) = ((v >>> 24) & 0xff).toByte
        out(off + 1) = ((v >>> 16) & 0xff).toByte
        out(off + 2) = ((v >>> 8) & 0xff).toByte
        out(off + 3) = (v & 0xff).toByte }
      else { out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >>> 8) & 0xff).toByte
        out(off + 2) = ((v >>> 16) & 0xff).toByte
        out(off + 3) = ((v >>> 24) & 0xff).toByte }
    val bom: Byte = if (bigEndian) 'M' else 'I'
    out(0) = bom; out(1) = bom
    put16(2, if (valid) 42 else 43)
    put32(4, 8) // first IFD offset
    put16(8, 2) // entry count
    // entry 0: ImageWidth, type 4 (LONG), count 1
    put16(10, 256); put16(12, 4); put32(14, 1); put32(18, width)
    // entry 1: ImageLength
    put16(22, 257); put16(24, 4); put32(26, 1); put32(30, height)
    put32(34, 0) // next IFD: none
    out
  }

  /** Parse [width, height, big_endian, n_entries] out of a TIFF
    * header, honoring the byte-order mark for EVERY later read; NULL
    * on an unknown mark, a magic ≠ 42, a short buffer, an
    * out-of-buffer IFD, an unknown tag layout, or a non-positive
    * dimension. Tags may be SHORT (3) or LONG (4) — SHORT values are
    * left-justified in the 4-byte value field per the spec.
    */
  def tiffMeta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 8) return null
    val big =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return null
    def rd16(off: Int): Long =
      if (off + 2 > bytes.length) -1L
      else if (big) ((bytes(off) & 0xffL) << 8) | (bytes(off + 1) & 0xffL)
      else ((bytes(off + 1) & 0xffL) << 8) | (bytes(off) & 0xffL)
    def rd32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else if (big) ((bytes(off) & 0xffL) << 24) |
        ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      else ((bytes(off + 3) & 0xffL) << 24) |
        ((bytes(off + 2) & 0xffL) << 16) |
        ((bytes(off + 1) & 0xffL) << 8) | (bytes(off) & 0xffL)
    if (rd16(2) != 42L) return null
    val ifd = rd32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return null
    val n = rd16(ifd.toInt)
    if (n < 0 || ifd + 2 + n * 12 > bytes.length) return null
    var w = -1L; var h = -1L
    var i = 0
    while (i < n) {
      val off = ifd.toInt + 2 + i * 12
      val tag = rd16(off)
      val typ = rd16(off + 2)
      // SHORT values sit left-justified in the value field (spec
      // §2: "the Value is left-justified within the 4-byte field")
      val v = if (typ == 3L) rd16(off + 8)
        else if (typ == 4L) rd32(off + 8)
        else -1L
      if (tag == 256L) w = v
      if (tag == 257L) h = v
      i += 1
    }
    if (w <= 0 || h <= 0) return null
    new GenericArrayData(Array(w, h, if (big) 1L else 0L, n))
  }

  // ---- TAR (ustar) entry header (REAL format — the eighth family
  // member; what's NEW is numbers-as-ASCII-OCTAL fields and a
  // checksum whose own field is summed as spaces, per the public
  // POSIX ustar layout) ---------------------------------------------

  /** Spec-correct 512-byte ustar header: NUL-padded name, octal
    * mode/uid/gid, 11-digit octal size and mtime, computed checksum
    * (6 octal digits, NUL, space — with the checksum field itself
    * counted as 8 spaces), typeflag, "ustar\0" magic + "00" version.
    * `valid=false` adds 1 to the stored checksum — the corruption a
    * catalog pass must reject. Size/mtime must fit 11 octal digits
    * (< 8^11 = 2^33); name ≤ 100 bytes.
    */
  def tarHeader(name: UTF8String, size: Long, mtime: Long,
      typeflag: Int, valid: Boolean): Array[Byte] = {
    val nm = name.toString
    require(nm.getBytes("UTF-8").length <= 100, s"tar name > 100B: $nm")
    require(size >= 0 && size < (1L << 33), s"tar size out of range: $size")
    require(mtime >= 0 && mtime < (1L << 33), s"tar mtime out of range: $mtime")
    require(typeflag >= 0 && typeflag <= 9, s"tar typeflag 0..9: $typeflag")
    val out = new Array[Byte](512)
    val nb = nm.getBytes("UTF-8")
    System.arraycopy(nb, 0, out, 0, nb.length)
    def putOctal(off: Int, width: Int, v: Long): Unit = {
      // width-1 octal digits then NUL (the GNU/POSIX "%0*llo\0" form)
      var x = v
      var i = off + width - 2
      while (i >= off) { out(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
      out(off + width - 1) = 0
    }
    putOctal(100, 8, 420)   // mode 0644
    putOctal(108, 8, 0)     // uid
    putOctal(116, 8, 0)     // gid
    putOctal(124, 12, size)
    putOctal(136, 12, mtime)
    out(156) = ('0' + typeflag).toByte
    out(257) = 'u'; out(258) = 's'; out(259) = 't'; out(260) = 'a'
    out(261) = 'r'; out(262) = 0; out(263) = '0'; out(264) = '0'
    // checksum: sum of all 512 bytes with the chksum field as spaces
    var i = 148
    while (i < 156) { out(i) = ' '; i += 1 }
    var sum = 0L
    i = 0
    while (i < 512) { sum += (out(i) & 0xffL); i += 1 }
    if (!valid) sum += 1
    // stored as 6 octal digits, NUL, space
    var x = sum
    i = 153
    while (i >= 148) { out(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
    out(154) = 0; out(155) = ' '
    out
  }

  /** Parse [size, mtime, typeflag] out of a ustar header after
    * validating the magic AND the checksum (recomputed with the
    * checksum field as spaces — the spec's own self-check); NULL on a
    * short buffer, a bad magic, a malformed octal field, or a
    * checksum mismatch.
    */
  def tarMeta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 512) return null
    if (bytes(257) != 'u' || bytes(258) != 's' || bytes(259) != 't' ||
      bytes(260) != 'a' || bytes(261) != 'r' || bytes(262) != 0) return null
    def octal(off: Int, width: Int): Long = {
      var v = 0L
      var i = off
      var seen = false
      while (i < off + width) {
        val b = bytes(i) & 0xff
        if (b >= '0' && b <= '7') { v = (v << 3) | (b - '0'); seen = true }
        else if (b == 0 || b == ' ') { /* terminator/pad */ }
        else return -1L
        i += 1
      }
      if (seen) v else -1L
    }
    val stored = octal(148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (bytes(i) & 0xffL))
      i += 1
    }
    if (stored < 0 || stored != sum) return null
    val size = octal(124, 12)
    val mtime = octal(136, 12)
    if (size < 0 || mtime < 0) return null
    new GenericArrayData(Array(size, mtime, (bytes(156) - '0').toLong))
  }

  /** The entry name out of a ustar header (NUL-terminated, ≤ 100
    * bytes); null when [[tarMeta]] would reject the header.
    */
  def tarName(bytes: Array[Byte]): UTF8String = {
    if (tarMeta(bytes) == null) return null
    var end = 0
    while (end < 100 && bytes(end) != 0) end += 1
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, 0, end))
  }

  // ---- gzip member (RFC 1952 — the NINTH container family member;
  // what's NEW is the variable-length middle: optional FEXTRA behind
  // an XLEN count, an optional NUL-terminated FNAME that must be
  // WALKED (no length field anywhere), reserved FLG bits that a
  // conforming reader must reject, and a trailer addressed from the
  // END of the member rather than the start) ------------------------

  /** Spec-correct single-member gzip layout: magic 1f 8b, CM = 8
    * (deflate), FLG = FEXTRA|FNAME as requested, MTIME LE32, XFL = 2,
    * OS = 3 (unix); an 8-byte FEXTRA block (XLEN=6, subfield 'G','R',
    * LEN=2, two derived data bytes) when `hasExtra`; a NUL-terminated
    * FNAME of `fnameLen` 'a'..'z'-cycle bytes when `fnameLen` > 0; a
    * 4-byte stored-block stand-in body; and the LE32 CRC32/ISIZE
    * trailer with derived values (crc = mtime mod 1000 · 7 + fnameLen,
    * isize = fnameLen · 7 + 11) so the oracle can recompute them
    * algebraically. `valid=false` corrupts the second magic byte.
    * Range-checked like [[gifHeader]]: mtime must fit LE32 unsigned
    * (here: non-negative int) and fnameLen 0..255.
    */
  def gzipHeader(mtime: Int, fnameLen: Int, hasExtra: Boolean,
      valid: Boolean): Array[Byte] = {
    require(mtime >= 0, s"gzip mtime must be non-negative: $mtime")
    require(fnameLen >= 0 && fnameLen <= 255,
      s"gzip fnameLen must be 0..255: $fnameLen")
    val extra = if (hasExtra) 8 else 0 // XLEN(2) + 'G','R',LEN(2),data(2)
    val name = if (fnameLen > 0) fnameLen + 1 else 0
    val out = new Array[Byte](10 + extra + name + 4 + 8)
    out(0) = 0x1f; out(1) = (if (valid) 0x8b else 0x8c).toByte
    out(2) = 8 // CM: deflate
    out(3) = ((if (hasExtra) 0x04 else 0) |
      (if (fnameLen > 0) 0x08 else 0)).toByte
    writeLE32(out, 4, mtime)
    out(8) = 2 // XFL: max compression
    out(9) = 3 // OS: unix
    var p = 10
    if (hasExtra) {
      writeLE16(out, p, 6) // XLEN
      out(p + 2) = 'G'; out(p + 3) = 'R'
      writeLE16(out, p + 4, 2)
      out(p + 6) = (mtime & 0xff).toByte
      out(p + 7) = (fnameLen & 0xff).toByte
      p += 8
    }
    if (fnameLen > 0) {
      var i = 0
      while (i < fnameLen) { out(p + i) = ('a' + i % 26).toByte; i += 1 }
      out(p + fnameLen) = 0
      p += fnameLen + 1
    }
    // stored-block stand-in body (final stored block, zero length)
    out(p) = 0x01; out(p + 1) = 0; out(p + 2) = 0
    out(p + 3) = 0xff.toByte
    p += 4
    writeLE32(out, p, mtime % 1000 * 7 + fnameLen) // CRC32 stand-in
    writeLE32(out, p + 4, fnameLen * 7 + 11) // ISIZE
    out
  }

  /** Parse [mtime, os, has_extra, fname_len, header_len, isize] out
    * of a gzip member; NULL (never a throw) on a short buffer, bad
    * magic, a CM other than deflate, any RESERVED FLG bit set, an
    * FEXTRA block running past the body, an unterminated FNAME, or a
    * member too short to hold the 8-byte trailer after the header —
    * the walk-and-reject discipline a real gzip reader needs.
    */
  def gzipMeta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 22) return null
    if (bytes(0) != 0x1f || bytes(1) != 0x8b.toByte) return null
    if (bytes(2) != 8) return null
    val flg = bytes(3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved bits
    val mtime = readLE32(bytes, 4)
    val os = (bytes(9) & 0xff).toLong
    var p = 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (p + 2 > bytes.length) return null
      val xlen = readLE16(bytes, p).toInt
      p += 2 + xlen
      if (p > bytes.length - 12) return null
    }
    var fnameLen = 0L
    if ((flg & 0x08) != 0) { // FNAME: walk to the NUL
      val start = p
      while (p < bytes.length - 12 && bytes(p) != 0) p += 1
      if (p >= bytes.length - 12) return null // unterminated
      fnameLen = (p - start).toLong
      p += 1
    }
    if (p + 4 + 8 > bytes.length) return null // body + trailer must fit
    val isize = readLE32(bytes, bytes.length - 4)
    new GenericArrayData(Array(mtime, os,
      if ((flg & 0x04) != 0) 1L else 0L, fnameLen, p.toLong, isize))
  }

  // ---- ZIP central directory + EOCD (the TENTH container member;
  // what's NEW is that the entry point is found by a BACKWARDS scan:
  // the end-of-central-directory record sits a variable-length
  // comment before EOF, so a reader walks back looking for the
  // signature and must disambiguate a signature-shaped byte run
  // INSIDE the comment via the comment-length consistency check) ----

  /** Minimal spec-shaped ZIP catalog: `nEntries` central-directory
    * headers (46 bytes + a 2-byte name "f0".."f4", derived crc/size
    * fields) followed by the 22-byte EOCD (counts, CD size, CD offset
    * 0, comment length) and `commentLen` 'c' bytes. `valid=false`
    * corrupts the EOCD signature. Range-checked: 1..5 entries (2-byte
    * names by construction), comment 0..255.
    */
  def zipCatalog(nEntries: Int, commentLen: Int,
      valid: Boolean): Array[Byte] = {
    require(nEntries >= 1 && nEntries <= 5,
      s"zip nEntries must be 1..5: $nEntries")
    require(commentLen >= 0 && commentLen <= 255,
      s"zip commentLen must be 0..255: $commentLen")
    val entry = 46 + 2
    val cdSize = entry * nEntries
    val out = new Array[Byte](cdSize + 22 + commentLen)
    var p = 0
    var i = 0
    while (i < nEntries) {
      out(p) = 'P'; out(p + 1) = 'K'; out(p + 2) = 1; out(p + 3) = 2
      writeLE32(out, p + 16, i * 3 + 7) // crc32 (derived stand-in)
      writeLE32(out, p + 20, i * 3 + 7) // compressed size
      writeLE32(out, p + 24, i * 5 + 11) // uncompressed size
      writeLE16(out, p + 28, 2) // name length
      writeLE32(out, p + 42, i * 10) // local header offset
      out(p + 46) = 'f'; out(p + 47) = ('0' + i).toByte
      p += entry
      i += 1
    }
    out(p) = 'P'; out(p + 1) = 'K'; out(p + 2) = 5
    out(p + 3) = (if (valid) 6 else 7).toByte
    writeLE16(out, p + 8, nEntries) // entries on this disk
    writeLE16(out, p + 10, nEntries) // entries total
    writeLE32(out, p + 12, cdSize)
    writeLE32(out, p + 16, 0) // CD offset
    writeLE16(out, p + 20, commentLen)
    var c = 0
    while (c < commentLen) { out(p + 22 + c) = 'c'; c += 1 }
    out
  }

  /** Parse [n_entries, cd_size, comment_len, total_name_len,
    * total_usize] out of a ZIP catalog by the real-reader discipline:
    * scan BACKWARDS from EOF for the EOCD signature, accept a
    * candidate only if its comment-length field reaches exactly to
    * EOF (rejecting signature look-alikes inside the comment), then
    * walk the central directory forward validating each entry
    * signature and the entry count. NULL on any failure.
    */
  def zipMeta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 22) return null
    var p = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 65535)
    var eocd = -1
    while (p >= floor && eocd < 0) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 5 &&
        bytes(p + 3) == 6 &&
        readLE16(bytes, p + 20) == (bytes.length - (p + 22)).toLong)
        eocd = p
      else p -= 1
    }
    if (eocd < 0) return null
    val nEntries = readLE16(bytes, eocd + 10)
    val cdSize = readLE32(bytes, eocd + 12)
    val cdOff = readLE32(bytes, eocd + 16)
    if (cdOff + cdSize > eocd) return null
    var q = cdOff.toInt
    val end = (cdOff + cdSize).toInt
    var seen = 0L
    var nameBytes = 0L
    var usize = 0L
    while (q + 46 <= end) {
      if (bytes(q) != 'P' || bytes(q + 1) != 'K' || bytes(q + 2) != 1 ||
        bytes(q + 3) != 2) return null
      val nameLen = readLE16(bytes, q + 28).toInt
      usize += readLE32(bytes, q + 24)
      if (q + 46 + nameLen > end) return null
      seen += 1
      nameBytes += nameLen
      q += 46 + nameLen
    }
    if (q != end || seen != nEntries) return null
    new GenericArrayData(Array(nEntries, cdSize,
      (bytes.length - (eocd + 22)).toLong, nameBytes, usize))
  }

  /** Frame i covers code units [i*len/n, (i+1)*len/n) (integer floor);
    * the feature is the plain code-unit sum — 0 for empty frames,
    * mirroring the oracle's coalesce(list_sum(...), 0).
    */
  def frameSums(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var j = i * len / n
      val end = (i + 1) * len / n
      var sum = 0L
      while (j < end) { sum += str.charAt(j).toLong; j += 1 }
      out(i) = sum
      i += 1
    }
    new GenericArrayData(out)
  }
}

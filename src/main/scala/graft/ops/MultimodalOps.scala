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

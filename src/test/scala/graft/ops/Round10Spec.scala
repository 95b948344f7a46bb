package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 units: substring-granular dedup (repeated k-gram spans)
  * and the CDC NULL-payload row-atomicity contract.
  */
class Round10Spec extends EtlSpecBase {

  import spark.implicits._

  // ---- shingleHashSeq ----------------------------------------------------

  test("shingleHashSeq: positional, with multiplicity, matches the ngram formula") {
    val df = Seq("a b a b a", "x y", "short").toDF("t")
    val got = df.select(DedupOps.shingleHashSeq(col("t"), 2).as("seq"),
      transform(TextOps.ngrams(col("t"), 2), g => TextOps.tokenHash(g)).as("formula"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
    // "a b a b a" has 4 bigrams: ab ba ab ba -> multiplicity kept
    assert(got(0).getSeq[Long](0).length == 4)
    assert(got(0).getSeq[Long](0).distinct.length == 2)
  }

  test("shingleHashSeq: doc shorter than k yields an empty array") {
    val df = Seq("solo").toDF("t")
    val got = df.select(DedupOps.shingleHashSeq(col("t"), 2)).as[Seq[Long]].collect()
    assert(got.head.isEmpty)
  }

  // ---- repeatedKgramSpans ------------------------------------------------

  private def spanDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "t")

  test("repeatedKgramSpans: cross-doc hot grams, gap<=k merges, gap>k splits") {
    // k=2, minRepeats=2. Hot bigrams: "a b" (docs 1+2), "c d" (docs 1+2).
    val df = spanDf(
      1L -> "a b c d e",     // hot starts 0 ("a b") and 2 ("c d"): gap 2 <= k -> ONE span 0..3
      2L -> "a b x c d y",   // hot starts 0 and 3: gap 3 > k -> TWO spans 0..1, 3..4
      3L -> "z z",           // "z z" occurs once in the corpus -> not hot
      4L -> "q")             // shorter than k -> no grams at all
    val got = DedupOps.repeatedKgramSpans(df, "doc_id", "t", 2, 2)
      .orderBy("doc_id", "span_start").collect()
    assert(got.toSeq == Seq(
      Row(1L, 0L, 3L, 4L, 2L),
      Row(2L, 0L, 1L, 2L, 1L),
      Row(2L, 3L, 4L, 2L, 1L)), got.mkString(", "))
  }

  test("repeatedKgramSpans: WITHIN-doc repetition alone makes a gram hot") {
    // "m n" x3 and "n m" x2 inside one doc -> every position hot -> one span
    val df = spanDf(1L -> "m n m n m n", 2L -> "u v w")
    val got = DedupOps.repeatedKgramSpans(df, "doc_id", "t", 2, 2).collect()
    assert(got.toSeq == Seq(Row(1L, 0L, 5L, 6L, 5L)), got.mkString(", "))
  }

  test("repeatedKgramSpans: minRepeats raises the hotness bar") {
    val df = spanDf(1L -> "a b c", 2L -> "a b d", 3L -> "a b e")
    // "a b" occurs 3x -> hot at minRepeats=3; "b c"/"b d"/"b e" are not
    val got3 = DedupOps.repeatedKgramSpans(df, "doc_id", "t", 2, 3)
      .orderBy("doc_id").collect()
    assert(got3.toSeq == Seq(
      Row(1L, 0L, 1L, 2L, 1L),
      Row(2L, 0L, 1L, 2L, 1L),
      Row(3L, 0L, 1L, 2L, 1L)), got3.mkString(", "))
    assert(DedupOps.repeatedKgramSpans(df, "doc_id", "t", 2, 4).count() == 0)
  }

  // ---- tokenBudget -------------------------------------------------------

  private def docsOf(rows: (String, Int)*) = {
    // (source, nDocs) -> each doc has 100 whitespace tokens
    rows.toSeq.flatMap { case (s, n) =>
      (1 to n).map(i => (s, Seq.fill(100)("t").mkString(" ")))
    }.toDF("source", "text")
  }

  test("tokenBudget: cap binds on the sqrt-boosted small source; leftover redistributes") {
    // A: 100 tokens (w=10), B: 10000 tokens (w=100); T=10100, W=110.
    // budget=1.0 epoch of T = 10100; cap=2.0 epochs.
    // desired_A = 10100*10 div 110 = 918 -> capped at 200
    // desired_B = 10100*100 div 110 = 9181 (uncapped)
    // leftover = 10100 - (200 + 9181) = 719, all to B: 9900 <= 20000
    val df = docsOf("A" -> 1, "B" -> 100)
    val got = MixOps.tokenBudget(df, "source", "text", 1000L, 200L)
      .orderBy("source").collect()
    assert(got.toSeq == Seq(
      Row("A", 100L, 10L, 200L, 2000000L),
      Row("B", 10000L, 100L, 9900L, 990000L)), got.mkString(", "))
  }

  test("tokenBudget: every source capped -> budget underflows, no redistribution target") {
    // budget = 10 epochs, cap = 1 epoch: both sources pin to exactly
    // their inventory; the un-spendable surplus is reported by the
    // allocations summing below budget (policy belongs to the caller)
    val df = docsOf("A" -> 1, "B" -> 100)
    val got = MixOps.tokenBudget(df, "source", "text", 10000L, 100L)
      .orderBy("source").collect()
    assert(got.toSeq == Seq(
      Row("A", 100L, 10L, 100L, 1000000L),
      Row("B", 10000L, 100L, 10000L, 1000000L)), got.mkString(", "))
  }

  // ---- pcaTopComponent ---------------------------------------------------

  test("pcaTopComponent: recovers the dominant direction of a rank-1 cloud") {
    // zero-mean points along (0.6, 0.8): the top component IS that
    // direction (up to the deterministic sign of the uniform init,
    // positive here since dot((.7,.7),(.6,.8)) > 0)
    val df = Seq(-2.0, -1.0, 1.0, 2.0)
      .map(t => Tuple1(Array((0.6 * t).toFloat, (0.8 * t).toFloat)))
      .toDF("embedding")
    val v = SimilarityOps.pcaTopComponent(df, dims = 2, iters = 3)
      .orderBy("dim").collect().map(_.getDouble(1))
    assert(math.abs(v(0) - 0.6) < 2e-3 && math.abs(v(1) - 0.8) < 2e-3,
      v.mkString(", "))
    val norm = math.sqrt(v(0) * v(0) + v(1) * v(1))
    assert(math.abs(norm - 1.0) < 2e-3, s"norm $norm")
  }

  // ---- psiDrift ----------------------------------------------------------

  test("psiDrift: identical slices read zero PSI; empty bins clamp, not blow up") {
    val df = (1 to 100).flatMap(i =>
      Seq(("r", i.toDouble), ("c", i.toDouble))).toDF("tag", "v")
    val got = StatsOps.psiDrift(df, col("v"), col("tag") === "r",
      col("tag") === "c", 5).collect()
    assert(got.length == 5)
    assert(got.forall(_.getLong(4) == 0L), got.mkString(", "))
  }

  test("psiDrift: one-sided bin contributes a large finite term via the >=1 clamp") {
    // ref only in [0,10), cur only in [10,20): every bin one-sided
    val df = ((1 to 50).map(i => ("r", i % 10 + 0.5)) ++
      (1 to 50).map(i => ("c", i % 10 + 10.5))).toDF("tag", "v")
    val got = StatsOps.psiDrift(df, col("v"), col("tag") === "r",
      col("tag") === "c", 2).orderBy("bin").collect()
    assert(got.length == 2)
    val psi = got.head.getLong(4)
    // p=50/50 vs q=1/50 per side: term = (1 - 0.02)*ln(50) ~ 3.834 each
    assert(psi > 7000000L, s"one-sided drift must read large PSI, got $psi")
    assert(got.forall(_.getLong(3) > 0L), got.mkString(", "))
  }

  test("psiDrift: an empty slice yields an empty result, not a div-0 error") {
    val df = (1 to 10).map(i => ("r", i.toDouble)).toDF("tag", "v")
    assert(StatsOps.psiDrift(df, col("v"), col("tag") === "r",
      col("tag") === "c", 4).count() == 0)
  }

  // ---- PNG header kernels ------------------------------------------------

  test("pngDims: parses a hand-written spec-literal 1x1 RGBA header") {
    // bytes straight from the PNG spec (signature + IHDR), NOT from
    // pngHeader — pins the parser to the real format so a shared
    // offset bug in synth+parse cannot cancel out
    val specLiteral: Array[Byte] = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, // IHDR length 13
      0x49, 0x48, 0x44, 0x52, // "IHDR"
      0x00, 0x00, 0x00, 0x01, // width 1 (big-endian)
      0x00, 0x00, 0x00, 0x01, // height 1
      0x08, 0x06 // bit depth 8, color type 6
    ).map(_.toByte)
    val got = MultimodalKernels.pngDims(specLiteral)
    assert(got != null && got.toLongArray().toSeq == Seq(1L, 1L, 8L, 6L))
  }

  test("pngHeader/pngDims roundtrip; corruption and truncation return null") {
    val ok = MultimodalKernels.pngDims(
      MultimodalKernels.pngHeader(640, 480, valid = true))
    assert(ok.toLongArray().toSeq == Seq(640L, 480L, 8L, 6L))
    assert(MultimodalKernels.pngDims(
      MultimodalKernels.pngHeader(640, 480, valid = false)) == null)
    assert(MultimodalKernels.pngDims(Array[Byte](1, 2, 3)) == null)
    assert(MultimodalKernels.pngDims(
      MultimodalKernels.pngHeader(640, 480, valid = true).take(20)) == null)
  }

  // ---- cdcApply NULL payloads -------------------------------------------

  test("cdcApply: a NULL payload column on the winning row SURVIVES (no stale resurrection)") {
    val log = Seq(
      (1L, 1L, "upsert", Option(10.0), Option("A")),
      (1L, 2L, "upsert", Option(20.0), Option("B")),
      (1L, 3L, "upsert", None: Option[Double], None: Option[String]) // winner: all-NULL payload
    ).toDF("k", "seq", "op", "price", "status")
    val got = ScdOps.cdcApply(log, "k", "seq", "op", Seq("price", "status"))
      .collect()
    assert(got.toSeq == Seq(Row(1L, null, null, 3L)), got.mkString(", "))
  }
}

package graft.queries

import graft.ops.MultimodalKernels

/** Hand-computed units for q327-q330 plus gzip kernel edge paths. */
class Round13fSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q327 DW/Ljung-Box: a 7-day linear ramp — hand-computed moments, " +
    "sign-safe negative-lag grid, BigInt-checked Q accumulation") {
    // rev_u = [10..70] cents, mean 40 exactly: e = [-30..30 step 10],
    // Σe² = 2800, Σ(Δe)² = 600, m = [1600, 500, -400, -1000, -1200]
    val dir = plant("orders" -> (1 to 7).map(d =>
      (ts(f"2024-01-0${d}T00:00:00Z"), d * 0.10))
      .toDF("o_orderdate", "o_totalprice"))
    val rPpb = Seq(571428571L, 178571428L, -142857142L, -357142857L,
      -428571428L)
    var cum = BigInt(0)
    val expected = rPpb.zipWithIndex.map { case (r, i) =>
      val k = i + 1
      cum += BigInt(63) * BigInt(r) * BigInt(r) / (BigInt(7 - k) * 1000000000L)
      (k.toLong, r, cum.toLong, 600L * 1000000000L / 2800L)
    }
    val got = run("q327_autocorr_diagnostics", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q328 gzip metadata: absent-FNAME, FEXTRA, plain, and corrupt " +
    "payloads decode to hand-computed fields") {
    val dir = plant("documents" -> Seq(
      (1L, 5L), // plain + 5-byte name: header 16, isize 46
      (3L, 40L), // FEXTRA + NO name (40 % 40 = 0): header 18, isize 11
      (6L, 2L), // FEXTRA + 2-byte name: header 21, isize 25
      (7L, 9L)) // corrupted magic -> NULL row
      .toDF("doc_id", "n_chars"))
    val got = run("q328_gzip_metadata", dir).collect()
    val vals = got.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(vals.toSeq == Seq(
      (1L, 97L, 3L, 0L, 5L, 16L, 46L),
      (3L, 291L, 3L, 1L, 0L, 18L, 11L),
      (6L, 582L, 3L, 1L, 2L, 21L, 25L)), vals.mkString(", "))
    val corrupt = got.find(_.getLong(0) == 7L).get
    assert((1 to 6).forall(corrupt.isNullAt), corrupt.toString)
  }

  test("gzip kernel: spec-literal pin and the reject paths (reserved " +
    "FLG bit, unterminated FNAME, truncation)") {
    val b = MultimodalKernels.gzipHeader(97, 2, false, true)
    assert(b(0) == 0x1f && b(1) == 0x8b.toByte && b(2) == 8 && b(3) == 0x08)
    assert(b(4) == 97 && b(5) == 0 && b(6) == 0 && b(7) == 0) // MTIME LE32
    assert(b(9) == 3 && b(10) == 'a' && b(11) == 'b' && b(12) == 0)
    assert(b.length == 25)
    val m = MultimodalKernels.gzipMeta(b)
    assert(m != null && m.toLongArray().toSeq ==
      Seq(97L, 3L, 0L, 2L, 13L, 25L))
    val reserved = b.clone(); reserved(3) = (reserved(3) | 0x20).toByte
    assert(MultimodalKernels.gzipMeta(reserved) == null)
    val unterminated = b.clone(); unterminated(12) = 'x'
    assert(MultimodalKernels.gzipMeta(unterminated) == null)
    assert(MultimodalKernels.gzipMeta(b.take(20)) == null)
    assert(MultimodalKernels.gzipMeta(null) == null)
  }

  test("q329 IPS policy eval: hand-computed cells, the best-action " +
    "tie resolves to the lexicographically first action") {
    def ev(u: Long, t: String, v: Double, i: Long) =
      (i, u, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev(0, "click", 1.00, 0), ev(0, "click", 1.00, 1), ev(0, "view", 3.00, 2),
      ev(1, "purchase", 2.00, 3), ev(1, "purchase", 2.00, 4),
      ev(1, "error", 1.00, 5),
      ev(2, "click", 1.00, 6), ev(2, "view", 1.00, 7))
      .toDF("event_id", "user_id", "event_type", "value", "ts"))
    val got = run("q329_ips_policy_eval", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 3L, "view", 166666666L, 245000000L, 78333334L),
      (1L, 3L, "purchase", 166666666L, 165000000L, -1666666L),
      (2L, 2L, "click", 100000000L, 85000000L, -15000000L)),
      got.mkString(", "))
  }

  test("q330 HHI: a 75/25 duopoly scores 0.625 in ppb; a monopoly " +
    "scores exactly 1e9") {
    val dir = plant(
      "lineitem" -> Seq((1L, 3.00), (2L, 1.00), (3L, 2.00))
        .toDF("l_suppkey", "l_extendedprice"),
      "supplier" -> Seq((1L, 0), (2L, 0), (3L, 1))
        .toDF("s_suppkey", "s_nationkey"),
      "nation" -> Seq((0, "ALPHA"), (1, "BETA"))
        .toDF("n_nationkey", "n_name"))
    val got = run("q330_hhi_concentration", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("ALPHA", 2L, 400L, 625000000L, 750000L),
      ("BETA", 1L, 200L, 1000000000L, 1000000L)), got.mkString(", "))
  }
}

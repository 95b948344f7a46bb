package graft.queries

import graft.ops.MultimodalKernels

/** Hand-computed units for q339-q342 plus ZIP kernel edge paths. */
class Round13iSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q339 zip catalog: hand-computed entry/size/name/usize fields; " +
    "corrupt EOCD comes back NULL") {
    val dir = plant("documents" -> Seq(
      (1L, 3L), // 2 entries, comment 3
      (4L, 19L), // 5 entries, comment 19
      (5L, 0L), // 1 entry, no comment
      (7L, 9L)) // corrupted EOCD signature
      .toDF("doc_id", "n_chars"))
    val got = run("q339_zip_catalog", dir).collect()
    val vals = got.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(vals.toSeq == Seq(
      (1L, 2L, 96L, 3L, 4L, 27L),
      (4L, 5L, 240L, 19L, 10L, 105L),
      (5L, 1L, 48L, 0L, 2L, 11L)), vals.mkString(", "))
    val corrupt = got.find(_.getLong(0) == 7L).get
    assert((1 to 5).forall(corrupt.isNullAt), corrupt.toString)
  }

  test("zip kernel: a signature look-alike INSIDE the comment is " +
    "rejected by the comment-length check; CD corruption nulls") {
    val b = MultimodalKernels.zipCatalog(2, 30, true)
    assert(b.length == 2 * 48 + 22 + 30)
    val base = MultimodalKernels.zipMeta(b).toLongArray().toSeq
    assert(base == Seq(2L, 96L, 30L, 4L, 27L))
    // plant a fake EOCD signature in the comment (offset 120, inside
    // the 'c' run); its comment-length field reads 'cc' = 25443 which
    // does not reach EOF, so the scan must skip it and find the real
    // record at 96
    val faked = b.clone()
    faked(120) = 'P'; faked(121) = 'K'; faked(122) = 5; faked(123) = 6
    assert(MultimodalKernels.zipMeta(faked).toLongArray().toSeq == base)
    val badCd = b.clone(); badCd(0) = 'X'
    assert(MultimodalKernels.zipMeta(badCd) == null)
    assert(MultimodalKernels.zipMeta(b.take(20)) == null)
    assert(MultimodalKernels.zipMeta(null) == null)
  }

  test("q340 ALS step: hand-computed rank-1 alternation with a non-zero " +
    "residual on the asymmetric user") {
    def ev(u: Long, t: String, v: Double, i: Long) =
      (i, u, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev(1, "a", 1.00, 0), ev(1, "a", 3.00, 1), ev(1, "b", 4.00, 2),
      ev(2, "a", 4.00, 3))
      .toDF("event_id", "user_id", "event_type", "value", "ts"))
    // r: (u1,a)=200000 (u1,b)=400000 (u2,a)=400000 milli-cents;
    // uf(u1)=300000, uf(u2)=400000; vf(a) = 2.2e11//2.5e8 = 880,
    // vf(b) = 1.2e11//9e7 = 1333; residuals a: {-64000, 48000} ->
    // mse 3.2e9; b: {100} -> mse 10000
    val got = run("q340_als_step", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 2L, 880L, 3200000000L), ("b", 1L, 1333L, 10000L)),
      got.mkString(", "))
  }

  test("q341 decision stump: hand-computed Gini gains over three " +
    "buckets; the purer first boundary wins") {
    def o(price: Double, st: String) = (price, st)
    val dir = plant("orders" -> (
      Seq.fill(3)(o(100.00, "F")) ++ Seq(o(100.00, "O")) ++
        (o(60000.00, "F") +: Seq.fill(3)(o(60000.00, "O"))) ++
        Seq.fill(2)(o(120000.00, "O")))
      .toDF("o_totalprice", "o_orderstatus"))
    // parent gini 480000000; split@5e6: gl 375000000, gr 277777778,
    // gain 163333334; split@1e7: gl 5e8, gr 0, gain 80000000
    val got = run("q341_decision_stump", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (5000000L, 4L, 3L, 163333334L, true),
      (10000000L, 8L, 4L, 80000000L, false)), got.mkString(", "))
  }

  test("q342 business days: weekend-spanning and weekend-starting " +
    "latencies count only weekdays") {
    val dir = plant(
      "orders" -> Seq(
        (1L, ts("1995-01-02T00:00:00Z"), "1-URGENT"), // Monday
        (2L, ts("1995-01-07T00:00:00Z"), "2-HIGH")) // Saturday
        .toDF("o_orderkey", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq(
        (1L, ts("1995-01-06T00:00:00Z")), // Friday: 4 business days
        (1L, ts("1995-01-09T00:00:00Z")), // next Monday: 5 (7 calendar)
        (2L, ts("1995-01-09T00:00:00Z"))) // Sat->Mon: 1
        .toDF("l_orderkey", "l_shipdate"))
    val got = run("q342_business_days", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("1-URGENT", 2L, 4500L, 5L, 1000000L),
      ("2-HIGH", 1L, 1000L, 1L, 1000000L)), got.mkString(", "))
  }
}

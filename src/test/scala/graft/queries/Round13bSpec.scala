package graft.queries

/** Hand-computed units for q313-q315. */
class Round13bSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def ev(id: Long, u: Long, ty: String, v: Double) =
    (id, u, ty, ts("2024-01-01T10:00:00Z"), v)

  test("q313 Krippendorff: textbook zero-alpha case; single-rating " +
    "units excluded; degenerate all-agree margins yield NULL") {
    // u1 {1,1} agree, u2 {1,0} disagree, u3 {1} not pairable:
    // N=4, N1=3, Do = 2*1*1/(2-1) = 2, De = 2*3*1 = 6,
    // alpha = 1 - 3*2/6 = 0 (the classic "agreement is chance" read)
    val dir = plant("events" -> Seq(
      ev(0, 1, "click", 150), ev(1, 1, "view", 150),
      ev(2, 2, "click", 150), ev(3, 2, "view", 10),
      ev(4, 3, "click", 150))
      .toDF("event_id", "user_id", "event_type", "ts", "value"))
    val got = run("q313_krippendorff_alpha", dir).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((2L, 4L, 0L)), got.toString)
    // all ratings identical -> De = 0 -> NULL verdict, not an error
    val dir2 = plant("events" -> Seq(
      ev(0, 1, "click", 150), ev(1, 1, "view", 150),
      ev(2, 2, "click", 150), ev(3, 2, "view", 150))
      .toDF("event_id", "user_id", "event_type", "ts", "value"))
    val got2 = run("q313_krippendorff_alpha", dir2).collect()(0)
    assert(got2.getLong(1) == 4L && got2.isNullAt(2), got2.toString)
  }

  test("q314 Heaps fit: the OLS slope over the hand-built cumulative " +
    "curve matches a plain-Scala reimplementation") {
    // bs = (3+20) div 20 = 1 -> one bucket per doc.
    // cum tokens (2,4,6,7); cum vocab (2,3,3,4)
    val dir = plant("documents" -> Seq(
      (0L, "a b"), (1L, "a c"), (2L, "a b"), (3L, "d"))
      .toDF("doc_id", "text"))
    val got = run("q314_heaps_fit", dir).collect()(0)
    assert(got.getLong(0) == 4L, got.toString)
    def g(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val xs = Seq(2L, 4L, 6L, 7L).map(v => g(v.toDouble))
    val ys = Seq(2L, 3L, 3L, 4L).map(v => g(v.toDouble))
    val k = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = xs.map(a => BigInt(a) * a).sum
    val beta = (BigDecimal(BigInt(k) * sxy - BigInt(sx) * sy) /
      BigDecimal(BigInt(k) * sxx - BigInt(sx) * sx)).toDouble
    val betaN4 = math.floor(beta * 10000 + 0.5) / 10000
    assert(got.getDouble(1) == betaN4, s"${got.getDouble(1)} vs $betaN4")
  }

  test("q315 span coverage: shared trigram covers 3 of 4 tokens in " +
    "each twin; the clean source reads zero") {
    // d0/d1 share "x y z" (positions 0..2 of 4 tokens); d2 is clean
    val dir = plant("documents" -> Seq(
      (0L, "s1", "x y z w"), (1L, "s1", "x y z q"),
      (2L, "s2", "a b c d e"))
      .toDF("doc_id", "source", "text"))
    val got = run("q315_dup_span_coverage", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("s1", 8L, 6L, 750000L),
      ("s2", 5L, 0L, 0L)), got.mkString(", "))
  }
}

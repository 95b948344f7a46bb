package graft.queries

/** Hand-computed units for q293-q296. q293/q294 check the registered
  * queries against tiny independent reimplementations (plain-Scala
  * loops over the planted rows — no Spark machinery shared with the
  * queries); q295/q296 are worked out fully by hand in the comments.
  */
class Round12nSpec extends PlantedQuerySpec {

  import spark.implicits._

  private val P = 2147483647L

  private def jlSign(i: Int, j: Int, dims: Int, seed: Long): Long = {
    val x = i.toLong * dims + j
    val h2 = ((((x % P + seed) * 48271L) % P + 1L) * 69621L) % P
    1L - 2L * (h2 % 2L)
  }

  test("q293 JL distortion: neighbor-pair ratios land in the buckets " +
    "a plain-Scala reimplementation predicts") {
    val vecs = Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f),
      Seq(0.0f, 1.0f, 0.0f, 0.0f),
      Seq(0.5f, 0.5f, 0.0f, 0.0f))
    val dir = plant("embeddings" -> vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding"))
    // independent reimplementation on the planted rows
    def grid(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    def proj(u: Seq[Long]): Seq[Long] = (0 until 8).map(j =>
      u.zipWithIndex.map { case (x, i) => x * jlSign(i, j, 8, 17L) }.sum)
    val expected = vecs.sliding(2).map { case Seq(a, b) =>
      val (ua, ub) = (grid(a), grid(b))
      val origd = ua.zip(ub).map { case (x, y) => (x - y) * (x - y) }.sum
      val (pa, pb) = (proj(ua), proj(ub))
      val projd = pa.zip(pb).map { case (x, y) => (x - y) * (x - y) }.sum
      math.min((BigInt(projd) * 1000000 / (origd * 8) / 100000).toLong, 19L)
    }.toSeq
    val got = run("q293_jl_distortion", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L to 19L).map(b =>
      (b, expected.count(_ == b).toLong)),
      s"expected buckets $expected, got ${got.mkString(", ")}")
  }

  test("q294 LLR: one frequent bigram survives the count gate; G2 " +
    "matches the four-cell hand computation") {
    // bigram census: (alpha beta) 5, (alpha gamma) 1, (delta beta) 1;
    // N = 7, r1(alpha) = 6, c1(beta) = 6 -> cells 5/1/1/0.
    val docs = Seq.fill(5)("alpha beta") ++ Seq("alpha gamma", "delta beta")
    val dir = plant("documents" -> docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
    def g(term: Double): Long = math.floor(term * 1e6 + 0.5).toLong
    val expectedG2 = 2 * (
      g(5 * math.log(5.0 * 7 / (6 * 6))) +
        g(1 * math.log(1.0 * 7 / (6 * 1))) +
        g(1 * math.log(1.0 * 7 / (1 * 6))) + 0L)
    val got = run("q294_llr_collocations", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("alpha", "beta", 5L, expectedG2)),
      got.mkString(", "))
  }

  test("q295 unpivot: the wide one-row profile melts to four " +
    "(column, sum, min, max) rows on the 1e-4 grid") {
    val dir = plant("lineitem" -> Seq(
      (1.0, 10.00, 0.05, 0.02), (2.0, 20.50, 0.00, 0.08))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val got = run("q295_unpivot_profile", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("l_discount", 500L, 0L, 500L),
      ("l_extendedprice", 305000L, 100000L, 205000L),
      ("l_quantity", 30000L, 10000L, 20000L),
      ("l_tax", 1000L, 200L, 800L)), got.mkString(", "))
  }

  test("q296 MASE: hand-computed 9-day series — weekly errors, naive " +
    "errors, and the cross-multiplied ratio") {
    // x = [10,20,30,40,50,60,70,100,90] cents on days 0..8.
    // e7: |100-10| = 90 (t=7, dow 0), |90-20| = 70 (t=8, dow 1).
    // e1: 10*6 + 30 + 10 = 100 over 8 pairs.
    // mase_ppm = (160 * 8 * 1e6) div (100 * 2) = 6400000.
    val xs = Seq(10, 20, 30, 40, 50, 60, 70, 100, 90)
    val dir = plant("lineitem" -> xs.zipWithIndex.map { case (c, i) =>
      (ts(f"1995-01-${i + 1}%02dT00:00:00Z"), c / 100.0)
    }.toDF("l_shipdate", "l_extendedprice"))
    val got = run("q296_mase_backtest", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 90L, 6400000L),
      (1L, 1L, 70L, 6400000L)), got.mkString(", "))
  }
}

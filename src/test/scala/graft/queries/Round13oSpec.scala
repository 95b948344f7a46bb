package graft.queries

/** Hand-computed / BigInt-model units for q363-q366. */
class Round13oSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q363 regression discontinuity: hand-computed local lines — the " +
    "RD effect differs in SIGN from the naive mean gap") {
    val dir = plant(
      "customer" -> Seq((1L, 5200.00), (2L, 4000.00), (3L, 6800.00),
        (4L, 4800.00)).toDF("c_custkey", "c_acctbal"),
      "orders" -> Seq(1L, 3L, 4L).flatMap(ck => Seq.fill(4)((ck, "F")))
        .toDF("o_custkey", "o_orderstatus"))
    // left (ck2 y0 @-100000, ck4 y1 @-20000): a_l = 8e9*1e6//6.4e9 =
    // 1250000 (the trend EXTRAPOLATES past 1 at the cutoff);
    // right (y 1,1): a_r = 1000000 -> effect -250000, naive +500000
    val got = run("q363_regression_discontinuity", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((2L, 2L, 1250000L, 1000000L, -250000L,
      500000L)), got.mkString(", "))
  }

  test("q364 Huber IRLS: matches a BigInt model of the two passes; the " +
    "outlier day is downweighted and the slope moves toward truth") {
    val ys = Seq(100L, 107L, 114L, 121L, 128L, 135L, 500L) // slope 7 + spike
    val dir = plant("orders" -> ys.zipWithIndex.map { case (y, d) =>
      (ts(f"1995-01-0${d + 1}T00:00:00Z"), y.toDouble) }
      .toDF("o_orderdate", "o_totalprice"))
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    val pts = ys.zipWithIndex.map { case (y, d) => (BigInt(d), BigInt(y)) }
    def fit(w: Seq[BigInt]): (BigInt, BigInt) = {
      val nw = w.sum
      val sxw = pts.zip(w).map { case ((x, _), wi) => wi * x }.sum
      val syw = pts.zip(w).map { case ((_, y), wi) => wi * y }.sum
      val sxxw = pts.zip(w).map { case ((x, _), wi) => wi * x * x }.sum
      val sxyw = pts.zip(w).map { case ((x, y), wi) => wi * x * y }.sum
      val b = sdiv((nw * sxyw - sxw * syw) * 1000, nw * sxxw - sxw * sxw)
      val a = sdiv(syw * 1000 - b * sxw, nw)
      (b, a)
    }
    val (b0, a0) = fit(Seq.fill(7)(BigInt(1)))
    val es = pts.map { case (x, y) => (y * 1000 - (a0 + b0 * x)).abs }
    val sorted = es.map(_.toLong).sorted
    val med = sorted(3).toDouble // odd count: exact middle
    val k = BigInt(math.floor(med * 1.345 + 0.5).toLong)
    val ws = es.map(e => if (e <= k) BigInt(1000000) else sdiv(k * 1000000, e))
    val (b1, a1) = fit(ws)
    val nDown = ws.count(_ < 1000000).toLong
    val got = run("q364_huber_irls", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((b0.toLong, a0.toLong, k.toLong, nDown,
      b1.toLong, a1.toLong)), got.mkString(", "))
    assert(nDown >= 1L)
    assert((b1 - 7000).abs < (b0 - 7000).abs) // robustness moved the fit
  }

  test("q365 FD repair: clean, 2/3-majority repairable, and two " +
    "ambiguous groups census correctly") {
    val rows = Seq((1L, "R"), (1L, "R"), (1L, "R"),
      (2L, "R"), (2L, "R"), (2L, "N"),
      (3L, "R"), (3L, "N"),
      (4L, "R"), (4L, "R"), (4L, "N"), (4L, "N"))
    val dir = plant("lineitem" -> rows.toDF("l_orderkey", "l_returnflag"))
    val got = run("q365_fd_repair", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("ambiguous", 2L, 0L), ("clean", 1L, 0L), ("repairable", 1L, 1L)),
      got.mkString(", "))
  }

  test("q366 dispersion test: the clumped type scores D = 2.0, the " +
    "constant type exactly zero") {
    def ev(t: String, day: Int, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, t, ts(f"2024-01-0${day}T00:00:00Z")))
    val dir = plant("events" -> (
      ev("a", 1, 2, 0) ++ ev("a", 2, 6, 10) ++
        ev("b", 1, 3, 100) ++ ev("b", 2, 3, 200))
      .toDF("event_id", "event_type", "ts"))
    // a: counts {2,6}: D = (2*40-64)*1000//8 = 2000; ratio //1 = 2000
    val got = run("q366_dispersion_test", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 2L, 8L, 2000L, 2000L), ("b", 2L, 6L, 0L, 0L)),
      got.mkString(", "))
  }
}

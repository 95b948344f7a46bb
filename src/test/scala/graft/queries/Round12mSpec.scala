package graft.queries

/** Hand-computed units for the time-series inference wave
  * (q289-q292). q289's non-trivial periods are checked against a
  * 10-line brute-force DFT reimplementation (independent of the
  * query's join/census machinery); everything else is worked out by
  * hand in the comments.
  */
class Round12mSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q289 periodogram: 7-day spike series — weekly power exact, " +
    "brute-force DFT agreement on all periods") {
    // days t=0..6 (1995-01-01..07), revenue cents
    // x = [1000000, 100, 100, 100, 100, 100, 100].
    // For P=7 the weight rows sum to zero across a full cycle, so
    // S_c = (y_0 - y_1)·wc[0] = 999900·1e6 -> s_c_u = 999900,
    // s_s_u = 0 (ws[0] = 0), power = (9.999e11)^2 div 1e18 = 999800.
    val xs = Seq(1000000L, 100L, 100L, 100L, 100L, 100L, 100L)
    val dir = plant("lineitem" -> xs.zipWithIndex.map { case (c, i) =>
      (ts(f"1995-01-${i + 1}%02dT00:00:00Z"), c / 100.0)
    }.toDF("l_shipdate", "l_extendedprice"))
    val got = run("q289_periodogram", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // independent brute force on the same grids
    val m = xs.sum / xs.length
    val ys = xs.map(_ - m)
    val expect = Seq(7, 30, 365).map { p =>
      val sc = BigInt(ys.zipWithIndex.map { case (y, t) =>
        y * math.round(math.cos(2 * math.Pi * (t % p) / p) * 1e6)
      }.sum)
      val ss = BigInt(ys.zipWithIndex.map { case (y, t) =>
        y * math.round(math.sin(2 * math.Pi * (t % p) / p) * 1e6)
      }.sum)
      (p.toLong, (sc.signum * (sc.abs / 1000000)).toLong,
        (ss.signum * (ss.abs / 1000000)).toLong,
        ((sc * sc + ss * ss) / BigInt("1000000000000000000")).toLong)
    }
    val maxPow = expect.map(_._4).max
    assert(got.toSeq == expect.map { case (p, sc, ssv, pw) =>
      (p, 7L, sc, ssv, pw, pw == maxPow)
    }, got.mkString(", "))
    assert(expect.head == ((7L, 999900L, 0L, 999800L)),
      s"hand-computed weekly row drifted: ${expect.head}")
  }

  test("q290 Mann-Kendall: hand-summed sign pairs, tie-corrected " +
    "variance, sub-critical verdict") {
    // x = [1, 2, 2, 1, 3] cents over t=0..4: S = 4; ties 2x value 1 +
    // 2x value 2 -> tie_term 36; var18 = 5*4*15 - 36 = 264;
    // z = 3/sqrt(264/18); (S-1)^2*180000 = 1620000 < 264*38416 -> none.
    val dir = plant("lineitem" -> Seq(0.01, 0.02, 0.02, 0.01, 0.03)
      .zipWithIndex.map { case (p, i) =>
        (ts(f"1995-01-${i + 1}%02dT00:00:00Z"), p)
      }.toDF("l_shipdate", "l_extendedprice"))
    val got = run("q290_mann_kendall", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val z = math.floor(3.0 / math.sqrt(264.0 / 18) * 10000 + 0.5).toLong
    assert(got.toSeq == Seq((5L, 4L, 264L, z, "none")), got.mkString(", "))
  }

  test("q291 isotonic: the [3, 1, 2] violator pools to a flat 2 " +
    "(minimax = PAVA)") {
    // monthly averages 3.00 / 1.00 / 2.00: PAVA pools (3,1) -> 2 and
    // the trailing 2 joins the level set -> fit [2, 2, 2].
    val dir = plant("orders" -> Seq(
      (ts("1995-01-05T00:00:00Z"), 3.00),
      (ts("1995-02-05T00:00:00Z"), 1.00),
      (ts("1995-03-05T00:00:00Z"), 2.00))
      .toDF("o_orderdate", "o_totalprice"))
    val got = run("q291_isotonic_trend", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (199501L, 1L, 300000000L, 200000000L),
      (199502L, 1L, 100000000L, 200000000L),
      (199503L, 1L, 200000000L, 200000000L)), got.mkString(", "))
  }

  test("q292 CCF: exact y = 100x at lag +1; single-point overlaps " +
    "yield NULL r (degenerate variance); absent overlaps yield no row") {
    // orders on days 0,1,2 (counts 1,2,3 via repeated rows), lineitem
    // revenue on days 1,2,3 = 100,200,300 cents. Overlap n>=2 lags
    // {0,1,2} are all exactly linear -> r_ppm 1000000, tied peaks;
    // lags -1 and +3 overlap ONE day -> zero variance -> NULL.
    val orderRows = Seq((0, 1), (1, 2), (2, 3)).flatMap { case (d, k) =>
      Seq.fill(k)(ts(f"1995-01-${d + 1}%02dT00:00:00Z"))
    }
    val dir = plant(
      "orders" -> orderRows.toDF("o_orderdate"),
      "lineitem" -> Seq((2, 1.00), (3, 2.00), (4, 3.00)).map {
        case (dom, p) => (ts(f"1995-01-0${dom}T00:00:00Z"), p)
      }.toDF("l_shipdate", "l_extendedprice"))
    val got = run("q292_ccf_leadlag", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
    assert(got.toSeq == Seq(
      (-1L, 1L, None, None),
      (0L, 2L, Some(1000000L), Some(true)),
      (1L, 3L, Some(1000000L), Some(true)),
      (2L, 2L, Some(1000000L), Some(true)),
      (3L, 1L, None, None)), got.mkString(", "))
  }
}

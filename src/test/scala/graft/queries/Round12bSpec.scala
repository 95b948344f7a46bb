package graft.queries

import graft.ops.MultimodalKernels

/** Hand-computed units for the round-12 third/fourth waves
  * (q245-q250), plus spec-literal pins for the BMP kernels.
  */
class Round12bSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("bmpDims: parses a hand-written spec-literal 2x2 top-down header") {
    // Written byte-by-byte from the public BMP layout, NOT via
    // bmpHeader — pins the parser to the real format. 2x2 at 24bpp:
    // stride = (2*3+3)/4*4 = 8, file size = 54 + 8*2 = 70; height
    // -2 (top-down) little-endian = FE FF FF FF.
    val spec = new Array[Byte](54)
    spec(0) = 'B'; spec(1) = 'M'
    spec(2) = 70 // file size LE (fits one byte)
    spec(10) = 54 // pixel offset
    spec(14) = 40 // info header size
    spec(18) = 2 // width
    spec(22) = 0xFE.toByte; spec(23) = 0xFF.toByte
    spec(24) = 0xFF.toByte; spec(25) = 0xFF.toByte // height = -2
    spec(26) = 1 // planes
    spec(28) = 24 // bpp
    spec(34) = 16 // image size 8*2
    val got = MultimodalKernels.bmpDims(spec)
    assert(got != null && got.toLongArray().toSeq ==
      Seq(2L, 2L, 24L, 1L, 70L), String.valueOf(got))
  }

  test("bmpHeader/bmpDims roundtrip; corruption, truncation, and an " +
    "inconsistent file size return null") {
    val ok = MultimodalKernels.bmpDims(
      MultimodalKernels.bmpHeader(7, 5, topDown = false, valid = true))
    // stride (7*3+3)/4*4 = 24; file size 54 + 24*5 = 174
    assert(ok != null && ok.toLongArray().toSeq ==
      Seq(7L, 5L, 24L, 0L, 174L), String.valueOf(ok))
    val td = MultimodalKernels.bmpDims(
      MultimodalKernels.bmpHeader(7, 5, topDown = true, valid = true))
    assert(td != null && td.toLongArray().toSeq ==
      Seq(7L, 5L, 24L, 1L, 174L), String.valueOf(td))
    assert(MultimodalKernels.bmpDims(
      MultimodalKernels.bmpHeader(7, 5, topDown = false,
        valid = false)) == null)
    assert(MultimodalKernels.bmpDims(Array[Byte](1, 2, 3)) == null)
    val badSize = MultimodalKernels.bmpHeader(7, 5, topDown = false,
      valid = true)
    badSize(2) = (badSize(2) + 1).toByte // file size off by one
    assert(MultimodalKernels.bmpDims(badSize) == null)
  }

  test("q245: independent 2x2 table has zero chi-square; V = 0") {
    // o(a,b) proportional to r*c in every cell -> contrib 0 exactly
    val orders = (Seq.fill(4)(("P1", "O")) ++ Seq.fill(4)(("P1", "F")) ++
      Seq.fill(1)(("P2", "O")) ++ Seq.fill(1)(("P2", "F")))
      .toDF("o_orderpriority", "o_orderstatus")
    val got = run("q245_cramers_v", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.length == 4)
    assert(got.forall { case (_, _, _, cu, chi, v) =>
      cu == 0L && chi == 0L && v == 0.0 }, got.mkString(", "))
  }

  test("q245: a missing cell appears on the spine with its rc/n mass") {
    // cells: (P1,O)=2, (P2,F)=2 — spine adds (P1,F) and (P2,O) with
    // n_obs 0 and contrib (0*4 - 2*2)^2 / (2*2*4) = 1 -> 1e6
    val orders = (Seq.fill(2)(("P1", "O")) ++ Seq.fill(2)(("P2", "F")))
      .toDF("o_orderpriority", "o_orderstatus")
    val got = run("q245_cramers_v", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val expected = Seq(
      ("P1", "F", 0L, 1000000L), ("P1", "O", 2L, 1000000L),
      ("P2", "F", 2L, 1000000L), ("P2", "O", 0L, 1000000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q246: a perfectly separating feature gets the extreme WOEs " +
    "with the count floor") {
    // 8 values: quartile edges at ranks 2,4,6 of [10,20,30,40,
    // 50,60,70,80]; 'R' rows are exactly the top quartile
    val li = Seq(
      (10.0, "N"), (20.0, "N"), (30.0, "N"), (40.0, "N"),
      (50.0, "N"), (60.0, "N"), (70.0, "R"), (80.0, "R"))
      .toDF("l_extendedprice", "l_returnflag")
    val got = run("q246_woe_iv", plant("lineitem" -> li))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // edges are the LOWER order statistics at 0-indexed ranks 2/4/6
    // -> e = 30/50/70, so bins are {10,20,30} {40,50} {60,70} {80}:
    // (ng,nb) = (3,0) (2,0) (1,1) (0,1); G=6, B=2. Hand WOEs (count
    // floor max(·,1) in the zero cells):
    //   b1 ln(3·2/(1·6)) = 0;            term (6-0)/12·0      = 0
    //   b2 ln(2·2/(1·6)) -> -405465;     term (4-0)/12·woe    = -135155
    //   b3 ln(1·2/(1·6)) -> -1098612;    term (2-6)/12·woe    = 366204
    //   b4 ln(1·2/(1·6)) -> -1098612;    term (0-6)/12·woe    = 549306
    val expected = Seq(
      (1L, 3L, 0L, 0L, 0L, 780355L),
      (2L, 2L, 0L, -405465L, -135155L, 780355L),
      (3L, 1L, 1L, -1098612L, 366204L, 780355L),
      (4L, 0L, 1L, -1098612L, 549306L, 780355L))
    assert(got.toSeq == expected, s"${got.mkString(", ")} vs $expected")
  }

  test("q247: identical distributions give zero JSD; disjoint mass " +
    "gives ln(2) per side") {
    // same dow mass in both years -> every ratio is 2aB/(aB+bA) = 1
    val same = (1 to 14).map { i =>
      val yr = if (i <= 7) 1996 else 1997
      (ts(f"$yr%d-01-0${(i - 1) % 7 + 1}%dT00:00:00Z"), 100.0)
    }.toDF("o_orderdate", "o_totalprice")
    val g1 = run("q247_js_divergence", plant("orders" -> same))
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(g1.forall { case (tp, tq, j) => tp == 0L && tq == 0L && j == 0L },
      g1.mkString(", "))
    // 1996 mass all on one dow, 1997 all on another -> each side's
    // single term is 1.0*ln(2) -> jsd_nano = ln(2)*1e9
    val disj = Seq((ts("1996-01-01T00:00:00Z"), 100.0),
      (ts("1997-06-15T00:00:00Z"), 100.0))
      .toDF("o_orderdate", "o_totalprice")
    val g2 = run("q247_js_divergence", plant("orders" -> disj))
      .collect().map(r => r.getLong(5)).distinct
    val ln2 = math.floor(math.log(2.0) * 1e9 + 0.5).toLong
    assert(g2.toSeq == Seq(ln2), s"${g2.toSeq} vs $ln2")
  }

  test("q248: perfect ranker AP = 1, inverted ranker by hand") {
    // positives are the 2 highest-priced orders -> prec@1 = prec@2 = 1
    val li = Seq((1L, "R"), (2L, "R"))
      .toDF("l_orderkey", "l_returnflag")
    val orders = Seq((1L, 400.0), (2L, 300.0), (3L, 200.0), (4L, 100.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = run("q248_pr_auc", plant("lineitem" -> li,
        "orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((4L, 2L, 1000000L, 500000L)), got.mkString(", "))
    // positives are the 2 LOWEST-priced -> ranks 3,4 among all;
    // terms 1e6*1 div 3 = 333333, 1e6*2 div 4 = 500000; AP = 416666
    val liInv = Seq((3L, "R"), (4L, "R"))
      .toDF("l_orderkey", "l_returnflag")
    val g2 = run("q248_pr_auc", plant("lineitem" -> liInv,
        "orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(g2.toSeq == Seq((4L, 2L, 416666L, 500000L)), g2.mkString(", "))
  }

  test("q249: roundtrip dims incl. stride-padded file size, corrupt " +
    "and top-down rows, on planted docs") {
    // doc_id 3: w = 11%800+1 = 12, h = 3%600+1 = 4, top-down;
    // stride = (12*3+3)/4*4 = 36 -> wait: 39/4*4 = 36; fs = 54+36*4
    val docs = Seq((3L, 11L), (7L, 5L), (14L, 9L)) // 7 -> corrupt? 7%7=0
      .toDF("doc_id", "n_chars")
    val got = run("q249_bmp_metadata", plant("documents" -> docs))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getLong(6)))
    val expected = Seq(
      (3L, 12L, 4L, 1L, 54L + 36L * 4, 54L),   // top-down (3%3=0)
      (7L, -1L, -1L, -1L, -1L, 54L),           // corrupted magic
      (14L, -1L, -1L, -1L, -1L, 54L))          // 14%7=0 corrupt too
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q251: a planted spike on a clean linear trend flags exactly " +
    "the spike and its dow-mates, with the exact Theil-Sen slope") {
    // r = 100 + 2d over 28 days, except d=13 spikes to 10000. The
    // pairwise-median slope stays exactly 2 (spike pairs are a
    // minority), so detrended2 = 2e8 for every clean day. The spike's
    // dow (6) gets mean 5137000000 -> its three clean mates land at
    // (2e8 - 5.137e9) div 2e6 = -2468, the spike at +7405; every
    // other residual is 0, so med = mad = 0 and exactly those 4 flag.
    val orders = (0 to 27).map { d =>
      val r = if (d == 13) 10000.0 else 100.0 + 2 * d
      (ts(f"1970-01-${d + 1}%02dT00:00:00Z"), r)
    }.toDF("o_orderdate", "o_totalprice")
    val got = run("q251_robust_anomaly", plant("orders" -> orders))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val expected = Seq(
      ("1970-01-07", 112L, -2468L, 28L, 4L, 2.0),
      ("1970-01-14", 10000L, 7405L, 28L, 4L, 2.0),
      ("1970-01-21", 140L, -2468L, 28L, 4L, 2.0),
      ("1970-01-28", 154L, -2468L, 28L, 4L, 2.0))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q252: a well-separated key domain ranks identically through " +
    "the sketch — full recall, nonnegative overestimate") {
    // keys 1..20 appear 100+k times, keys 21..30 once: only a key
    // colliding in ALL 4 sketch rows could get promoted, and then
    // only by the single-count tail mass
    val li = (1L to 20L).flatMap(k => Seq.fill(100 + k.toInt)(k))
      .++(21L to 30L).toDF("l_partkey")
    val got = run("q252_cms_rank_fidelity", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val (k, hits, recall, over) = got.head
    assert(k == 20L && hits == 20L && recall == 1000000L,
      got.mkString(", "))
    assert(over >= 0L)
  }

  test("q253: correlated above-own-average picks exactly the orders " +
    "beating their customer's mean, EXISTS-gated on lineitem") {
    // cust 1: prices 10, 20, 60 (mean 30) -> only the 60 is above;
    // cust 2: prices 50, 50 -> x*n = sum for both, never strictly >
    // order 99 (price 1000, cust 3) has NO lineitem -> EXISTS drops it
    val orders = Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 60.0),
      (4L, 2L, 50.0), (5L, 2L, 50.0), (99L, 3L, 1000.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val li = Seq(1L, 2L, 3L, 4L, 5L).toDF("l_orderkey")
    val got = run("q253_correlated_subquery", plant("orders" -> orders,
        "lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)), got.mkString(", "))
  }

  test("q254: NOT IN over a set with a planted NULL matches nothing; " +
    "the NULL-filtered branch equals NOT EXISTS") {
    // custkeys 50 and 100 plant NULLs into probe (k%50=0, k%2=0)
    val cust = (1L to 100L).toDF("c_custkey")
    val orders = Seq((1L, 3L), (2L, 4L), (3L, 101L), (4L, 50L))
      .toDF("o_orderkey", "o_custkey")
    val got = run("q254_null_aware_anti", plant("customer" -> cust,
        "orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // probe = even custkeys 2..100 minus the NULLed 50/100. Orders
    // with custkey 3 (odd, not in probe), 101 (absent), 50 (NULLed
    // out of probe) survive the null-filtered NOT IN; custkey 4 is in
    // probe. With the NULL present, NOT IN matches nothing at all.
    assert(got.toSeq == Seq((0L, 3L, 3L)), got.mkString(", "))
  }

  test("q250: hand-planted reversal flips every stratum against the " +
    "pooled direction (the paradox flag fires)") {
    // Stratum 1995: A = [10, 10], B = [9] -> A ahead (dir +1)
    // Stratum 1996: A = [100], B = [99, 99] -> A ahead (dir +1)
    // Pooled: A mean (10+10+100)/3 = 40; B mean (9+99+99)/3 = 69
    // -> pooled B ahead (dir -1) while every stratum says A: paradox
    def o(yr: Int, pri: String, p: Double) =
      (ts(s"$yr-03-01T00:00:00Z"), pri, p)
    val orders = Seq(
      o(1995, "1-URGENT", 10.0), o(1995, "1-URGENT", 10.0),
      o(1995, "5-LOW", 9.0),
      o(1996, "1-URGENT", 100.0),
      o(1996, "5-LOW", 99.0), o(1996, "5-LOW", 99.0))
      .toDF("o_orderdate", "o_orderpriority", "o_totalprice")
    val got = run("q250_simpson_check", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))
    val expected = Seq(
      (1995L, 2L, 10.0, 1L, 9.0, 1L, -1L, true),
      (1996L, 1L, 100.0, 2L, 99.0, 1L, -1L, true))
    assert(got.toSeq == expected, got.mkString(", "))
  }
}

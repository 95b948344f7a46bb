package graft.queries

/** Hand-computed units for q343-q346. */
class Round13jSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q343 dict advisor: hand-computed plain vs dict layouts; the " +
    "constant column saves the most") {
    val dir = plant("orders" -> Seq(
      ("AA", "X"), ("AA", "X"), ("AA", "X"), ("B", "X"), ("B", "X"))
      .toDF("o_orderpriority", "o_orderstatus"))
    // pr: n5 d2 plain 3·2+2·1+20 = 28, dict 3+8+5 = 16 -> 428571 ppm
    // st: n5 d1 plain 5+20 = 25, dict 1+4+5 = 10 -> 600000 ppm
    val got = run("q343_dict_advisor", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("o_orderpriority", 5L, 2L, 28L, 16L, 428571L),
      ("o_orderstatus", 5L, 1L, 25L, 10L, 600000L)), got.mkString(", "))
  }

  test("q344 Qini uplift: hand-placed conversions — treated-early lifts " +
    "decile 1, the control conversion cancels it at decile 2") {
    val convCks = Set(1L, 2L, 19L)
    val dir = plant(
      "customer" -> (0L to 19L).map(ck => (ck, 2000.0 - ck))
        .toDF("c_custkey", "c_acctbal"),
      "orders" -> convCks.toSeq.flatMap(ck =>
        Seq.fill(4)((ck, "F"))).toDF("o_custkey", "o_orderstatus"))
    val got = run("q344_qini_uplift", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val expected = (1L to 10L).map {
      case 1L => (1L, 1L, 1L, 1000000L, 0L, 1L)
      case 2L => (2L, 1L, 1L, 0L, 1000000L, 0L)
      case 10L => (10L, 1L, 1L, 1000000L, 0L, 1L)
      case d => (d, 1L, 1L, 0L, 0L, 0L)
    }
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q345 price/volume bridge: clean split on the growth flag, " +
    "truncation residual of -1 on the shrinking flag") {
    def li(flag: String, qty: Double, price: Double, y: Int) =
      (flag, qty, price, ts(s"$y-06-01T00:00:00Z"))
    val dir = plant("lineitem" -> Seq(
      li("A", 10, 100.00, 1996), li("A", 12, 132.00, 1997),
      li("B", 3, 10.00, 1996), li("B", 2, 5.00, 1997))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"))
    // A: p0 1e6, p1 1.1e6 -> vol 2000, price 1200, resid 0
    // B: p0 333333, p1 250000 -> vol -333, price -166, resid -1
    val got = run("q345_price_volume_mix", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("A", 10000L, 13200L, 3200L, 2000L, 1200L, 0L),
      ("B", 1000L, 500L, -500L, -333L, -166L, -1L)), got.mkString(", "))
  }

  test("q346 HDR percentiles: hand-placed log2 buckets; p50 lands mid-" +
    "census, p95/p99 in the top bucket") {
    def ev(t: String, v: Double, i: Long) =
      (i, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev("a", 0.01, 0), ev("a", 0.03, 1), ev("a", 0.08, 2),
      ev("a", 1.00, 3), ev("a", 1.30, 4),
      ev("b", 0.01, 5))
      .toDF("event_id", "event_type", "value", "ts"))
    // a: cents {1,3,8,100,130} -> buckets {0,1,3,6,7}; p50 rank 2.5 ->
    // bucket 3 (hi 15); p95/p99 -> bucket 7 (hi 255)
    val got = run("q346_hdr_percentiles", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("a", 5L, 15L, 255L, 255L, 7L),
      ("b", 1L, 1L, 1L, 1L, 0L)), got.mkString(", "))
  }
}

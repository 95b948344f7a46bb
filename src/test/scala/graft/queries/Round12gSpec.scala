package graft.queries

/** Hand-computed units for the round-12 TPC-H completeness wave
  * (q255-q262): each test plants a tiny parquet fixture whose
  * expected output was worked out by hand on the integer money grids,
  * and drives the REAL registered query over it — filter boundaries
  * (date cuts, discount band edges, quantity strictness) included.
  */
class Round12gSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def li(rows: (String, String, Double, Double, Double, Double,
      String)*) =
    rows.toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")

  test("q255 Q1: hand-computed grid sums, integer-div averages, date cut") {
    // A/F: (10, $10, 5%, 2%) + (20, $20, 0%, 8%); N/O: (5, $5.50, 10%, 0%)
    // + one 2001-06-06 row past the 2000-12-31 cut that must vanish.
    val dir = plant("lineitem" -> li(
      ("A", "F", 10d, 10.00, 0.05, 0.02, "1996-05-05"),
      ("A", "F", 20d, 20.00, 0.00, 0.08, "1997-01-01"),
      ("N", "O", 5d, 5.50, 0.10, 0.00, "1998-03-03"),
      ("A", "F", 99d, 99.00, 0.01, 0.01, "2001-06-06")))
    val got = run("q255_tpch_q1", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    // A/F: sum_disc = 1000*95 + 2000*100 = 295000;
    //      sum_charge = 1000*95*102 + 2000*100*108 = 31290000
    // N/O: disc 550*90 = 49500; charge 49500*100 = 4950000
    assert(got.toSeq == Seq(
      ("A", "F", 30L, 3000L, 295000L, 31290000L,
        150000L, 150000L, 250L, 2L),
      ("N", "O", 5L, 550L, 49500L, 4950000L,
        50000L, 55000L, 1000L, 1L)), got.mkString(", "))
  }

  test("q256 Q6: discount band and quantity strict-< boundaries") {
    // kept: ($10, 6%, q10) + ($20, 5%, q23) = 6000 + 10000
    // dropped: q24 (not <24), 4% (below band), 1997-01-01 (past end)
    val dir = plant("lineitem" -> li(
      ("A", "F", 10d, 10.00, 0.06, 0.00, "1996-06-01"),
      ("A", "F", 23d, 20.00, 0.05, 0.00, "1996-01-01"),
      ("A", "F", 24d, 30.00, 0.07, 0.00, "1996-06-01"),
      ("A", "F", 5d, 40.00, 0.04, 0.00, "1996-06-01"),
      ("A", "F", 5d, 50.00, 0.06, 0.00, "1997-01-01")))
    val got = run("q256_tpch_q6", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((16000L, 2L)), got.mkString(", "))
  }

  private def liJoin(rows: (Long, Long, Long, Double, Double, Double,
      Double, String)*) =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")

  test("q257 Q7: both pair directions kept, same-nation and " +
    "out-of-range rows dropped") {
    val dir = plant(
      "nation" -> Seq((1L, "NATION_13"), (2L, "NATION_19"), (3L, "NATION_3"))
        .toDF("n_nationkey", "n_name"),
      "supplier" -> Seq((1L, 1L), (2L, 2L), (3L, 3L))
        .toDF("s_suppkey", "s_nationkey"),
      "customer" -> Seq((1L, 2L), (2L, 1L), (3L, 3L))
        .toDF("c_custkey", "c_nationkey"),
      "orders" -> Seq((1L, 1L), (2L, 2L), (3L, 3L))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> liJoin(
        (1L, 1L, 1L, 1d, 10.00, 0.00, 0.00, "1996-06-01"), // N1->N2 1996
        (2L, 1L, 2L, 1d, 20.00, 0.10, 0.00, "1997-06-01"), // N2->N1 1997
        (1L, 1L, 2L, 1d, 30.00, 0.00, 0.00, "1996-06-01"), // N2->N2 drop
        (3L, 1L, 1L, 1d, 40.00, 0.00, 0.00, "1996-06-01"), // cust N3 drop
        (1L, 1L, 1L, 1d, 50.00, 0.00, 0.00, "1995-06-01"))) // date drop
    val got = run("q257_tpch_q7", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("NATION_13", "NATION_19", 1996L, 100000L),
      ("NATION_19", "NATION_13", 1997L, 180000L)), got.mkString(", "))
  }

  test("q258 Q8: per-year ppm share; non-ASIA customer and non-type " +
    "part drop") {
    val dir = plant(
      "region" -> Seq((2L, "ASIA"), (0L, "AFRICA"))
        .toDF("r_regionkey", "r_name"),
      "nation" -> Seq((2L, "NATION_2", 2L), (7L, "NATION_7", 2L),
        (1L, "NATION_1", 0L)).toDF("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq((1L, 2L), (2L, 1L))
        .toDF("c_custkey", "c_nationkey"),
      "supplier" -> Seq((1L, 2L), (2L, 7L))
        .toDF("s_suppkey", "s_nationkey"),
      "part" -> Seq((1L, "ECONOMY"), (2L, "PROMO"))
        .toDF("p_partkey", "p_type"),
      "orders" -> Seq((1L, 1L, "1996-06-01"), (2L, 1L, "1997-06-01"),
        (3L, 2L, "1996-06-01")).toDF("o_orderkey", "o_custkey",
        "o_orderdate"),
      "lineitem" -> liJoin(
        (1L, 1L, 1L, 1d, 10.00, 0.00, 0.00, "1996-06-02"), // 96 nation
        (1L, 1L, 2L, 1d, 20.00, 0.00, 0.00, "1996-06-02"), // 96 other
        (2L, 1L, 1L, 1d, 10.00, 0.00, 0.00, "1997-06-02"), // 97 nation
        (1L, 2L, 1L, 1d, 40.00, 0.00, 0.00, "1996-06-02"), // PROMO drop
        (3L, 1L, 1L, 1d, 50.00, 0.00, 0.00, "1996-06-02"))) // AFRICA drop
    val got = run("q258_tpch_q8", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1996L, 100000L, 300000L, 333333L),
      (1997L, 100000L, 100000L, 1000000L)), got.mkString(", "))
  }

  test("q259 Q13: zero-order customers land in the c_count=0 bucket") {
    val dir = plant(
      "customer" -> Seq(1L, 2L, 3L, 4L).toDF("c_custkey"),
      "orders" -> Seq((10L, 1L), (11L, 1L), (12L, 2L))
        .toDF("o_orderkey", "o_custkey"))
    val got = run("q259_tpch_q13", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 2L), (2L, 1L), (1L, 1L)),
      got.mkString(", "))
  }

  test("q260 Q14: promo ppm over the month window only") {
    val dir = plant(
      "part" -> Seq((1L, "PROMO"), (2L, "ECONOMY"))
        .toDF("p_partkey", "p_type"),
      "lineitem" -> liJoin(
        (1L, 1L, 1L, 1d, 10.00, 0.00, 0.00, "1996-03-05"), // promo 100000
        (1L, 2L, 1L, 1d, 30.00, 0.00, 0.00, "1996-03-31"), // other 300000
        (1L, 1L, 1L, 1d, 99.00, 0.00, 0.00, "1996-04-01"))) // window drop
    val got = run("q260_tpch_q14", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((100000L, 400000L, 250000L)),
      got.mkString(", "))
  }

  test("q261 Q15: revenue ties at the max ALL surface, ordered by key") {
    val dir = plant(
      "supplier" -> Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
        .toDF("s_suppkey", "s_name"),
      "lineitem" -> liJoin(
        (1L, 1L, 1L, 1d, 10.00, 0.00, 0.00, "1996-02-01"), // s1: 100000
        (1L, 1L, 2L, 1d, 5.00, 0.00, 0.00, "1996-02-01"), // s2: 50000+
        (1L, 1L, 2L, 1d, 5.00, 0.00, 0.00, "1996-03-01"), // s2: 50000
        (1L, 1L, 3L, 1d, 1.00, 0.00, 0.00, "1996-02-01"), // s3: 10000
        (1L, 1L, 3L, 1d, 99.0, 0.00, 0.00, "1996-04-01"))) // quarter drop
    val got = run("q261_tpch_q15", dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "S1", 100000L), (2L, "S2", 100000L)),
      got.mkString(", "))
  }

  test("q262 Q17: strict 20%-of-average cut via 5*qty*n < sum cross-mult") {
    // Brand#11 part 1: qtys (1, 10, 10) -> sum 21, n 3; keep qty*15 < 21
    // -> only qty=1 ($7.77). Part 2 qty=1 would pass but is off-brand.
    val dir = plant(
      "part" -> Seq((1L, "Brand#11"), (2L, "Brand#9"))
        .toDF("p_partkey", "p_brand"),
      "lineitem" -> liJoin(
        (1L, 1L, 1L, 1d, 7.77, 0.00, 0.00, "1996-02-01"),
        (1L, 1L, 1L, 10d, 10.00, 0.00, 0.00, "1996-02-01"),
        (1L, 1L, 1L, 10d, 10.00, 0.00, 0.00, "1996-02-01"),
        (1L, 2L, 1L, 1d, 5.00, 0.00, 0.00, "1996-02-01")))
    val got = run("q262_tpch_q17", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((777L, 1L, 111L)), got.mkString(", "))
  }
}

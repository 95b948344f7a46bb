package graft.queries

import org.apache.spark.sql.DataFrame

/** Hand-computed units for the TPC-H completion wave (q279-q288):
  * each test plants a tiny parquet fixture whose expected output was
  * worked out by hand on the integer money grids — filter boundaries
  * (exact +N-day lateness, strict >, tie-min, window edges) included
  * — and drives the REAL registered query over it.
  */
class Round12lSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def regions(rows: (Int, String)*): DataFrame =
    rows.toDF("r_regionkey", "r_name")

  private def nations(rows: (Int, String, Int)*): DataFrame =
    rows.toDF("n_nationkey", "n_name", "n_regionkey")

  private def suppliers(rows: (Long, String, Double, Int)*): DataFrame =
    rows.toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")

  test("q279 Q2: tie-min suppliers both surface, off-region and " +
    "off-noun rows pruned, acctbal-desc order") {
    // ps(1,1) cost = min(1000 div 2, 400 div 1) = 400; ps(1,2) = 400
    // (tie -> both); ps(1,3) = 100 but s3 is African; part 2 is a gear.
    val dir = plant(
      "region" -> regions((3, "EUROPE"), (0, "AFRICA")),
      "nation" -> nations((1, "NATION_1", 3), (2, "NATION_2", 0)),
      "supplier" -> suppliers((1L, "S1", 10.00, 1), (2L, "S2", 20.00, 1),
        (3L, "S3", 30.00, 2)),
      "part" -> Seq((1L, "red bolt"), (2L, "red gear"))
        .toDF("p_partkey", "p_name"),
      "lineitem" -> Seq(
        (1L, 1L, 2.0, 10.00), (1L, 1L, 1.0, 4.00), (1L, 2L, 1.0, 4.00),
        (1L, 3L, 1.0, 1.00), (2L, 1L, 1.0, 7.00))
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))
    val got = run("q279_tpch_q2", dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (2000L, "S2", "NATION_1", 1L, 400L),
      (1000L, "S1", "NATION_1", 1L, 400L)), got.mkString(", "))
  }

  test("q280 Q4: +30-day strict boundary, semi-join counts an order " +
    "once, quarter window prunes") {
    // o1 late (03-15 > 03-02); o2 has an on-time line AND an
    // exactly-+30 line (not >); o3 late but ordered before the
    // quarter; o4 late; o5 has TWO late lines -> still one order.
    val dir = plant(
      "orders" -> Seq(
        (1L, ts("1996-02-01T00:00:00Z"), "1-URGENT"),
        (2L, ts("1996-02-01T00:00:00Z"), "2-HIGH"),
        (3L, ts("1995-12-31T00:00:00Z"), "1-URGENT"),
        (4L, ts("1996-03-31T00:00:00Z"), "3-MEDIUM"),
        (5L, ts("1996-01-15T00:00:00Z"), "1-URGENT"))
        .toDF("o_orderkey", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq(
        (1L, ts("1996-03-15T00:00:00Z")),
        (2L, ts("1996-03-01T00:00:00Z")),
        (2L, ts("1996-03-02T00:00:00Z")),
        (3L, ts("1996-06-01T00:00:00Z")),
        (4L, ts("1996-06-01T00:00:00Z")),
        (5L, ts("1996-03-01T00:00:00Z")),
        (5L, ts("1996-04-01T00:00:00Z")))
        .toDF("l_orderkey", "l_shipdate"))
    val got = run("q280_tpch_q4", dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("1-URGENT", 2L), ("3-MEDIUM", 1L)),
      got.mkString(", "))
  }

  test("q281 Q9: derived min unit cost spans the part's rows, profit " +
    "on the grid, nation asc / year desc") {
    // ps(1,1) cost = min(1000 div 2, 300 div 1) = 300.
    // 1996: 1000*95 - 300*2*100 = 35000; 1997: 300*100 - 300*100 = 0.
    val dir = plant(
      "part" -> Seq((1L, "red rod"), (2L, "blue rod"))
        .toDF("p_partkey", "p_name"),
      "supplier" -> suppliers((1L, "S1", 0.0, 5)),
      "nation" -> nations((5, "NATION_5", 0)),
      "orders" -> Seq((1L, ts("1996-05-05T00:00:00Z")),
        (2L, ts("1997-06-06T00:00:00Z")))
        .toDF("o_orderkey", "o_orderdate"),
      "lineitem" -> Seq(
        (1L, 1L, 1L, 2.0, 10.00, 0.05),
        (2L, 1L, 1L, 1.0, 3.00, 0.00),
        (1L, 2L, 1L, 1.0, 5.00, 0.00))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount"))
    val got = run("q281_tpch_q9", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("NATION_5", 1997L, 0L), ("NATION_5", 1996L, 35000L)),
      got.mkString(", "))
  }

  test("q282 Q11: self-normalizing threshold keeps only the dominant " +
    "part; off-region supplier stock excluded") {
    // values: p1 = 5000*10 = 50000, p2 = 100, p3 = 2000*2 = 4000
    // (p4 is African-held). total 54100, n_parts 3 ->
    // keep v*3 > 108200: only p1.
    val dir = plant(
      "region" -> regions((3, "EUROPE"), (0, "AFRICA")),
      "nation" -> nations((1, "NATION_1", 3), (2, "NATION_2", 0)),
      "supplier" -> suppliers((1L, "S1", 0.0, 1), (2L, "S2", 0.0, 1),
        (3L, "S3", 0.0, 2)),
      "lineitem" -> Seq(
        (1L, 1L, 10.0, 500.00), (2L, 1L, 1.0, 1.00),
        (3L, 2L, 2.0, 40.00), (4L, 3L, 1.0, 99.00))
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))
    val got = run("q282_tpch_q11", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 50000L)), got.mkString(", "))
  }

  test("q283 Q12: +60-day strict boundary, 1996 ship window, " +
    "urgent/other case split on the return-flag class") {
    val dir = plant(
      "orders" -> Seq(
        (1L, ts("1996-01-10T00:00:00Z"), "1-URGENT"),
        (2L, ts("1996-01-10T00:00:00Z"), "5-LOW"))
        .toDF("o_orderkey", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq(
        (1L, "A", ts("1996-04-01T00:00:00Z")), // late, urgent
        (2L, "A", ts("1996-04-01T00:00:00Z")), // late, low
        (1L, "R", ts("1996-02-01T00:00:00Z")), // on time
        (1L, "R", ts("1997-02-01T00:00:00Z")), // outside ship year
        (1L, "N", ts("1996-03-10T00:00:00Z"))) // exactly +60: not late
        .toDF("l_orderkey", "l_returnflag", "l_shipdate"))
    val got = run("q283_tpch_q12", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", 1L, 1L)), got.mkString(", "))
  }

  test("q284 Q16: brand/type/size filters, complaint suppliers " +
    "(suppkey % 10 = 3) anti-joined out of the distinct count") {
    val dir = plant(
      "part" -> Seq(
        (1L, "Brand#1", "LARGE", 9), (2L, "Brand#3", "LARGE", 9),
        (3L, "Brand#2", "PROMO", 9), (4L, "Brand#2", "SMALL", 10))
        .toDF("p_partkey", "p_brand", "p_type", "p_size"),
      "supplier" -> Seq(1L, 2L, 3L, 13L).toDF("s_suppkey"),
      "lineitem" -> Seq(
        (1L, 1L), (1L, 2L), (1L, 3L), (1L, 13L),
        (4L, 1L), (2L, 1L), (3L, 2L))
        .map { case (pk, sk) => (pk, sk, 1.0, 1.00) }
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"))
    val got = run("q284_tpch_q16", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(("Brand#1", "LARGE", 9, 2L)),
      got.mkString(", "))
  }

  test("q285 Q19: each disjunction branch gates on ITS quantity and " +
    "size windows") {
    // kept: (Brand#12 size 10, qty 5) 1000*100 + (Brand#23 size 20,
    // qty 15, 10% off) 2000*90 = 280000. Dropped: qty 12 on the
    // Brand#12 branch, qty 9 on the Brand#23 branch, size 40, and a
    // Brand#12 part at size 20.
    val dir = plant(
      "part" -> Seq(
        (1L, "Brand#12", 10), (2L, "Brand#23", 20),
        (3L, "Brand#34", 40), (4L, "Brand#12", 20))
        .toDF("p_partkey", "p_brand", "p_size"),
      "lineitem" -> Seq(
        (1L, 5.0, 10.00, 0.00), (1L, 12.0, 10.00, 0.00),
        (2L, 15.0, 20.00, 0.10), (2L, 9.0, 20.00, 0.00),
        (3L, 25.0, 30.00, 0.00), (4L, 5.0, 30.00, 0.00))
        .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount"))
    val got = run("q285_tpch_q19", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((280000L, 2L)), got.mkString(", "))
  }

  test("q286 Q20: availqty > 8x the 1996-shipped quantity, " +
    "never-shipped-in-1996 pairs excluded, region prunes") {
    // s1: avail 11 > 8*1 keep; s2: avail 5 > 8*2 drop; s3 qualifies
    // but is African; s4 has NO 1996 shipment (n96=0) -> drop even
    // though 50 > 8*0.
    val dir = plant(
      "region" -> regions((2, "ASIA"), (0, "AFRICA")),
      "nation" -> nations((7, "NATION_7", 2), (2, "NATION_2", 0)),
      "supplier" -> suppliers((1L, "S1", 0.0, 7), (2L, "S2", 0.0, 7),
        (3L, "S3", 0.0, 2), (4L, "S4", 0.0, 7)),
      "part" -> Seq((1L, "blue rod"), (2L, "red rod"))
        .toDF("p_partkey", "p_name"),
      "lineitem" -> Seq(
        (1L, 1L, 1.0, ts("1996-06-01T00:00:00Z")),
        (1L, 1L, 10.0, ts("1995-05-05T00:00:00Z")),
        (1L, 2L, 2.0, ts("1996-06-01T00:00:00Z")),
        (1L, 2L, 3.0, ts("1995-05-05T00:00:00Z")),
        (1L, 3L, 1.0, ts("1996-06-01T00:00:00Z")),
        (1L, 3L, 100.0, ts("1995-05-05T00:00:00Z")),
        (1L, 4L, 50.0, ts("1995-05-05T00:00:00Z")),
        (2L, 2L, 1.0, ts("1996-06-01T00:00:00Z")))
        .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate"))
    val got = run("q286_tpch_q20", dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "S1")), got.mkString(", "))
  }

  test("q287 Q21: sole-late-supplier kept, both-late order drops " +
    "both, open orders and single-supplier orders excluded") {
    val dir = plant(
      "region" -> regions((1, "AMERICA")),
      "nation" -> nations((6, "NATION_6", 1)),
      "supplier" -> suppliers((1L, "S1", 0.0, 6), (2L, "S2", 0.0, 6)),
      "orders" -> Seq(
        (1L, "F", ts("1996-01-01T00:00:00Z")),
        (2L, "F", ts("1996-01-01T00:00:00Z")),
        (3L, "O", ts("1996-01-01T00:00:00Z")),
        (4L, "F", ts("1996-01-01T00:00:00Z")))
        .toDF("o_orderkey", "o_orderstatus", "o_orderdate"),
      "lineitem" -> Seq(
        (1L, 1L, ts("1996-06-01T00:00:00Z")), // late, other on time
        (1L, 2L, ts("1996-01-15T00:00:00Z")),
        (2L, 1L, ts("1996-06-01T00:00:00Z")), // both late -> neither
        (2L, 2L, ts("1996-07-01T00:00:00Z")),
        (3L, 1L, ts("1996-06-01T00:00:00Z")), // open order
        (4L, 1L, ts("1996-06-01T00:00:00Z"))) // sole supplier
        .toDF("l_orderkey", "l_suppkey", "l_shipdate"))
    val got = run("q287_tpch_q21", dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("S1", 1L)), got.mkString(", "))
  }

  test("q288 Q22: positive-balance mean by cross-multiplication, " +
    "pre-cut orders don't block, recent orders do") {
    // positives: 20000 + 1000 + 15000 -> sum 36000, n 3. Rich:
    // c1 (60000 > 36000), c5 (45000 > 36000). c5 ordered 2000-06-01
    // -> blocked; c1's 1999 order is before the dormancy cut.
    val dir = plant(
      "customer" -> Seq(
        (1L, 2, 200.00), (2L, 2, 10.00), (3L, 5, -5.00),
        (4L, 3, 500.00), (5L, 5, 150.00))
        .toDF("c_custkey", "c_nationkey", "c_acctbal"),
      "orders" -> Seq(
        (1L, ts("1999-01-01T00:00:00Z")),
        (5L, ts("2000-06-01T00:00:00Z")),
        (4L, ts("2001-01-01T00:00:00Z")))
        .toDF("o_custkey", "o_orderdate"))
    val got = run("q288_tpch_q22", dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2, 1L, 20000L)), got.mkString(", "))
  }
}

package graft.queries

/** Planted units for the round-15 wave (q397-q400): each query runs
  * end-to-end on hand-computed fixtures and is checked against a
  * plain-Scala replay of the same exact arithmetic. */
class Round15Spec extends PlantedQuerySpec {

  import spark.implicits._

  private def lineitemDay(day: Int, price: Double) =
    (1L, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), price)

  test("q397: level shift at day 10 is the root changepoint; flat " +
    "halves fall back to the earliest day with zero statistic") {
    // days 1-10 at 100.00, days 11-20 at 200.00: |D| peaks exactly at
    // the boundary (j=10: 20*1e6c - 10*3e6c/.. -> 1,000,000 c-days)
    val rows = (1 to 10).map(d => lineitemDay(d, 100.0)) ++
      (11 to 20).map(d => lineitemDay(d, 200.0))
    val dir = plant("lineitem" ->
      rows.toDF("l_orderkey", "l_shipdate", "l_extendedprice"))
    val got = run("q397_cusum_changepoint", dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("left", "2024-01-01", 0L, 10000L, 10000L),
      ("right", "2024-01-11", 0L, 20000L, 20000L),
      ("root", "2024-01-10", 50000L, 10000L, 20000L)))
  }

  test("q398: class-size and sensitive-diversity profile on two " +
    "hand-built equivalence classes") {
    val cust = Seq(
      // class A: nk=1/SEG_A/bucket 0 — four members
      (1L, "c1", 1, 500.0, "SEG_A"), (2L, "c2", 1, 600.0, "SEG_A"),
      (3L, "c3", 1, 700.0, "SEG_A"), (4L, "c4", 1, 800.0, "SEG_A"),
      // class B: nk=2/SEG_B/bucket 1 — two members
      (5L, "c5", 2, 1500.0, "SEG_B"), (6L, "c6", 2, 1600.0, "SEG_B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    // class A sees two priorities (l=2), class B one (l=1)
    val orders = Seq((10L, 1L, "1-URGENT"), (11L, 2L, "3-MEDIUM"),
      (12L, 5L, "1-URGENT"), (13L, 6L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val dir = plant("customer" -> cust, "orders" -> orders)
    val got = run("q398_k_anonymity", dir).collect()(0)
    assert(got.toSeq == Seq(6L, 2L, 2L, 4L, 6L, 1000L, 1L, 1L, 2L),
      got.toSeq.toString)
  }

  test("q399: frontier keeps the tradeoff corners and ties, drops " +
    "dominated docs; two-level merge agrees") {
    val docs = Seq(
      (1L, "a b c", "en", "srcA", 5L),     // (3,3) frontier
      (2L, "a a b", "en", "srcA", 5L),     // (3,2) dominated by d1
      (3L, "a a a b", "en", "srcB", 7L),   // (4,2) frontier corner
      (4L, "a b", "en", "srcB", 3L),       // (2,2) dominated
      (5L, "b c d", "en", "srcB", 5L))     // (3,3) tie with d1 — kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = plant("documents" -> docs)
    val got = run("q399_pareto_frontier", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, 3L, 3L, true), (3L, 4L, 2L, true),
      (5L, 3L, 3L, true)), got.toSeq.toString)
  }

  test("q400: two-source JS matches the plain-Scala micro-nat replay") {
    val docs = Seq(
      (1L, "a a b", "en", "s1", 5L),   // s1: c(a)=2 c(b)=1, N1=3
      (2L, "a b b b", "en", "s2", 7L)) // s2: c(a)=1 c(b)=3, N2=4
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = plant("documents" -> docs)
    val got = run("q400_js_divergence", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // replay with the exact query arithmetic
    def lnGrid(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong
    val (n1, n2) = (3L, 4L)
    // word a: c1=2 c2=1; word b: c1=1 c2=3
    val sa = 2L * lnGrid(2 * 2 * n2, 2 * n2 + 1 * n1) +
      1L * lnGrid(2 * 1 * n2, 1 * n2 + 3 * n1)
    val sb = 1L * lnGrid(2 * 1 * n1, 2 * n2 + 1 * n1) +
      3L * lnGrid(2 * 3 * n1, 1 * n2 + 3 * n1)
    def sdiv(x: Long, d: Long): Long = if (x < 0) -((-x) / d) else x / d
    val klA = sdiv(sa, n1) // no missing mass: all words shared
    val klB = sdiv(sb, n2)
    val js = sdiv(klA + klB, 2L)
    assert(got.toSeq == Seq(("s1", "s2", klA, klB, js)),
      s"got=${got.toSeq} want=($klA,$klB,$js)")
    assert(js > 0L) // genuinely divergent sources
  }
}

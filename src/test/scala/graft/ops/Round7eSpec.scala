package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 sixth-wave units: per-group OLS, PMI collocations, rolling
  * P95, day-of-week seasonality, and the Gini index.
  */
class Round7eSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- olsByGroup --------------------------------------------------------

  test("olsByGroup: exact fit recovers slope, intercept, r2 = 1") {
    // y = 2x + 1 exactly (dollar units; cents scale cancels in slope)
    val df = Seq(("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0))
      .toDF("grp", "x", "y")
    val got = StatsOps.olsByGroup(df, "grp", "x", "y")
      .as[(String, Long, Double, Double, Double)].head()
    assert(got._1 == "g" && got._2 == 3L)
    assert(math.abs(got._3 - 2.0) < 1e-12, got.toString) // slope
    assert(math.abs(got._4 - 100.0) < 1e-9, got.toString) // intercept, cents
    assert(math.abs(got._5 - 1.0) < 1e-12, got.toString) // r2
  }

  test("olsByGroup: zero x-variance yields NULL slope and r2") {
    val df = Seq(("g", 2.0, 1.0), ("g", 2.0, 9.0)).toDF("grp", "x", "y")
    val row = StatsOps.olsByGroup(df, "grp", "x", "y").collect()(0)
    assert(row.isNullAt(2) && row.isNullAt(4), row.toString)
  }

  test("olsByGroup: groups regress independently") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0),
      ("b", 1.0, 2.0), ("b", 2.0, 4.0)).toDF("grp", "x", "y")
    val got = StatsOps.olsByGroup(df, "grp", "x", "y")
      .select("grp", "slope").as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 1.0) < 1e-12 && math.abs(got("b") - 2.0) < 1e-12,
      got.toString)
  }

  // ---- pmiTopK -----------------------------------------------------------

  test("pmiTopK: the always-adjacent pair outranks the independent pair") {
    // "x y" always adjacent; "a b" co-occur but a/b also appear apart
    val docs = (1 to 6).map(i => s"x y a $i b").toDF("t")
    val got = CorpusOps.pmiTopK(docs, "t", minCount = 5, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.head._1 == "x" && got.head._2 == "y", got.toString)
    // pmi_u sorted descending
    assert(got.map(_._4) == got.map(_._4).sorted.reverse, got.toString)
  }

  test("pmiTopK: pairs below minCount are gated out") {
    val docs = Seq("p q", "p q", "r s").toDF("t")
    val got = CorpusOps.pmiTopK(docs, "t", minCount = 2, k = 10)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(got == Seq(("p", "q")), got.toString)
  }

  // ---- rollingP95Daily ---------------------------------------------------

  test("rollingP95Daily: trailing-frame interpolated P95") {
    val days = (1 to 3).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$i 00:00:00"), i * 1.0, 0.0)
    }.toDF("l_shipdate", "l_extendedprice", "l_discount")
    val got = StatsOps.rollingP95Daily(days, days = 7)
      .select("p95").as[Double].collect().toSeq
    // rev_u = 10000, 20000, 30000
    // frames: [1], [1,2], [1,2,3] -> p95 = 10000, 19500, 29000
    assert(got == Seq(10000.0, 19500.0, 29000.0), got.toString)
  }

  // ---- dowSeasonality ----------------------------------------------------

  test("dowSeasonality: indexes weight by day mean and cover ISO dows") {
    // Mon 2024-01-01 rev 100.00 x1 day; Tue 2024-01-02 rev 300.00 x1
    val df = Seq(
      ("2024-01-01", 100.0), ("2024-01-02", 300.0))
      .map { case (d, p) => (java.sql.Timestamp.valueOf(d + " 00:00:00"), p, 0.0) }
      .toDF("l_shipdate", "l_extendedprice", "l_discount")
    val got = StatsOps.dowSeasonality(df)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // overall mean 200.00/day: Mon idx 0.5, Tue idx 1.5
    assert(got == Seq((1, 1L, 1000000L, 0.5), (2, 1L, 3000000L, 1.5)),
      got.toString)
  }

  // ---- gini --------------------------------------------------------------

  test("gini: perfect equality 0; hand-computed concentration") {
    val eq = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0)).toDF("k", "v")
    val g0 = StatsOps.gini(eq, "k", "v").select("gini").as[Double].head()
    assert(g0 == 0.0, g0.toString)
    // one key holds everything: G = (2*3*x - 4*x)/(3*x) = 2/3 for n=3
    val conc = Seq(("a", 0.0), ("b", 0.0), ("c", 9.0)).toDF("k", "v")
    val g1 = StatsOps.gini(conc, "k", "v").select("gini").as[Double].head()
    assert(math.abs(g1 - 2.0 / 3.0) < 1e-12, g1.toString)
  }

  test("gini: multiple rows per key aggregate before ranking") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0)).toDF("k", "v")
    // per-key: a=200, b=200 -> equality
    val g = StatsOps.gini(df, "k", "v").select("gini").as[Double].head()
    assert(g == 0.0, g.toString)
  }
}

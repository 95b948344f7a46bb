package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 fourth-wave units: profiling statistics (correlation, MAD,
  * EWMA, histogram), fuzzy best-match linkage, bigram/DSIR scoring,
  * and integer-grid PageRank.
  */
class Round7cSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- corrMatrix --------------------------------------------------------

  test("corrMatrix: perfect linear ±1 to double precision, nonlinear between") {
    val df = Seq((1.0, 2.0, 3.0, 1.0), (2.0, 4.0, 2.0, 4.0),
      (3.0, 6.0, 1.0, 9.0)).toDF("x", "y", "z", "q")
    val got = StatsOps.corrMatrix(df, Seq("x", "y", "z", "q"))
      .as[(String, Double)].collect().toMap
    // the last-ulp shortfall (0.99999999999999989…) is the exact
    // double the oracle's identical formula produces — asserted
    // tight, not ==1, deliberately
    assert(math.abs(got("x__y") - 1.0) < 1e-15, got.toString)
    assert(math.abs(got("x__z") + 1.0) < 1e-15, got.toString)
    assert(got("x__q") > 0.9 && got("x__q") < 1.0, got.toString)
    assert(got.size == 6)
  }

  test("corrMatrix: zero variance yields NULL (DuckDB x/0 convention)") {
    val df = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "c")
    val got = StatsOps.corrMatrix(df, Seq("x", "c"))
      .as[(String, Option[Double])].collect().toMap
    assert(got("x__c").isEmpty, got.toString)
  }

  // ---- madOutliers -------------------------------------------------------

  test("madOutliers: hand-computed median/MAD and outlier count") {
    // dollars 1..9 plus one 100 outlier; cents median 550, MAD 250
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("grp", "v")
    val got = StatsOps.madOutliers(df, "grp", "v")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("g", 10L, 550.0, 250.0, 1L)), got.toString)
  }

  test("madOutliers: constant group has MAD 0 and no outliers") {
    val df = Seq(("g", 7.0), ("g", 7.0), ("g", 7.0)).toDF("grp", "v")
    val got = StatsOps.madOutliers(df, "grp", "v")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("g", 3L, 700.0, 0.0, 0L)), got.toString)
  }

  // ---- ewmaDaily ---------------------------------------------------------

  test("ewmaDaily: first row is its own average; second blends 1:0.7") {
    val df = Seq(
      ("2024-01-01", 1.00, 0.0),
      ("2024-01-02", 2.00, 0.0)).toDF("d", "l_extendedprice", "l_discount")
      .select(to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val got = StatsOps.ewmaDaily(df)
      .select(col("rev_u"), col("ewma_u")).as[(Long, Long)].collect().toSeq
    // rev_u = cents * (100 - disc_pct): 100*100=10000, 200*100=20000
    val e2 = math.floor(
      (math.floor(20000.0 * 1.0 + 0.5) + math.floor(10000.0 * 0.7 + 0.5)) /
        (1.0 + 0.7) + 0.5).toLong
    assert(got == Seq((10000L, 10000L), (20000L, e2)), got.toString)
  }

  test("ewmaDaily: days beyond the 30-day depth stop contributing") {
    // constant series: ewma == the constant at every depth
    val const = (1 to 40).map(i =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()),
        5.00, 0.0))
      .toDF("l_shipdate", "l_extendedprice", "l_discount")
    val got = StatsOps.ewmaDaily(const).select("ewma_u")
      .as[Long].collect().toSeq
    // per-term flooring costs at most one 1e-4-dollar unit on a
    // 30-term frame; every FULL-depth frame of a constant series is
    // the identical term multiset, hence one identical value
    assert(got.forall(v => math.abs(v - 50000L) <= 1), got.distinct.toString)
    assert(got.drop(StatsOps.EwmaDepth - 1).distinct.size == 1, got.toString)
  }

  // ---- histogram ---------------------------------------------------------

  test("histogram: exact edges, max folds into last bin") {
    val df = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val got = StatsOps.histogram(df, "v", bins = 4)
      .as[(Long, Long)].collect().toSeq
    // cents 0,100,200,300 over [0,300]: bins 0,1,2 and max->3
    assert(got == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)), got.toString)
  }

  test("histogram: constant column lands in bin 0") {
    val df = Seq(5.0, 5.0).toDF("v")
    val got = StatsOps.histogram(df, "v", bins = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L)), got.toString)
  }

  // ---- fuzzyBestMatch ----------------------------------------------------

  test("fuzzyBestMatch: typo links back, ties break on lowest rid") {
    val clean = Seq((1L, "alpha-01", "01"), (2L, "alpha-02", "02"),
      (3L, "beta-01", "01")).toDF("id", "name", "block")
    val dirty = Seq((10L, "alpha+01", "01"), // dist 1 to alpha-01, 4 to beta
      (11L, "beta-01", "01"), // exact
      (12L, "gamma-99", "01")) // no match within 2
      .toDF("id", "name", "block")
    val got = MatchOps.fuzzyBestMatch(dirty, clean, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 1L, 1), (11L, 3L, 0)), got.toString)
  }

  test("fuzzyBestMatch: equal-distance candidates pick the lowest rid") {
    val clean = Seq((7L, "aab", "b"), (4L, "abb", "b")).toDF("id", "name", "block")
    val dirty = Seq((1L, "ab", "b")).toDF("id", "name", "block")
    val got = MatchOps.fuzzyBestMatch(dirty, clean, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1)), got.toString) // both dist 1; rid 4 < 7
  }

  // ---- bigramSurprisal ---------------------------------------------------

  test("bigramSurprisal: hand-computed add-one bigram scores") {
    val df = Seq((1L, "a b a b"), (2L, "a")).toDF("id", "t")
    val got = LmOps.bigramSurprisal(df, "id", "t")
      .as[(Long, Long, Long)].collect().toSeq
    // bigrams: "a b" x2, "b a" x1; uni a=3 b=2; V=2
    def g(cb: Long, cu: Long): Long =
      math.floor(-math.log((cb + 1.0) / (cu + 2.0)) * 1e6 + 0.5).toLong
    val expect1 = 2 * g(2, 3) + g(1, 2) // two "a b" terms + one "b a"
    assert(got == Seq((1L, 3L, expect1)), got.toString) // doc 2: no bigrams
  }

  // ---- dsirWeights -------------------------------------------------------

  test("dsirWeights: hand-computed target/source log-ratio fold") {
    val df = Seq((1L, "a a b", "en"), (2L, "b c", "fr")).toDF("id", "t", "lang")
    val got = LmOps.dsirWeights(df, "id", "t", col("lang") === "en")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // cs: a2 b2 c1, ct: a2 b1 c0; V=3, ds=5+3=8, dt=3+3=6
    def term(ct: Long, cs: Long): Long =
      math.floor((math.log((ct + 1.0) / 6.0) - math.log((cs + 1.0) / 8.0)) * 1e6 + 0.5).toLong
    val w1 = 2 * term(2, 2) + term(1, 2)
    val w2 = term(1, 2) + term(0, 1)
    assert(got == Seq((1L, 3L, w1), (2L, 2L, w2)), got.toString)
  }

  test("dsirWeights: target slice scores above off-target on its own tokens") {
    val df = Seq((1L, "x x x", true), (2L, "y y y", false),
      (3L, "x x y", true)).toDF("id", "t", "tgt")
    val got = LmOps.dsirWeights(df, "id", "t", col("tgt"))
      .as[(Long, Long, Long)].collect().toSeq
      .map { case (id, n, w) => id -> (n, w) }.toMap
    assert(got(1L)._2 > got(2L)._2, got.toString)
  }

  // ---- pageRank ----------------------------------------------------------

  test("pageRank: source-only nodes hold exactly the teleport mass") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val tele = math.floor(0.15 * 1e12).toLong / 3
    assert(got(1L) == tele, got.toString) // no in-edges: teleport only
    assert(got(3L) > got(2L), got.toString) // 3 receives from both 1 and 2
    assert(got.values.forall(_ > 0))
  }

  test("pageRank: rank is a pure function of the edge multiset") {
    val e1 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = GraphOps.pageRank(e1, iters = 2).as[(Long, Long)].collect().toSeq
    val b = GraphOps.pageRank(e1.repartition(7), iters = 2)
      .as[(Long, Long)].collect().toSeq
    assert(a == b, s"$a vs $b")
    // symmetric 2-cycle: equal ranks
    assert(a.map(_._2).distinct.size == 1, a.toString)
  }
}

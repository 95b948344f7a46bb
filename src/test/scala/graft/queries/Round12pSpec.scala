package graft.queries

/** Hand-computed units for q301-q304. */
class Round12pSpec extends PlantedQuerySpec {

  import spark.implicits._

  private val P = 2147483647L
  private def h2(id: Long, seed: Long): Long =
    (((id % P + seed) * 48271L) % P + 1L) * 69621L % P

  test("q301 DiD: parallel pre-trends give placebo zero; the post " +
    "divergence is the estimate") {
    // pick one custkey of each hash arm, give both the same pre path
    // (10 then 20) and diverge post (treat 50 vs ctrl 30):
    // did = (50 - 15) - (30 - 15) = 20 dollars = 2e7 on the 1e-4 grid.
    val treatKey = (1L to 20L).find(k => h2(k, 424242L) % 2 == 0).get
    val ctrlKey = (1L to 20L).find(k => h2(k, 424242L) % 2 == 1).get
    def o(k: Long, d: String, v: Double) =
      (k, ts(s"${d}T00:00:00Z"), v)
    val dir = plant("orders" -> Seq(
      o(treatKey, "1996-05-05", 10.00), o(treatKey, "1998-01-01", 20.00),
      o(treatKey, "2000-01-01", 50.00),
      o(ctrlKey, "1996-05-05", 10.00), o(ctrlKey, "1998-01-01", 20.00),
      o(ctrlKey, "2000-01-01", 30.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice"))
    val got = run("q301_did_estimator", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("ctrl", "post", 1L, 30000000L, 20000000L, 0L),
      ("ctrl", "pre0", 1L, 10000000L, 20000000L, 0L),
      ("ctrl", "pre1", 1L, 20000000L, 20000000L, 0L),
      ("treat", "post", 1L, 50000000L, 20000000L, 0L),
      ("treat", "pre0", 1L, 10000000L, 20000000L, 0L),
      ("treat", "pre1", 1L, 20000000L, 20000000L, 0L)),
      got.mkString(", "))
  }

  test("q302 Nelson-Aalen: exact ppb hazard increments, censoring " +
    "shrinks the risk set without a hazard step") {
    // events at day 10 (x2, n=4) and day 40 (x1, n=1); order 5 is
    // censored at min(45, 30) = 30 (the q124 contract).
    def o(k: Long, d: String) = (k, ts(s"${d}T00:00:00Z"))
    def l(k: Long, d: String) = (k, ts(s"${d}T00:00:00Z"))
    val dir = plant(
      "orders" -> Seq(o(1L, "1996-01-01"), o(2L, "1996-01-01"),
        o(3L, "1996-01-01"), o(5L, "1996-01-01"))
        .toDF("o_orderkey", "o_orderdate"),
      "lineitem" -> Seq(l(1L, "1996-01-11"), l(2L, "1996-01-11"),
        l(3L, "1996-02-10"), l(5L, "1996-02-15"))
        .toDF("l_orderkey", "l_shipdate"))
    val got = run("q302_nelson_aalen", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (10L, 4L, 2L, 0L, 500000000L, 125000000000L),
      (30L, 2L, 0L, 1L, 500000000L, 125000000000L),
      (40L, 1L, 1L, 0L, 1500000000L, 1125000000000L)),
      got.mkString(", "))
  }

  test("q303 RAKE: stopword-split runs, single-token runs dropped, " +
    "degree/frequency scores, phrase-name tiebreak") {
    // doc 0 runs: [data pipeline] x2, [fast scan]; doc 1 has no
    // 2+-token run; doc 2's [solo] is length 1 -> dropped.
    // every surviving word: wscore = deg/freq = 2e6; both phrases
    // score 4e6 -> tiebreak on the phrase string.
    val dir = plant("documents" -> Seq(
      (0L, "data pipeline the data pipeline a fast scan"),
      (1L, "the a of"),
      (2L, "solo the"))
      .toDF("doc_id", "text"))
    val got = run("q303_rake_keyphrases", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("data pipeline", 2L, 4000000L),
      ("fast scan", 1L, 4000000L)), got.mkString(", "))
  }

  test("q304 Neyman: weights = n*sqrt(sample var); zero-variance " +
    "stratum gets zero; largest remainder closes the budget exactly") {
    // (A,F): x {100, 300} -> w = 2*sqrt(20000) -> 283
    // (N,O): x {100, 100} -> var 0 -> w 0
    // (R,F): x {200, 400, 600} -> w = 3*sqrt(40000) = 600
    // floors over W=883: 3204 / 0 / 6795 (sum 9999); the one leftover
    // seat goes to (A,F)'s remainder 868.
    def li(rf: String, ls: String, ep: Double) = (rf, ls, ep)
    val dir = plant("lineitem" -> Seq(
      li("A", "F", 1.00), li("A", "F", 3.00),
      li("N", "O", 1.00), li("N", "O", 1.00),
      li("R", "F", 2.00), li("R", "F", 4.00), li("R", "F", 6.00))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice"))
    val got = run("q304_neyman_alloc", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("A", "F", 2L, 283L, 3205L),
      ("N", "O", 2L, 0L, 0L),
      ("R", "F", 3L, 600L, 6795L)), got.mkString(", "))
    assert(got.map(_._5).sum == 10000L, "allocation must close the budget")
  }
}

package graft.queries

/** Hand-computed units for the round-14 third wave (q387-q392). */
class Round14cSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def li(price: Double, flag: String) =
    (1L, 1L, 1L, 1, 1.0, price, 0.0, 0.0, flag, "O", "1996-01-01")

  private def liDf(rows: (Double, String)*) = rows.map { case (p, f) =>
    li(p, f) }.toDF("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  test("q387 CvM: identical samples give T = 0; disjoint samples give " +
    "the hand-computed positive statistic") {
    val same = liDf((1.0, "R"), (2.0, "R"), (1.0, "N"), (2.0, "N"))
    val r0 = run("q387_cvm_test", plant("lineitem" -> same)).collect()(0)
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == (2L, 2L, 0L))
    // A = {100, 200} cents, B = {300, 400}: pooled diffs at the 4
    // values: (1*2-0*2)=2,(2*2-0*2)=4,(4-2)=2,(4-4)=0 -> squares
    // 4,16,4,0 each cnt 1 -> S = 24; T = 24/(2*2*16) = 0.375
    // two-stage grid: (24*1000 div 4) * 1000 div 16 = 375000
    val disj = liDf((1.0, "R"), (2.0, "R"), (3.0, "N"), (4.0, "N"))
    val r1 = run("q387_cvm_test", plant("lineitem" -> disj)).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ==
      (2L, 2L, 375000L), r1.toString)
  }

  test("q389 moments: a symmetric sample has zero skew; uniform two-" +
    "point has kurtosis -2") {
    // {1, 2, 3} dollars: m2 = 2/3*10000^2... use cents: 100,200,300
    // mean 200, m2 = 20000/3... skew 0 by symmetry; two-point {100,300}
    // has g2 = -2 exactly
    val df = liDf((1.0, "R"), (2.0, "R"), (3.0, "R"),
      (1.0, "N"), (3.0, "N"))
    val got = run("q389_higher_moments", plant("lineitem" -> df))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val n = got.find(_._1 == "N").get
    val r = got.find(_._1 == "R").get
    assert(r == ("R", 3L, 200L, 0L, -1500000L), r.toString) // g2 = -1.5
    assert(n == ("N", 2L, 200L, 0L, -2000000L), n.toString)
  }

  test("q391 jackknife: two equal groups with equal means give zero " +
    "variance; a level shift gives the hand value") {
    def o(ck: Long, price: Double) =
      (ck, ck, "O", price, "1996-01-01T00:00:00", "1-URGENT")
    // groups g=0 (ck 32) and g=1 (ck 33): two orders each.
    // equal means -> thetas equal -> V = 0
    val eq = Seq(o(32, 10.0), o(32, 20.0), o(33, 10.0), o(33, 20.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r0 = run("q391_jackknife", plant("orders" -> eq)).collect()(0)
    assert(r0.getLong(0) == 2L && r0.getLong(1) == 1500000L &&
      r0.getLong(2) == 0L && r0.getLong(3) == 0L, r0.toString)
    // shift group 1: values 10,20 vs 30,40 (cents 1000..4000):
    // S=10000,N=4; theta=2500*1000=2500000 milli
    // theta_(0) = (10000-3000)*1000 div 2 = 3500000
    // theta_(1) = (10000-7000)*1000 div 2 = 1500000
    // V = (2-1)*(2*(3.5e6^2+1.5e6^2) - (5e6)^2)/4 = (29.0e12-25e12)/4
    //   = 1e12; se = 1e6
    val sh = Seq(o(32, 10.0), o(32, 20.0), o(33, 30.0), o(33, 40.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r1 = run("q391_jackknife", plant("orders" -> sh)).collect()(0)
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2500000L &&
      r1.getLong(2) == 1000000000000L && r1.getLong(3) == 1000000L,
      r1.toString)
  }

  test("q388 CEM: only strata with both groups match; ATT is the " +
    "treated-weighted mean difference") {
    def o(yr: Int, status: String, prio: String, price: Double) =
      (1L, 1L, status, price, s"$yr-06-01T00:00:00", prio)
    // 1996/O: treated {30}, control {10, 20} -> diff = 3000-1500=1500c
    // 1997/O: treated {40, 60}, control {10} -> diff = 5000-1000=4000c
    // 1998/F: treated only -> unmatched, dropped
    // ATT = (1*1500 + 2*4000)/3 = 3166c
    val orders = Seq(
      o(1996, "O", "1-URGENT", 30.0), o(1996, "O", "5-LOW", 10.0),
      o(1996, "O", "5-LOW", 20.0),
      o(1997, "O", "2-HIGH", 40.0), o(1997, "O", "1-URGENT", 60.0),
      o(1997, "O", "5-LOW", 10.0),
      o(1998, "F", "1-URGENT", 99.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = run("q388_cem_att", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1996L, "O", 1L, 2L, 1500L, 3166L),
      (1997L, "O", 2L, 1L, 4000L, 3166L)), got.mkString(", "))
  }

  test("q390 negative sampling: draws are the hash recipe, self and " +
    "collision flags fire") {
    val emb = Seq((0L, Array(0f), 7), (1L, Array(0f), 7),
      (2L, Array(0f), 8)).toDF("vec_id", "embedding", "label")
    val got = run("q390_negative_sampling", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.length == 12)
    def draw(id: Long, j: Long): Long =
      ((((id * 53 + j * 1000003) * 1103515245 + 12345) % 2147483648L) *
        1103515245 + 54321) % 2147483648L % 3
    val labels = Map(0L -> 7L, 1L -> 7L, 2L -> 8L)
    got.foreach { case (id, j, neg, self, coll) =>
      assert(neg == draw(id, j), s"draw($id,$j)")
      assert(self == (neg == id) && coll == (labels(neg) == labels(id)))
    }
  }

  test("q392 blocking quality: a same-block duplicate is found, a " +
    "cross-block duplicate is missed, completeness reflects it") {
    // 4 docs (< sample cap, all sampled). docs 1/2: same text, same
    // block -> true pair found. docs 3/4: same text, different lang ->
    // true pair NOT in candidates. doc pairs 6 total; candidates:
    // (1,2) and nothing else (others differ in block).
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "s", 16L),
      (2L, "alpha beta gamma", "en", "s", 16L),
      (3L, "delta epsilon zeta", "en", "s", 300L),
      (4L, "delta epsilon zeta", "fr", "s", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = run("q392_blocking_quality", plant("documents" -> docs))
      .collect()(0)
    assert(r.getLong(0) == 4L, r.toString) // n_sample
    assert(r.getLong(1) == 2L, r.toString) // n_true
    assert(r.getLong(2) == 1L, r.toString) // n_cand
    assert(r.getLong(3) == 1L, r.toString) // n_found
    assert(r.getLong(4) == (6L - 1L) * 1000000L / 6L, r.toString)
    assert(r.getLong(5) == 500000L, r.toString)
  }
}

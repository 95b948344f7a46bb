package graft.queries

/** Hand-computed units for the round-12 eval wave (q263-q269): tiny
  * planted fixtures whose NDCG discounts, RA scores, assortativity,
  * clustering coefficients, token censuses and McNemar cells were
  * worked out by hand, driven through the REAL registered queries.
  */
class Round12hSpec extends PlantedQuerySpec {

  import spark.implicits._

  // co-purchase fixture helper: one (order, part) row per item, all
  // above the qty gate so the basket IS the edge source
  private def baskets(rows: (Long, Long)*) =
    rows.map { case (ok, pk) => (ok, pk, 50d) }
      .toDF("l_orderkey", "l_partkey", "l_quantity")

  test("q263 NDCG@10: discounts, corpus-wide IDCG, zero-relevant NULL") {
    // v0=[1,0] L1, v1=[1,0] L1, v2=[.8,.6] L0, v3=[0,1] L1.
    // q0: ranks v1(cos 1, rel), v2(.8), v3(0, rel) -> dcg d1+d3,
    // total_rel 2 -> idcg d1+d2; q2 (label 0) has NO other relevant
    // doc -> idcg/ndcg NULL; q3: v2(.6, irrel), then v0/v1 at cos 0
    // tie-broken by id -> dcg d2+d3.
    val dir = plant("embeddings" -> Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.8f, 0.6f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label"))
    val got = run("q263_ndcg_eval", dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 1500000000L, 1630929754L, 919720L),
      (1L, 2L, 1500000000L, 1630929754L, 919720L),
      (2L, 0L, 0L, -1L, -1L),
      (3L, 2L, 1130929754L, 1630929754L, 693426L)), got.mkString(", "))
  }

  test("q264 RA link prediction: path graph predicts the closing edge") {
    // edges (1-2), (2-3): sole candidate (1,3) through center 2
    // (deg 2) -> ra_u = 1e12 div 2; adjacent pairs never surface
    val dir = plant("lineitem" -> baskets(
      (10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L)))
    val got = run("q264_link_predict", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 500000000000L)),
      got.mkString(", "))
  }

  test("q265 assortativity: path graph is perfectly disassortative") {
    // edges (1-2), (2-3); directed degree pairs (1,2),(2,1),(2,1),(1,2)
    // -> n=4, Σx=6, Σx²=10, Σxy=8 -> r = (32-36)/(40-36) = -1
    val dir = plant("lineitem" -> baskets(
      (10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L)))
    val got = run("q265_assortativity", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((4L, 6L, 10L, 8L, -1.0)), got.mkString(", "))
  }

  test("q266 clustering census: triangle corners 1.0, bridge 1/3, " +
    "pendant excluded") {
    // triangle {1,2,3} + pendant edge (3-4): cc(1)=cc(2)=1 (decile
    // 10), cc(3)=2*1e6/6=333333 (decile 3), node 4 deg<2 dropped
    val dir = plant("lineitem" -> baskets(
      (10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L)))
    val got = run("q266_clustering_coeff", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 1L, 333333L), (10L, 2L, 1000000L)),
      got.mkString(", "))
  }

  test("q267 kappa/MCC: internal identities hold on the real fixture") {
    // the logreg trajectory is pinned by q86/q161's oracles; here the
    // agreement algebra is re-derived from the returned counts
    val r = run("q267_kappa_mcc", "/root/testdata/sf0.001").collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val n = tp + fp + fn + tn
    assert(n > 0)
    assert(r.getLong(4) == (tp + tn) * 1000000L / n) // po_ppm
    val peNum = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    assert(r.getLong(5) == peNum * 1000000L / (n * n)) // pe_ppm
    val kappa = r.getDouble(6)
    assert(kappa == (n * (tp + tn) - peNum).toDouble / (n * n - peNum))
    assert(kappa >= -1.0 && kappa <= 1.0)
    if (!r.isNullAt(7)) {
      val mcc = r.getDouble(7)
      assert(mcc >= -1.0 && mcc <= 1.0)
      assert(mcc == (tp * tn - fp * fn).toDouble /
        math.sqrt(((tp + fp).toDouble * (tp + fn).toDouble) *
          ((tn + fp).toDouble * (tn + fn).toDouble)))
    }
  }

  test("q268 vocab richness: census, Chao1 half-integer grid, GT mass") {
    // tokens: a x2, b x1, c x2 -> V=3 N=5 f1=1 f2=2;
    // chao1_x10 = 30 + 10*1*0/(2*3) = 30; gt = 1e6/5; singleton = 1e6/3
    val dir = plant("documents" -> Seq(
      (1L, "a b"), (2L, "a c c")).toDF("doc_id", "text"))
    val got = run("q268_vocab_richness", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq((3L, 5L, 1L, 2L, 30L, 200000L, 333333L)),
      got.mkString(", "))
  }

  test("q270 Davies-Bouldin: hand-traced Lloyd + integer scatter/" +
    "separation grid") {
    // init c0..c3 = the 4 lowest-id points; v4=[2,0] joins cell 0; the
    // one update moves c0 to [1,0]; final: members of cell 0 each at
    // distance 1 -> s_0 = 10000 (1e-4 units), singleton cells s = 0.
    // m(0,1)=9 -> 90000, m(0,2)=sqrt(101) -> 100499,
    // m(0,3)=sqrt(181) -> 134536, m(1,2)=sqrt(200), m(1,3)=m(2,3)=10.
    // R = {111111, 111111, 99503, 74329}; DB = 396054 div 4 = 99013.
    val dir = plant("embeddings" -> Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 0.0f)),
      (2L, Seq(0.0f, 10.0f)), (3L, Seq(10.0f, 10.0f)),
      (4L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding"))
    val got = run("q270_davies_bouldin", dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0, 2L, 10000L, 111111L, 99013L),
      (1, 1L, 0L, 111111L, 99013L),
      (2, 1L, 0L, 99503L, 99013L),
      (3, 1L, 0L, 74329L, 99013L)), got.mkString(", "))
  }

  test("q269 McNemar: discordant cells only, continuity correction") {
    // n11=1, n10=4, n01=1, n00=1 -> chi2_u = (|4-1|-1)^2 * 1e6 / 5
    def txt(spaces: Int) = ("a " * spaces) + "a"
    val rows = Seq(
      ("en", 400L, txt(60)), // both right
      ("en", 400L, txt(10)), ("en", 400L, txt(10)),
      ("en", 400L, txt(10)), ("en", 400L, txt(10)), // A right B wrong x4
      ("en", 100L, txt(60)), // A wrong B right
      ("fr", 400L, txt(60))) // both wrong
    val dir = plant("documents" ->
      rows.toDF("lang", "n_chars", "text"))
    val got = run("q269_mcnemar", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((1L, 4L, 1L, 1L, 800000L)), got.mkString(", "))
  }
}

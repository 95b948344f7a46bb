package graft.queries

/** Hand-computed units for q275 (log-rank) and q276 (MRR/hit@k). */
class Round12jSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q275 log-rank: risk sets, censoring, per-day micro-grid terms") {
    // urgent {dur 1, 2}, low {dur 1, 3}, plus a censored low order
    // (key 5 % 5 = 0, dur 40 -> t = 30, no event):
    //   t=1: d=2 d1=1 n1=2 n=5 -> ome .2, v 2(.4)(.6)(3/4) = .36
    //   t=2: d=1 d1=1 n1=1 n=3 -> ome 2/3, v (1/3)(2/3)(1) = 2/9
    //   t=3: d=1 d1=0 n1=0     -> both 0;  t=30: d=0 -> skipped
    // ome_u = 866667, v_u = 582222, chi2 = .866667^2/.582222 -> 1.2901
    val dir = plant(
      "orders" -> Seq(
        (1L, "1-URGENT", "1996-01-01"), (2L, "2-HIGH", "1996-01-01"),
        (3L, "5-LOW", "1996-01-01"), (4L, "5-LOW", "1996-01-01"),
        (5L, "5-LOW", "1996-01-01"))
        .toDF("o_orderkey", "o_orderpriority", "o_orderdate"),
      "lineitem" -> Seq(
        (1L, "1996-01-02"), (2L, "1996-01-03"), (3L, "1996-01-02"),
        (4L, "1996-01-04"), (5L, "1996-02-10"))
        .toDF("l_orderkey", "l_shipdate"))
    val got = run("q275_logrank", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq((2L, 3L, 2L, 2L, 866667L, 582222L, 1.2901)),
      got.mkString(", "))
  }

  test("q276 MRR/hit@k: first-relevant rank, no-relevant zero") {
    // the q263 fixture: q0/q1 hit at rank 1; q2 (label 0) never hits;
    // q3's first relevant (v0) lands at rank 2
    val dir = plant("embeddings" -> Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.8f, 0.6f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label"))
    val got = run("q276_mrr_hitk", dir).collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 1000000L, 1L, 1L, 1L),
      (1L, 1L, 1000000L, 1L, 1L, 1L),
      (2L, -1L, 0L, 0L, 0L, 0L),
      (3L, 2L, 500000L, 0L, 1L, 1L)), got.mkString(", "))
  }
}

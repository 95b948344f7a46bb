package graft.queries

/** Hand-computed units for the round-12 additions (q236-q244),
  * driven through the REAL registered queries on planted fixtures.
  */
class Round12Spec extends PlantedQuerySpec {

  import spark.implicits._

  test("q236: Spearman handles tied mid-ranks — perfect inverse " +
    "association with ties is exactly -1") {
    // x: [1,1,2] -> doubled mid-ranks [3,3,6]; y floors to [10,10,5]
    // -> doubled mid-ranks [5,5,2]. Pearson on ranks = -1 exactly.
    val li = Seq((1.0, 10.9), (1.0, 10.2), (2.0, 5.7))
      .toDF("l_quantity", "l_extendedprice")
    val got = run("q236_spearman", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((3L, -1.0)), got.mkString(", "))
  }

  test("q236: strictly monotone pairs give +1") {
    val li = Seq((1.0, 5.0), (2.0, 6.0), (3.0, 7.0))
      .toDF("l_quantity", "l_extendedprice")
    val got = run("q236_spearman", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((3L, 1.0)), got.mkString(", "))
  }

  test("q237: two-customer Gini 0.25 and the decile shares by hand") {
    // rev_u 100 vs 300: G = (2*700 - 3*400)/(2*400) = 0.25;
    // rank 1 -> decile 0 (share 250000 ppm), rank 2 -> decile 5
    val orders = Seq((1L, 1.0), (2L, 3.0)).toDF("o_custkey", "o_totalprice")
    val got = run("q237_gini_lorenz", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val expected = Seq(
      (0L, 1L, 250000L, 250000L, 2L, 0.25),
      (5L, 1L, 750000L, 1000000L, 2L, 0.25))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q238: 10-value group with an outlier — trim drops it, " +
    "winsorize replaces it with the boundary order statistic") {
    // dollars [1,2,2,2,3,4,5,6,7,100], k=1: core(ranks 1..8) sums to
    // 3100 cents -> trimmed 3.875; winsor adds vlo=200 + vhi=700
    // -> 4000/10/100 = 4.0
    val vals = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0)
    val li = vals.map(v => ("A", v)).toDF("l_returnflag", "l_extendedprice")
    val got = run("q238_trimmed_means", plant("lineitem" -> li))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("A", 10L, 1L, 3.875, 4.0)), got.mkString(", "))
  }

  test("q239: three days, one inversion — tau = 1/3, no revenue ties") {
    // daily r = [10, 30, 20]: pair signs +1 +1 -1 -> C-D = 1; n0 = 3,
    // t_r = 0; tau = 1/sqrt(9) = 0.3333 on the n4 grid
    val orders = Seq(("1970-01-01", 10.0), ("1970-01-02", 30.0),
      ("1970-01-03", 20.0))
      .map { case (d, p) => (ts(s"${d}T00:00:00Z"), p) }
      .toDF("o_orderdate", "o_totalprice")
    val got = run("q239_kendall_tau", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq((3L, 1L, 0L, 0.3333)), got.mkString(", "))
  }

  test("q240: grader self-consistency — hits bounded by truth and the " +
    "macro ppm is the exact integer rollup of the rows") {
    val emb = (0L until 10L).map { i =>
      val a = i.toDouble / 10.0
      (i, Array(math.cos(a).toFloat, math.sin(a).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val rows = run("q240_ivf_recall", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.length == 10) // every vector is on the <25 panel
    assert(rows.forall { case (_, nt, nh, _, _) => nh >= 0 && nh <= nt })
    val macroExp = rows.map(_._3).sum * 1000000L / rows.map(_._2).sum
    assert(rows.forall(_._5 == macroExp), rows.mkString(", "))
    rows.foreach { case (_, nt, nh, r4, _) =>
      assert(r4 == math.floor(nh.toDouble / nt * 10000 + 0.5) / 10000)
    }
  }

  test("q241: Q10 keeps only the R-flagged lineitem of the in-window " +
    "order, on the exact cents x discount grid") {
    val orders = Seq(
      (1L, 10L, ts("1996-02-01T00:00:00Z")),  // in window
      (2L, 10L, ts("1995-02-01T00:00:00Z")))  // out of window
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (1L, "R", 10.0, 0.10), // kept: 1000 * 90 = 90000
      (1L, "N", 99.0, 0.00), // wrong flag
      (2L, "R", 50.0, 0.00)) // wrong window
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val cust = Seq((10L, "Customer#10", 77.5, 3L))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = Seq((3L, "FRANCE")).toDF("n_nationkey", "n_name")
    val got = run("q241_tpch_q10", plant("orders" -> orders,
        "lineitem" -> li, "customer" -> cust, "nation" -> nation))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((10L, "Customer#10", 77.5, "FRANCE", 90000L)),
      got.mkString(", "))
  }

  test("q242: Q18 HAVING threshold admits only the 300-qty order") {
    val li = (Seq.fill(3)((1L, 100.0)) ++ Seq((2L, 50.0)))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (1L, 7L, ts("1996-01-05T00:00:00Z"), 123.45),
      (2L, 7L, ts("1996-01-06T00:00:00Z"), 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((7L, "Customer#7")).toDF("c_custkey", "c_name")
    val got = run("q242_tpch_q18", plant("lineitem" -> li,
        "orders" -> orders, "customer" -> cust))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getLong(5)))
    assert(got.toSeq ==
      Seq(("Customer#7", 7L, 1L, "1996-01-05", 12345L, 300L)),
      got.mkString(", "))
  }

  test("q243: bootstrap is deterministic, brackets the sample mean on " +
    "a well-behaved fixture, and the thresholds are a monotone CDF") {
    val thr = Round12bQueries.bootThresholds
    assert(thr.length == 8 && thr == thr.sorted && thr.distinct == thr)
    assert(thr.last < graft.ops.MixOps.P) // tail mass stays positive
    val orders = (1L to 500L).map(k => (k, 100.0 + (k % 7)))
      .toDF("o_orderkey", "o_totalprice")
    val dir = plant("orders" -> orders)
    val a = run("q243_bootstrap_ci", dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val b = run("q243_bootstrap_ci", dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq) // pure function of (data, seed)
    val (nReps, meanFull, lo, hi) = a.head
    assert(nReps == 32L)
    // exact full-sample mean in 1e-4 dollars: sum(cents)*100 div 500
    val exp = orders.collect().map(r =>
      math.floor(r.getDouble(1) * 100 + 0.5).toLong).sum * 100L / 500L
    assert(meanFull == exp, s"$meanFull vs $exp")
    assert(lo <= meanFull && meanFull <= hi, a.head.toString)
  }

  test("q244: the single mislabeled vector in a tight cluster is the " +
    "one flagged noisy (panel ppm = 1/5)") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.14f), 1),
      (2L, Array(0.98f, 0.19f), 1),
      (3L, Array(0.97f, 0.24f), 1),
      (4L, Array(0.96f, 0.28f), 2)) // mislabeled member of the cluster
      .toDF("vec_id", "embedding", "label")
    val got = run("q244_label_noise", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getLong(5)))
    val expected = Seq(
      (0L, 1, 4L, 3L, false, 200000L),
      (1L, 1, 4L, 3L, false, 200000L),
      (2L, 1, 4L, 3L, false, 200000L),
      (3L, 1, 4L, 3L, false, 200000L),
      (4L, 2, 4L, 0L, true, 200000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }
}

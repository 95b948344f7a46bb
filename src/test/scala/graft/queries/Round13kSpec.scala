package graft.queries

/** Hand-computed / plain-Scala-model units for q347-q350. */
class Round13kSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q347 DBSCAN census: matches a plain-Scala all-pairs classifier " +
    "over 500 scrambled points with all three classes present") {
    val keys = (1L to 500L)
    val dir = plant("customer" -> keys.toDF("c_custkey"))
    def x(k: Long) =
      ((((k * 1103515245L + 12345L) % 2147483648L) * 1103515245L + 54321L) %
        2147483648L) % 100000L
    def y(k: Long) =
      ((((k * 69069L + 1L) % 2147483648L) * 69069L + 777L) %
        2147483648L) % 100000L
    val r2 = 4000L * 4000L
    val pts = keys.map(k => (x(k), y(k)))
    val nbrs = pts.indices.map { i =>
      pts.indices.count { j =>
        val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
        j != i && dx * dx + dy * dy <= r2
      }
    }
    val core = nbrs.map(_ >= 4)
    val cls = pts.indices.map { i =>
      if (core(i)) "core"
      else if (pts.indices.exists { j =>
        val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
        j != i && core(j) && dx * dx + dy * dy <= r2
      }) "border"
      else "noise"
    }
    val expected = cls.zip(nbrs).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, g) =>
        (c, g.size.toLong, g.map(_._2.toLong).sum * 1000L / g.size)
      }
    assert(expected.map(_._1).toSet == Set("core", "border", "noise"))
    val got = run("q347_dbscan_census", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q348 SPRT: arm 0 crosses the upper bound on day 1, arm 1 " +
    "drifts through the lower bound on day 2") {
    def ev(u: Long, t: String, day: Int, i: Long) =
      (i, u, t, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T12:00:00Z")
          .plus(java.time.Duration.ofDays(day))))
    var i = 0L
    def batch(u: Long, day: Int, n: Int, k: Int) = {
      val evs = (0 until n).map { j =>
        i += 1; ev(u, if (j < k) "purchase" else "view", day, i)
      }
      evs
    }
    // arm0 day0: k1/n10 -> llr 215988 (inside); day1 cum k11/n50 ->
    // 3639048 >= 2944439. arm1: 50 views/day; day2 cum -3157950 <=
    // -2944439 (day1 -2105300 still inside)
    val dir = plant("events" -> (batch(0, 0, 10, 1) ++ batch(0, 1, 40, 10) ++
      batch(1, 0, 50, 0) ++ batch(1, 1, 50, 0) ++ batch(1, 2, 50, 0))
      .toDF("event_id", "user_id", "event_type", "ts"))
    val got = run("q348_sprt_monitor", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 50L, 11L, 1L, "accept_h1"),
      (1L, 150L, 0L, 2L, "accept_h0")), got.mkString(", "))
  }

  test("q349 LTV triangle: hand-computed cohort cells with a gap month " +
    "and per-customer cumulative") {
    def o(ck: Long, day: String, price: Double) =
      (ck, ts(s"${day}T00:00:00Z"), price)
    val dir = plant("orders" -> Seq(
      o(1, "1995-01-10", 100.00), o(1, "1995-03-05", 50.00),
      o(2, "1995-01-20", 30.00),
      o(3, "1995-03-15", 20.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice"))
    val got = run("q349_ltv_triangle", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 13000L, 13000L, 6500L),
      (0L, 2L, 2L, 5000L, 18000L, 9000L),
      (2L, 0L, 1L, 2000L, 2000L, 2000L)), got.mkString(", "))
  }

  test("q350 two-way ANOVA: hand-computed balanced 2x2x2 design — " +
    "main effects, interaction, and F ratios on the ppm grid") {
    // prices in whole hundreds so the DOLLAR grid (y = cents div 100)
    // reproduces the same 100..700 values the SS table was computed on
    def li(a: String, b: String, price: Double) = (a, b, price)
    val dir = plant("lineitem" -> Seq(
      li("R", "O", 100.00), li("R", "O", 200.00),
      li("R", "F", 300.00), li("R", "F", 300.00),
      li("N", "O", 100.00), li("N", "O", 100.00),
      li("N", "F", 500.00), li("N", "F", 700.00))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice"))
    // corr 661250; ss_a 31250, ss_b 211250, ss_cells 303750,
    // ss_ab 61250, ss_tot 328750, ss_err 25000, mse 6250
    val got = run("q350_twoway_anova", dir).collect()
    val vals = got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(vals.toSeq == Seq(
      ("a_returnflag", 1L, 31250L, 5000000L),
      ("b_linestatus", 1L, 211250L, 33800000L),
      ("error", 4L, 25000L, -1L),
      ("interaction", 1L, 61250L, 9800000L)), vals.mkString(", "))
  }
}

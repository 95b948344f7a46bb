package graft.queries

/** Hand-computed / plain-Scala-model units for q355-q358. */
class Round13mSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q355 weighted percentiles: weights shift the cut points away " +
    "from the unweighted medians") {
    val dir = plant("lineitem" -> Seq(
      ("A", 1.00, 3.0), ("A", 2.00, 1.0), ("A", 10.00, 4.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity"))
    // census (100,w3) (200,w1) (1000,w4), W=8: wp25 -> 100 (cw 3 >= 2),
    // wp50 -> 200 (cw 4 >= 4), wp75 -> 1000 (cw 8 >= 6)
    val got = run("q355_weighted_median", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(("A", 8L, 100L, 200L, 1000L)),
      got.mkString(", "))
  }

  test("q356 decile migration: churned, retained-up, and new customers " +
    "land in the right transition cells") {
    def o(ck: Long, y: Int, price: Double) =
      (ck, ts(s"$y-05-01T00:00:00Z"), price)
    val dir = plant("orders" -> Seq(
      o(1, 1996, 300.00), o(2, 1996, 100.00),
      o(2, 1997, 500.00), o(3, 1997, 50.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice"))
    val got = run("q356_decile_migration", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 2L, 1L), (1L, 0L, 1L), (2L, 1L, 1L)),
      got.mkString(", "))
  }

  test("q357 spatial kNN: matches a plain-Scala bounded-kNN model over " +
    "400 scrambled points incl. zero-neighbor NULL rows") {
    val keys = (1L to 400L)
    val dir = plant("customer" -> keys.toDF("c_custkey"))
    def x(k: Long) =
      ((((k * 1103515245L + 12345L) % 2147483648L) * 1103515245L + 54321L) %
        2147483648L) % 100000L
    def y(k: Long) =
      ((((k * 69069L + 1L) % 2147483648L) * 69069L + 777L) %
        2147483648L) % 100000L
    val r2 = 4000L * 4000L
    val pts = keys.map(k => (k, x(k), y(k)))
    val expected = pts.map { case (id, px, py) =>
      val nb = pts.filter { case (j, qx, qy) =>
        j != id && (px - qx) * (px - qx) + (py - qy) * (py - qy) <= r2
      }.map { case (j, qx, qy) =>
        (j, (px - qx) * (px - qx) + (py - qy) * (py - qy))
      }.sortBy { case (j, d) => (d, j) }
      if (nb.isEmpty) (id, 0L, None, None, None)
      else {
        val top = nb.take(3)
        (id, nb.size.toLong, Some(nb.head._1), Some(nb.head._2),
          Some(top.map(_._2).sum * 1000L / top.size))
      }
    }
    val got = run("q357_spatial_knn", dir).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(expected.exists(_._3.isEmpty)) // the NULL path is exercised
    assert(got.toSeq == expected, s"got ${got.take(10).mkString(", ")}")
  }

  test("q358 design effect: the all-between-zero fixture pins ICC at " +
    "exactly -1 and DEFF below 1") {
    def ev(u: Long, v: Double, i: Long) =
      (i, u, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev(1, 1.00, 0), ev(1, 1.00, 1), ev(1, 4.00, 2),
      ev(2, 2.00, 3))
      .toDF("event_id", "user_id", "value", "ts"))
    // k2 nn4 ss800: tb 160000 = corr -> ssb 0, ssw 60000, msw 30000,
    // m0 2000 milli; icc = -1e6, deff = 999
    val got = run("q358_design_effect", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq((2L, 4L, 2000L, 0L, 30000L, -1000000L, 999L)),
      got.mkString(", "))
  }
}

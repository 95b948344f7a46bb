package graft.queries

/** Units for the round-14 fifth wave (q394/q395). */
class Round14eSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q394 isolation forest: matches a plain-Scala replay of the " +
    "hash-seeded walk on a planted cloud with one extreme outlier") {
    def o(id: Long, price: Double, date: String) =
      (id, id, "O", price, s"${date}T00:00:00", "1-URGENT")
    // 29 points clustered + 1 far outlier in both dims
    val rows = (1L to 29L).map(i =>
      o(i, 100.0 + i, f"1995-01-${(i % 28) + 1}%02d")) :+
      o(30L, 90000.0, "1998-12-01")
    val df = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val got = run("q394_isolation_forest", plant("orders" -> df))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // plain-Scala replay of the identical arithmetic
    val pts = rows.map { case (id, _, _, p, d, _) =>
      val day = java.time.LocalDate.parse(d.take(10)).toEpochDay -
        java.time.LocalDate.parse("1990-01-01").toEpochDay
      (id, math.floor(p * 100 + 0.5).toLong, day)
    }
    val (x0, x1) = (pts.map(_._2).min, pts.map(_._2).max)
    val (y0, y1) = (pts.map(_._3).min, pts.map(_._3).max)
    def h(t: Long, node: Long, salt: Long) =
      ((t * 1000003 + node * 48271 + salt) * 1103515245 + 12345) %
        2147483648L
    def walk(x: Long, y: Long, t: Long): Seq[Long] = {
      var node = 1L
      (1 to 8).map { _ =>
        val dim = h(t, node, 1) % 2
        val frac = h(t, node, 2) % 10001
        val thr = if (dim == 0) x0 + frac * (x1 - x0) / 10000
        else y0 + frac * (y1 - y0) / 10000
        val v = if (dim == 0) x else y
        node = node * 2 + (if (v > thr) 1 else 0)
        node
      }
    }
    val expected = pts.map { case (id, x, y) =>
      val pls = (1L to 8L).map { t =>
        val nodes = walk(x, y, t)
        val occ = pts.map(p => walk(p._2, p._3, t))
        nodes.zipWithIndex.collectFirst {
          case (n, i) if occ.count(_(i) == n) == 1 => (i + 1).toLong
        }.getOrElse(8L)
      }
      (id, pls.sum * 1000 / 8)
    }.sortBy(p => (p._2, p._1)).take(20)
    assert(got.toSeq == expected, s"got=${got.take(5).toSeq}")
    // the planted outlier must rank most isolable
    assert(got.head._1 == 30L)
  }

  test("q395 linear SHAP: a perfect plane recovers the slopes and the " +
    "hand-computed mean attributions") {
    // y = 1000 + 500*x1 + 300*x2 cents exactly; x1 in {1..4},
    // x2 in {0, 10} alternating -> non-collinear
    def li(x1: Long, x2: Long, flag: String) = {
      val y = (1000 + 500 * x1 + 300 * x2) / 100.0
      (1L, 1L, 1L, 1, x1.toDouble, y, x2 / 100.0, 0.0, flag, "O",
        "1996-01-01")
    }
    val rows = Seq(li(1, 0, "R"), li(2, 10, "R"), li(3, 0, "R"),
      li(4, 10, "R"))
    val df = rows.toDF("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val r = run("q395_linear_shap", plant("lineitem" -> df)).collect()(0)
    // b1 = 500 c/unit -> 500000 milli; b2 = 300 -> 300000 milli
    assert(r.getString(0) == "R" && r.getLong(1) == 4L)
    assert(r.getLong(2) == 500000L && r.getLong(3) == 300000L,
      r.toString)
    // mean|x1 - 2.5| = 1 -> phi1 = 500c; mean|x2 - 5| = 5 -> 1500c
    assert(r.getLong(4) == 500L && r.getLong(5) == 1500L, r.toString)
  }
}

package graft.queries

/** Hand-computed / plain-Scala-model units for q351-q354. */
class Round13lSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q351 ridge sweep: matches a BigInt model of the moments-once " +
    "sweep; larger lambda shrinks the slope") {
    // days 0..11; value = 100 + 7*day dollars (clean trend + val split)
    val days = (0 to 11)
    val dir = plant("orders" -> days.map(d =>
      (ts(f"1995-01-${d + 1}%02dT00:00:00Z"), (100.0 + 7 * d)))
      .toDF("o_orderdate", "o_totalprice"))
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    val pts = days.map(d => (BigInt(d), BigInt((10000 + 700 * d) / 100)))
    val tr = pts.filter(_._1 % 5 != 0)
    val va = pts.filter(_._1 % 5 == 0)
    val n = BigInt(tr.size)
    val sx = tr.map(_._1).sum; val sy = tr.map(_._2).sum
    val sxx = tr.map(p => p._1 * p._1).sum
    val sxy = tr.map(p => p._1 * p._2).sum
    val fits = Seq(0L, 100000000L, 1000000000L).map { lam =>
      val b = sdiv((n * sxy - sx * sy) * 1000,
        n * sxx - sx * sx + BigInt(lam) * n)
      val a = sdiv(sy * 1000 - b * sx, n)
      val mse = va.map { case (x, y) =>
        val e = y * 1000 - (a + b * x); e * e
      }.sum / (BigInt(va.size) * 1000000)
      (lam, b.toLong, a.toLong, mse.toLong)
    }
    val bestMse = fits.map(_._4).min
    val bestLam = fits.filter(_._4 == bestMse).map(_._1).min
    val expected = fits.map { case (l, b, a, m) =>
      (l, b, a, m, l == bestLam)
    }
    val got = run("q351_ridge_sweep", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
    assert(got(0)._2 > got(2)._2) // lambda shrinks the slope
  }

  test("q352 Hill tail: matches a plain-Scala model over 250 planted " +
    "orders with the gridded micro-nat logs") {
    val prices = (1 to 250).map(i => 100000.0 / i) // Pareto-ish tail
    val dir = plant("orders" -> prices.zipWithIndex
      .map { case (p, i) => (i.toLong + 1, p) }
      .toDF("o_orderkey", "o_totalprice"))
    val ranked = prices.zipWithIndex
      .map { case (p, i) => (math.floor(p * 100 + 0.5).toLong, i + 1L) }
      .sortBy { case (v, ok) => (-v, ok) }
    def lnu(v: Long) = math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong
    val expected = Seq(50L, 100L, 200L).map { k =>
      val sumLn = ranked.take(k.toInt).map(p => lnu(p._1)).sum
      val ref = ranked(k.toInt)._1
      val s = sumLn - k * lnu(ref)
      (k, ref, s, k * 1000000000L / s)
    }
    val got = run("q352_hill_tail", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q353 power calc: hand-checkable sizes off the compile-time C; " +
    "a zero-baseline type yields NULL sample size") {
    def ev(t: String, v: Double, i: Long) =
      (i, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> ((1 to 10).map(i =>
      ev("a", if (i <= 4) 200.0 else 10.0, i.toLong)) ++
      (1 to 3).map(i => ev("b", 10.0, 100L + i)))
      .toDF("event_id", "event_type", "value", "ts"))
    val C = math.floor(math.pow(1.959964 + 0.841621, 2) * 1e6 + 0.5).toLong
    def nArm(n: Long, k: Long, r: Long) =
      (BigInt(C) * 2 * (n - k) * 10000 / (k * r * r * 1000000)).toLong
    val got = run("q353_power_calc", dir).collect()
    val aRows = got.filter(_.getString(0) == "a")
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(aRows.toSeq == Seq(
      (1L, 400000L, nArm(10, 4, 1)),
      (2L, 400000L, nArm(10, 4, 2)),
      (5L, 400000L, nArm(10, 4, 5))), aRows.mkString(", "))
    assert(got.filter(_.getString(0) == "b").forall(_.isNullAt(5)))
  }

  test("q354 ABC classes: the boundary-crossing part completes its " +
    "class; hand-computed 75/10/9/5/1 split") {
    val dir = plant("lineitem" -> Seq(
      (1L, 75.00), (2L, 10.00), (3L, 9.00), (4L, 5.00), (5L, 1.00))
      .toDF("l_partkey", "l_extendedprice"))
    val got = run("q354_abc_classes", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("A", 2L, 8500L, 850000L),
      ("B", 2L, 1400L, 140000L),
      ("C", 1L, 100L, 10000L)), got.mkString(", "))
  }
}

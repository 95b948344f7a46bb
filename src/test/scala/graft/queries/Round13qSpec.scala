package graft.queries

/** Hand-computed / plain-Scala-model units for q371-q373. */
class Round13qSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def lcg2(x: Long): Long =
    (((x * 1103515245L + 12345L) % 2147483648L) * 1103515245L + 54321L) %
      2147483648L

  test("q371 permutation FDR: matches a plain-Scala model; five planted " +
    "signals clear the BH bar together, the null bins do not") {
    val custs = (1L to 125L).map { ck =>
      val nk = ck % 25
      val v = 1000L * (ck % 7) + (if (nk < 5) 500000L else 0L)
      (ck, nk.toInt, v / 100.0) // planted as dollars, re-gridded below
    }
    val dir = plant("customer" -> custs
      .toDF("c_custkey", "c_nationkey", "c_acctbal"))
    val rows = custs.map { case (ck, nk, bal) =>
      (ck, nk.toLong, math.floor(bal * 100 + 0.5).toLong)
    }
    val nn = rows.size.toLong
    val gg = rows.map(_._3).sum
    def stat(cells: Map[Long, (Long, Long)]): Map[Long, Long] =
      cells.map { case (nk, (n, s)) =>
        nk -> (BigInt((s * nn - gg * n).abs) * 1000 /
          (BigInt(n) * nn)).toLong
      }
    def census(bin: ((Long, Long, Long)) => Long) =
      rows.groupBy(bin).map { case (nk, g) =>
        nk -> (g.size.toLong, g.map(_._3).sum)
      }
    val obs = stat(census(_._2))
    val permGe = (1 to 99).flatMap { p =>
      stat(census { case (ck, _, _) => lcg2(ck + p * 1000003L) % 25 }).toSeq
    }
    val p100 = obs.map { case (nk, st) =>
      nk -> (1L + permGe.count { case (pnk, ps) => pnk == nk && ps >= st })
    }
    val ranked = obs.keys.toSeq.sortBy(nk => (p100(nk), nk)).zipWithIndex
      .map { case (nk, i) => (nk, i + 1L) }.toMap
    val kmax = ranked.collect { case (nk, r) if p100(nk) * 5 <= r => r }
      .foldLeft(0L)(math.max)
    val expected = obs.keys.toSeq.sorted.map { nk =>
      val cell = census(_._2)(nk)
      (nk, cell._1, obs(nk), p100(nk), ranked(nk), ranked(nk) <= kmax)
    }
    assert(expected.count(_._6) == 5, expected.filter(_._6).mkString(", "))
    val got = run("q371_permutation_fdr", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == expected, s"got ${got.take(8).mkString(", ")}")
  }

  test("q372 James-Stein: matches a BigInt model; the singleton group " +
    "shrinks hardest toward the grand mean") {
    val data = Seq((0, 100.00), (0, 200.00), (1, 100.00), (1, 100.00),
      (1, 100.00), (2, 900.00))
    val dir = plant("customer" -> data
      .toDF("c_nationkey", "c_acctbal"))
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    val cells = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (nk, g) =>
      val vs = g.map(x => math.floor(x._2 * 100 + 0.5).toLong)
      (nk.toLong, vs.size.toLong, BigInt(vs.sum),
        vs.map(v => BigInt(v) * v).sum)
    }
    val k = BigInt(cells.size)
    val nnn = cells.map(_._2).sum
    val ss = cells.map(_._3).sum
    val wnum = cells.map { case (_, n, s, q) => q - s * s / n }.sum
    val sigma2 = wnum / (BigInt(nnn) - k)
    val hmean = cells.map(c => BigInt(1000000000L) / c._2).sum / k
    val ms = cells.map { case (_, n, s, _) => sdiv(s * 1000, n) }
    val m2sum = ms.map(m => m * m).sum
    val msum = ms.sum
    val varm = (m2sum - msum * msum / k) / (k - 1)
    val grand = sdiv(ss * 1000, nnn)
    val tau2 = (varm - sigma2 * 1000000 * hmean / 1000000000L).max(0)
    val expected = cells.zip(ms).map { case ((nk, n, _, _), raw) =>
      val b = tau2 * 1000000 / (tau2 + sigma2 * 1000000 / n)
      val shrunk = grand + (if (raw < grand) -((grand - raw) * b / 1000000)
      else (raw - grand) * b / 1000000)
      (nk, n, raw.toLong, b.toLong, shrunk.toLong)
    }
    val got = run("q372_james_stein", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
    // the singleton outlier group must shrink the hardest (smallest B)
    assert(expected.minBy(_._4)._1 == 2L)
  }

  test("q373 Sn scale: hand-computed median-of-medians; the outlier " +
    "barely moves Sn while it owns the raw range") {
    val ys = Seq(10L, 20L, 40L, 80L, 1000L)
    val dir = plant("orders" -> ys.zipWithIndex.map { case (y, d) =>
      (ts(f"1995-01-0${d + 1}T00:00:00Z"), y.toDouble) }
      .toDF("o_orderdate", "o_totalprice"))
    // per-day medians of |diffs|: [50, 40, 35, 65, 970] -> med 50;
    // sn = floor(50*1.1926*1000+0.5) = 59630; med y 40, MAD base 30
    // -> mad = floor(30*1.4826*1000+0.5) = 44478
    val got = run("q373_sn_scale", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((5L, 59630L, 44478L)), got.mkString(", "))
  }
}

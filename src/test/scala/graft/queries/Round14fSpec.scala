package graft.queries

/** Units for q396 — the normal-approximation switch for the x99
  * permutation FDR. */
class Round14fSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q396: a planted strong-effect nation rejects on BOTH paths and " +
    "null nations agree; the z moments replay in plain Scala") {
    // 25 nations (the BH formula's m) x 8 customers; nation 0 shifted
    // far up, all null nations carry the IDENTICAL balance multiset
    val rows = (0L until 200L).map { i =>
      val nk = (i % 25).toInt
      val bal = if (nk == 0) 5000.0 + (i / 25) else 100.0 + (i / 25)
      (i, s"c$i", nk, bal, "seg")
    }
    val df = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val got = run("q396_perm_fdr_normal", plant("customer" -> df))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(got.length == 25)
    // gates hold everywhere on the plant
    assert(got.forall(_._5), s"decision_agree: ${got.mkString(", ")}")
    assert(got.forall(_._6), s"p_close: ${got.mkString(", ")}")
    // the shifted nation is extreme on both scales: both estimators
    // sit at the shared 1/100 floor (the approximation replays the
    // 1 + 99p estimator, not the raw tail probability)
    val n0 = got.find(_._1 == 0L).get
    assert(n0._3 == 1L && n0._4 == 1L, n0.toString)
    // replay the approx moments for nation 0 in plain Scala
    val v = rows.map(r => math.floor(r._4 * 100 + 0.5).toLong)
    val nn = v.size
    val gg = v.sum
    val qq = v.map(x => BigInt(x) * x).sum
    val s0 = rows.filter(_._3 == 0).map(r =>
      math.floor(r._4 * 100 + 0.5).toLong).sum
    val n0n = 8
    val z2num = BigInt(s0) * nn - BigInt(n0n) * gg
    val z2dnum = BigInt(n0n) * (nn - n0n) * (BigInt(nn) * qq - BigInt(gg) * gg)
    val z = z2num.abs.toDouble / math.sqrt(z2dnum.toDouble / (nn - 1))
    assert(z > 6, s"z=$z") // far beyond any two-sided alpha
  }
}

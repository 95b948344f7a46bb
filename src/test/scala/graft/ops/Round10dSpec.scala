package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 fourth-wave units: discrete-Laplace DP release, label
  * propagation, and the exact-integer ACF.
  */
class Round10dSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- dpCounts ------------------------------------------------------------

  test("dpThresholds: a valid inverse CDF (monotone, spans (0,1], symmetric mode at 0)") {
    val ts = StatsOps.dpThresholds
    assert(ts.size == 41)
    assert(ts.map(_._1).sliding(2).forall(p => p(0) < p(1)), "monotone")
    assert(ts.last._2 == 20 && ts.head._2 == -20)
    // P(0) is the widest bucket: its CDF gap exceeds both neighbors'
    val gaps = ts.map(_._1).zip(0.0 +: ts.map(_._1)).map { case (b, a) => b - a }
    val byK = ts.map(_._2).zip(gaps).toMap
    assert(byK(0) > byK(-1) && byK(0) > byK(1))
  }

  test("dpCounts: deterministic, integer, bounded noise that actually perturbs") {
    val df = (1 to 300).map(i => ("s" + i % 6, i)).toDF("src", "x")
    val a = StatsOps.dpCounts(df, "src", seed = 7L).collect()
    val b = StatsOps.dpCounts(df, "src", seed = 7L).collect()
    assert(a.toSeq == b.toSeq, "same seed must reproduce the release")
    val noises = a.map(_.getLong(1) - 50L)
    assert(noises.forall(n => n >= -20 && n <= 20), noises.mkString(", "))
    val c = StatsOps.dpCounts(df, "src", seed = 8L).collect()
      .map(_.getLong(1) - 50L)
    assert((noises ++ c).exists(_ != 0L),
      "across two seeds and six groups at least one draw must be nonzero")
  }

  // ---- labelPropagation ----------------------------------------------------

  test("labelPropagation: two triangles with a bridge settle into two communities") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L).toDF("a", "b")
    val got = GraphOps.labelPropagation(edges, rounds = 3, topK = 5).collect()
    // hand-traced: nodes {1,2,3} -> label 1, {4,5,6} -> label 3
    assert(got.toSeq == Seq(Row(1L, 3L), Row(3L, 3L)), got.mkString(", "))
  }

  // ---- acfDaily ------------------------------------------------------------

  test("acfDaily: exact ACF of an alternating series") {
    // cents 1000,2000,1000,2000 -> d = [-2000,2000,-2000,2000]
    // acf(1) = -0.75, acf(2) = 0.5, acf(3) = -0.25
    val orders = Seq(("2024-01-01", 10.0), ("2024-01-02", 20.0),
      ("2024-01-03", 10.0), ("2024-01-04", 20.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = StatsOps.acfDaily(orders, maxLag = 3).collect()
    assert(got.toSeq == Seq(
      Row(1, 3L, -0.75), Row(2, 2L, 0.5), Row(3, 1L, -0.25)),
      got.mkString(", "))
  }
}

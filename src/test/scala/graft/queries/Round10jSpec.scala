package graft.queries

import org.apache.spark.sql.Row

/** Hand-computed edge units for the round-10 tenth wave (q181-q183),
  * driven through the REAL registered queries on planted fixtures
  * (VERDICT r10 #4): NULL-honest short history in the lag matrix and
  * the m-estimate smoothing arithmetic.
  */
class Round10jSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def n4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  // ---- q181: lag-feature matrix -------------------------------------------

  test("q181: lags and the trailing mean stay NULL until history is " +
    "deep enough — no zero-imputed cold start") {
    // 9 days, revenue i dollars on day i (i = 1..9)
    val orders = (1 to 9).map { i =>
      (ts(f"1970-01-${1 + i}%02dT00:00:00Z"), i.toDouble)
    }.toDF("o_orderdate", "o_totalprice")
    val got = run("q181_lag_features", plant("orders" -> orders))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        Seq(2, 3, 4, 5).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
    def day(i: Int) = f"1970-01-${1 + i}%02d"
    val expected = (1 to 9).map { i =>
      val rev = i * 100L
      val lag1 = if (i >= 2) Some((i - 1) * 100L) else None
      val lag7 = if (i >= 8) Some((i - 7) * 100L) else None
      val lag28 = None // 9 days of history can never fill a 28-day lag
      // trailing mean needs EXACTLY 7 prior rows: first non-null on day 8
      val t7 = if (i >= 8) Some((((i - 7) to (i - 1)).sum * 100L) / 7L) else None
      (day(i), rev, Seq(lag1, lag7, lag28, t7))
    }
    assert(got.toSeq == expected, got.mkString(", "))
  }

  // ---- q182: smoothed target encoding ---------------------------------------

  test("q182: the m-estimate pulls a rare category toward the global " +
    "mean — exact integer numerators, hand-computed") {
    // cat A|0: y = 100.00, 200.00 (custkeys 0 and 7 both hit segment 0)
    // cat B|1: y = 50.00 (rare: n=1 -> smoothing dominates)
    val orders = Seq(
      ("A", 0L, 100.0), ("A", 7L, 200.0), ("B", 1L, 50.0)
    ).toDF("o_orderpriority", "o_custkey", "o_totalprice")
    val got = run("q182_target_encoding", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val gmean = (10000L + 20000L + 5000L) / 3L // 11666 (integer div)
    val m = 20L
    val encA = n4((30000L + m * gmean).toDouble / (2L + m).toDouble)
    val encB = n4((5000L + m * gmean).toDouble / (1L + m).toDouble)
    assert(got.toSeq == Seq(("A|0", 2L, encA), ("B|1", 1L, encB)),
      got.mkString(", "))
    // the rare category lands closer to the global mean than its raw mean
    assert(math.abs(encB - gmean) < math.abs(5000.0 - gmean))
  }

  // ---- q183: feature hashing ------------------------------------------------

  test("q183: occupancy and collision headlines are consistent with " +
    "the slot census") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"),
      (3L, "eta theta iota kappa")).toDF("doc_id", "text")
    val rows = run("q183_feature_hashing", plant("documents" -> docs))
      .collect()
    assert(rows.nonEmpty)
    val occupied = rows.head.getLong(3)
    val colliding = rows.head.getLong(4)
    // headline columns repeat identically on every row
    assert(rows.forall(r => r.getLong(3) == occupied && r.getLong(4) == colliding))
    assert(colliding <= occupied)
    // 10 distinct tokens into 1024 slots: occupancy bounded by both
    assert(occupied >= 1L && occupied <= 10L)
    // n_tok >= n_terms on every slot row (a term repeats or collides)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(2)))
  }
}

package graft.queries

/** Hand-computed edge units for the round-10 ninth wave (q178-q180),
  * driven through the REAL registered queries on planted fixtures
  * (VERDICT r10 #4): skyline dominance with duplicate points and
  * price/size ties, and TWAP with single-observation users and
  * zero-duration holds.
  */
class Round10iSpec extends PlantedQuerySpec {

  import spark.implicits._

  // ---- q178: 2-D skyline -----------------------------------------------------

  test("q178: duplicate points collapse; equal-price keeps only the max " +
    "size; equal-size at higher price is dominated (strict sweep)") {
    // distinct points after dedup: (900,1) (1000,5) (1000,3) (1200,5) (1500,8)
    //   (1000,3): same price as (1000,5), smaller -> dominated
    //   (1200,5): size TIES the cheaper (1000,5) -> dominated (strict >)
    //   (900,1), (1000,5), (1500,8): the frontier
    val part = Seq(
      (10.0, 5), (10.0, 5), (10.0, 3), (12.0, 5), (15.0, 8), (9.0, 1), (9.0, 1)
    ).toDF("p_retailprice", "p_size")
    val got = run("q178_skyline", plant("part" -> part))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((900L, 1L), (1000L, 5L), (1500L, 8L)),
      got.mkString(", "))
  }

  test("q178: a single point is its own skyline") {
    val part = Seq((10.0, 5)).toDF("p_retailprice", "p_size")
    val got = run("q178_skyline", plant("part" -> part))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1000L, 5L)), got.mkString(", "))
  }

  // ---- q179: time-weighted average -------------------------------------------

  test("q179: a single-observation user has no held interval and is " +
    "absent; same-timestamp events order by event_id with a zero-" +
    "duration hold") {
    val events = Seq(
      // user 1: one event -> no next -> excluded from the output
      (1L, ts("2024-01-01T00:00:00Z"), 1L, 5.0),
      // user 2: held 10 s at 1.00, then 30 s at 3.00 -> twap 2.50
      (2L, ts("2024-01-01T00:00:00Z"), 2L, 1.0),
      (3L, ts("2024-01-01T00:00:10Z"), 2L, 3.0),
      (4L, ts("2024-01-01T00:00:40Z"), 2L, 9.99),
      // user 3: two events at the SAME ts (order by event_id -> the
      // first is held 0 us), then 6 s at 4.00 -> twap 4.00
      (5L, ts("2024-01-01T01:00:00Z"), 3L, 2.0),
      (6L, ts("2024-01-01T01:00:00Z"), 3L, 4.0),
      (7L, ts("2024-01-01T01:00:06Z"), 3L, 7.77)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = run("q179_twap", plant("events" -> events))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // user 2: (10e6*100 + 30e6*300) / 40e6 = 250 cents = 2.50 dollars
    //   (the query works in cents, so twap_n4 is cents)
    val expected = Seq((2L, 2L, 250.0), (3L, 2L, 400.0))
    assert(got.toSeq == expected, got.mkString(", "))
  }
}

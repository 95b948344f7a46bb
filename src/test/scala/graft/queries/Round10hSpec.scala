package graft.queries

/** Hand-computed edge units for the round-10 eighth wave (q175-q177),
  * driven through the REAL registered queries on planted fixtures
  * (VERDICT r10 #4).
  */
class Round10hSpec extends PlantedQuerySpec {

  import spark.implicits._

  // ---- q176: first-k event-path census ----------------------------------------

  test("q176: short paths keep their natural length (concat_ws skips " +
    "the missing steps) and same-ts ties order by event_id") {
    val events = Seq(
      // user 1: four events, path truncates to the first 3
      (1L, ts("2024-01-01T00:00:00Z"), 1L, "A"),
      (2L, ts("2024-01-01T00:00:01Z"), 1L, "B"),
      (3L, ts("2024-01-01T00:00:02Z"), 1L, "C"),
      (4L, ts("2024-01-01T00:00:03Z"), 1L, "D"),
      // user 2 + user 4: two-step path "A>B" (no trailing separator)
      (5L, ts("2024-01-01T00:00:00Z"), 2L, "A"),
      (6L, ts("2024-01-01T00:00:01Z"), 2L, "B"),
      (10L, ts("2024-01-01T00:00:00Z"), 4L, "A"),
      (11L, ts("2024-01-01T00:00:01Z"), 4L, "B"),
      // user 3: first two events share a timestamp -> event_id breaks
      // the tie deterministically: X (id 7) before Y (id 8)
      (7L, ts("2024-01-01T00:00:00Z"), 3L, "X"),
      (8L, ts("2024-01-01T00:00:00Z"), 3L, "Y"),
      (9L, ts("2024-01-01T00:00:05Z"), 3L, "Z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = run("q176_path_census", plant("events" -> events))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = Seq(("A>B", 2L), ("A>B>C", 1L), ("X>Y>Z", 1L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  // ---- q175: dow-mean forecast backtest ----------------------------------------

  test("q175: runs end-to-end on a planted 3-week series and reports " +
    "a non-negative MAE pair") {
    // 21 days of orders: enough history that the dow model trains on
    // weeks 1-2 and scores week 3 (the exact split is the query's
    // contract with its oracle; here we pin shape + invariants)
    val orders = (0 until 21).map { i =>
      (ts(f"2024-01-${1 + i}%02dT00:00:00Z"), 100.0 + 10 * (i % 7))
    }.toDF("o_orderdate", "o_totalprice")
    val rows = run("q175_forecast_backtest", plant("orders" -> orders))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until r.length).foreach { i =>
        if (!r.isNullAt(i) && r.get(i).isInstanceOf[Long])
          assert(r.getLong(i) >= 0L, s"negative at $i: $r")
      }
    }
  }
}

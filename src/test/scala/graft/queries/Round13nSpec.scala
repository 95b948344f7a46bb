package graft.queries

/** Hand-computed units for q359-q362. */
class Round13nSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q359 modularity: hand-computed two-community graph — both " +
    "contributions negative for this anti-assortative partition") {
    val dir = plant(
      "lineitem" -> Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 3L)).toDF("l_orderkey", "l_suppkey"),
      "supplier" -> Seq((1L, 0), (2L, 0), (3L, 1))
        .toDF("s_suppkey", "s_nationkey"),
      "nation" -> Seq((0, "ALPHA"), (1, "BETA"))
        .toDF("n_nationkey", "n_name"))
    // edges (1,2) w2 intra-ALPHA, (1,3) w1 cross; m 3;
    // d(ALPHA) 5, d(BETA) 1: 2e9//3 - 25e9//36 = -27777778;
    // 0 - 1e9//36 = -27777777
    val got = run("q359_modularity", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("ALPHA", 2L, 5L, -27777778L),
      ("BETA", 0L, 1L, -27777777L)), got.mkString(", "))
  }

  test("q360 revenue recognition: integer thirds with the remainder on " +
    "month one; the deferred balance closes to zero") {
    val dir = plant("orders" -> Seq(
      (ts("1995-01-15T00:00:00Z"), 100.00),
      (ts("1995-02-10T00:00:00Z"), 50.00))
      .toDF("o_orderdate", "o_totalprice"))
    val got = run("q360_rev_recognition", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 10000L, 3334L, 6666L), (1L, 5000L, 5001L, 6665L),
      (2L, 0L, 4999L, 1666L), (3L, 0L, 1666L, 0L)), got.mkString(", "))
  }

  test("q361 rich club: ring-plus-chords graph — the top-25% cut is " +
    "denser than the graph, the top-10% pair is complete, and an " +
    "empty cut emits no row") {
    val ring = (1L to 20L).map(i => (i, if (i == 20L) 1L else i + 1))
    val extra = Seq((1L, 3L), (1L, 5L), (1L, 7L), (2L, 4L))
    val edges = ring ++ extra
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1, a), (i.toLong + 1, b))
    }
    val dir = plant("lineitem" -> li.toDF("l_orderkey", "l_suppkey"))
    val got = run("q361_rich_club", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 2L, 3L, 1L, 1000000L),
      (25L, 5L, 3L, 7L, 700000L)), got.mkString(", "))
  }

  test("q362 heartbeat gaps: within-day gaps only; the single-event-" +
    "per-day type emits no row") {
    def ev(t: String, iso: String, i: Long) = (i, t, ts(iso))
    val dir = plant("events" -> Seq(
      ev("a", "2024-01-01T00:00:00Z", 0),
      ev("a", "2024-01-01T00:00:30Z", 1),
      ev("a", "2024-01-01T00:02:00Z", 2),
      ev("b", "2024-01-01T10:00:00Z", 3),
      ev("b", "2024-01-02T10:00:00Z", 4))
      .toDF("event_id", "event_type", "ts"))
    val got = run("q362_heartbeat_gaps", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(("a", 2L, 90000L, 60000L, 1L)),
      got.mkString(", "))
  }
}

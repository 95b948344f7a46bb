package graft.queries

/** Hand-computed units for q297-q300. q298/q299 replay the portable
  * hash draws in plain Scala (the q128/q217 replayed-randomness
  * pattern); q297/q300 are worked out fully by hand in the comments.
  */
class Round12oSpec extends PlantedQuerySpec {

  import spark.implicits._

  private val P = 2147483647L
  private def h2(id: Long, seed: Long): Long =
    (((id % P + seed) * 48271L) % P + 1L) * 69621L % P

  test("q297 attribution: segment split after purchase, removal drops " +
    "a channel's whole mass, non-contributing channels get NULL share") {
    // u1 click->purchase; u2 view (dead end); u3 purchase, click
    // (second segment: START->click->NULL).
    // census: START->{click 2/4, view 1/4, CONV 1/4};
    // click->{CONV 1/2, NULL 1/2}; view->NULL.
    // base a(START) = 250000 + 500000*500000/1e6 = 500000;
    // remove click -> 250000 (effect 250000, the only positive ->
    // share 1e6); remove view/error/signup -> no change.
    val dir = plant("events" -> Seq(
      (0L, ts("2024-01-01T00:00:00Z"), 1L, "click"),
      (1L, ts("2024-01-01T01:00:00Z"), 1L, "purchase"),
      (2L, ts("2024-01-01T00:00:00Z"), 2L, "view"),
      (3L, ts("2024-01-01T00:00:00Z"), 3L, "purchase"),
      (4L, ts("2024-01-01T01:00:00Z"), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type"))
    val got = run("q297_markov_attribution", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      ("click", 500000L, 250000L, 250000L, Some(1000000L)),
      ("error", 500000L, 500000L, 0L, None),
      ("signup", 500000L, 500000L, 0L, None),
      ("view", 500000L, 500000L, 0L, None)), got.mkString(", "))
  }

  test("q298 SRM: arm counts, floor expectations, gridded chi-square " +
    "terms match a hash replay") {
    val ids = (0L until 200L).toSeq
    val dir = plant("orders" -> ids.toDF("o_orderkey"))
    val (t1, t2) = (math.floor(0.5 * P).toLong, math.floor(0.8 * P).toLong)
    def arm(id: Long): String = {
      val h = h2(id, 20240401L)
      if (h < t1) "control" else if (h < t2) "treat_a" else "treat_b"
    }
    val counts = ids.groupBy(arm).view.mapValues(_.size.toLong).toMap
    val num = Map("control" -> 5L, "treat_a" -> 3L, "treat_b" -> 2L)
    val n = 200L
    val rows = Seq("control", "treat_a", "treat_b").map { a =>
      val o = counts.getOrElse(a, 0L)
      val term = math.floor(
        ((o * 10 - n * num(a)).toDouble * (o * 10 - n * num(a))) /
          (n * num(a) * 10).toDouble * 1000000 + 0.5).toLong
      (a, o, n * num(a) / 10, term)
    }
    val chi2 = rows.map(_._4).sum
    val got = run("q298_srm_check", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == rows.map { case (a, o, e, t) =>
      (a, o, e, t, chi2, chi2 > 5991465L)
    }, s"replay $rows chi2=$chi2, got ${got.mkString(", ")}")
  }

  test("q299 LDP: mechanism replay — truthful above the 3/4 " +
    "threshold, uniform redraw below, debias recovers counts") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val evs = (0L until 50L).map(i => (i, types((i % 5).toInt)))
    // Tables.read("events") normalizes `ts`, so the fixture carries one
    val dir = plant("events" -> evs
      .map { case (i, t) => (i, t, ts("2024-01-01T00:00:00Z")) }
      .toDF("event_id", "event_type", "ts"))
    val keepT = math.floor(0.75 * P).toLong
    def reported(id: Long, t: String): String =
      if (h2(id, 7101L) < keepT) t
      else types((h2(id, 7102L) % 5).toInt)
    val truth = evs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val obs = evs.map { case (i, t) => reported(i, t) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = types.map { t =>
      val o = obs.getOrElse(t, 0L)
      val raw = o * 20 - 50
      val est = (if (raw < 0) -1L else 1L) * (math.abs(raw) / 15)
      (t, truth(t), o, est,
        math.abs(est - truth(t)) * 1000000L / truth(t))
    }
    val got = run("q299_ldp_freq", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expect, s"replay $expect, got ${got.mkString(", ")}")
  }

  test("q300 interval overlap: half-open windows — touching orders " +
    "are disjoint, overlap days exact, pair-free segments absent") {
    // c1 BUILDING: 01-01/01-15/01-31 -> pairs (1,2)=16d, (2,3)=14d,
    // (1,3) touching -> none. c2 MACHINERY: disjoint years -> no row.
    val dir = plant(
      "orders" -> Seq(
        (1L, 1L, ts("1996-01-01T00:00:00Z")),
        (2L, 1L, ts("1996-01-15T00:00:00Z")),
        (3L, 1L, ts("1996-01-31T00:00:00Z")),
        (4L, 2L, ts("1996-01-01T00:00:00Z")),
        (5L, 2L, ts("1997-01-01T00:00:00Z")))
        .toDF("o_orderkey", "o_custkey", "o_orderdate"),
      "customer" -> Seq((1L, "BUILDING"), (2L, "MACHINERY"))
        .toDF("c_custkey", "c_mktsegment"))
    val got = run("q300_interval_overlap", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("BUILDING", 2L, 30L)), got.mkString(", "))
  }
}

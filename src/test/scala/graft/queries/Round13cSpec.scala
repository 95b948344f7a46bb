package graft.queries

/** Hand-computed units for q316-q319. */
class Round13cSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q316 zone maps: per-group min/max exclude exactly the " +
    "hand-placed groups for every predicate") {
    // max key 63 -> bucket size 1 -> one group per key.
    // g0: day 152 qty 10; g1: day 1277 qty 46; g63: day 517 qty 1
    val dir = plant("lineitem" -> Seq(
      (0L, ts("1992-06-01T00:00:00Z"), 10.0),
      (1L, ts("1995-07-01T00:00:00Z"), 46.0),
      (63L, ts("1993-06-01T00:00:00Z"), 1.0))
      .toDF("l_orderkey", "l_shipdate", "l_quantity"))
    val got = run("q316_zone_map_audit", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("qty_exactly_1", 3L, 2L, 666666L),   // g0, g1 exclude qty 1
      ("qty_over_45", 3L, 2L, 666666L),     // g0, g63 max <= 45
      ("ship_after_1995h2", 3L, 2L, 666666L), // g0, g63 end before
      ("ship_in_1993", 3L, 2L, 666666L)),   // g0 before, g1 after
      got.mkString(", "))
  }

  test("q317 IVM merge: base-only, delta-only and straddling keys all " +
    "reproduce the full recompute") {
    val dir = plant("orders" -> Seq(
      (0L, ts("1996-01-01T00:00:00Z"), 10.00),  // base side
      (0L, ts("1997-05-01T00:00:00Z"), 5.00),   // delta side
      (50L, ts("1997-02-01T00:00:00Z"), 2.50),  // delta-only key
      (100L, ts("1995-03-01T00:00:00Z"), 100.00), // base-only key
      (7L, ts("1996-01-01T00:00:00Z"), 1.00))   // filtered out (% 50)
      .toDF("o_custkey", "o_orderdate", "o_totalprice"))
    val got = run("q317_ivm_merge", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 1500L, 2L), (50L, 250L, 1L), (100L, 10000L, 1L)),
      got.mkString(", "))
  }

  test("q318 encoding audit: mojibake, replacement, control and " +
    "legit-unicode docs flag independently") {
    val dir = plant("documents" -> Seq(
      (0L, "s1", "plain ascii text"),
      (1L, "s1", "cafÃ© menu"),        // mojibake + non-ascii
      (2L, "s1", "bad � byte"),             // replacement + non-ascii
      (3L, "s1", "tab\there"),                   // control, pure ascii
      (4L, "s2", "日本語 corpus"))   // legit unicode only
      .toDF("doc_id", "source", "text"))
    val got = run("q318_encoding_audit", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // (source, n, non_ascii, replacement, mojibake, control) in ppm
    assert(got.toSeq == Seq(
      ("s1", 4L, 500000L, 250000L, 250000L, 250000L),
      ("s2", 1L, 1000000L, 0L, 0L, 0L)), got.mkString(", "))
  }

  test("q319 fixed width: the 64-byte card round-trips every field " +
    "exactly") {
    val dir = plant("orders" -> Seq(
      (42L, 7L, 123.45, "1-URGENT", "F", ts("1997-03-15T00:00:00Z")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderstatus", "o_orderdate"))
    val r = run("q319_fixed_width", dir).collect()(0)
    assert(r.getString(0) == "1-URGENT" && r.getString(1) == "F")
    assert(r.getLong(2) == 1L && r.getLong(3) == 12345L)
    assert(r.getDate(4).toString == "1997-03-15" &&
      r.getDate(5).toString == "1997-03-15")
    // 12 + 12 + 15 + 15 + 2 + 8 = 64 fixed columns
    assert(r.getLong(6) == 64L && r.getLong(7) == 64L, r.toString)
  }
}

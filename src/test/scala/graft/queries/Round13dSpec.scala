package graft.queries

/** Hand-computed units for q320-q322. */
class Round13dSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q320 LOO encoding: own label leaves the cell mean; the " +
    "positive-free category pulls toward the smoothed global rate") {
    // cat A: t = {1,1,1,0} (s=3, n=4); cat B: t = {0,0}; G1=3, GN=6.
    // enc(A,1) = ((3-1)*6 + 10*3)*1e6 // ((4-1+10)*6) = 42e6//78
    // enc(A,0) = 48e6//78; enc(B,0) = 30e6//66
    val dir = plant("orders" -> Seq(
      ("A", "F"), ("A", "F"), ("A", "F"), ("A", "O"),
      ("B", "O"), ("B", "P"))
      .toDF("o_orderpriority", "o_orderstatus"))
    val got = run("q320_loo_target_encoding", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("A", 0L, 1L, 615384L),
      ("A", 1L, 3L, 538461L),
      ("B", 0L, 2L, 454545L)), got.mkString(", "))
  }

  test("q321 deletion audit: the delete set reaches lineitem through " +
    "TWO hops (user -> order -> line)") {
    val dir = plant(
      "events" -> Seq(
        (0L, 0L, ts("2024-01-01T00:00:00Z")),
        (1L, 0L, ts("2024-01-02T00:00:00Z")),
        (2L, 5L, ts("2024-01-01T00:00:00Z")))
        .toDF("event_id", "user_id", "ts"),
      "orders" -> Seq((100L, 0L), (101L, 5L))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> Seq((100L, 1), (100L, 2), (101L, 1))
        .toDF("l_orderkey", "l_linenumber"))
    val got = run("q321_deletion_audit", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("events", 3L, 2L, 666666L),
      ("lineitem", 3L, 2L, 666666L),
      ("orders", 2L, 1L, 500000L)), got.mkString(", "))
  }

  test("q322 DAU/WAU/MAU: trailing windows, a day leaving the 7-day " +
    "window, and stickiness as DAU over MAU") {
    def ev(id: Long, u: Long, day: Int) =
      (id, u, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T12:00:00Z")
          .plus(java.time.Duration.ofDays(day))))
    val dir = plant("events" -> Seq(
      ev(0, 1, 0), ev(1, 2, 0), ev(2, 1, 1), ev(3, 3, 8))
      .toDF("event_id", "user_id", "ts"))
    val got = run("q322_dau_mau", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // day 8's WAU window [2, 8] no longer sees days 0-1; its MAU
    // window [-21, 8] still sees everyone
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 2L, 1000000L),
      (1L, 1L, 2L, 2L, 500000L),
      (8L, 1L, 1L, 3L, 333333L)), got.mkString(", "))
  }
}

package graft.queries

/** Hand-computed units for q374-q376. */
class Round13rSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q374 MI matrix: the determined pairs score exactly ln 2 in " +
    "micro-nats, the independent pairs exactly zero") {
    def li(f: String, s: String, y: Int, q: Double) =
      (f, s, ts(s"$y-06-01T00:00:00Z"), q)
    val dir = plant("lineitem" -> Seq(
      li("R", "O", 1995, 5.0), li("R", "O", 1996, 5.0),
      li("N", "F", 1995, 15.0), li("N", "F", 1996, 15.0))
      .toDF("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"))
    val got = run("q374_mi_matrix", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("f", "qb", 693147L), ("f", "s", 693147L), ("f", "y", 0L),
      ("s", "qb", 693147L), ("s", "y", 0L), ("y", "qb", 0L)),
      got.mkString(", "))
  }

  test("q375 char entropy: uniform-2 scores 1 bit/char, uniform-4 " +
    "scores 2 — and the compression bound follows") {
    val dir = plant("documents" -> Seq(
      ("s1", "aabb"), ("s2", "abcd"))
      .toDF("source", "text"))
    val got = run("q375_char_entropy", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("s1", 4L, 2L, 1000000L, 125000L),
      ("s2", 4L, 4L, 2000000L, 250000L)), got.mkString(", "))
  }

  test("q376 hierarchy rollup: arithmetic ancestors roll to every " +
    "level with the grand total invariant") {
    val dir = plant("lineitem" -> Seq(
      (123L, 10.00), (129L, 20.00), (7L, 40.00))
      .toDF("l_partkey", "l_extendedprice"))
    val got = run("q376_hierarchy_rollup", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 7L, 1L, 4000L, 571428L, 7000L),
      (1L, 0L, 1L, 4000L, 571428L, 7000L),
      (2L, 0L, 1L, 4000L, 571428L, 7000L),
      (3L, 0L, 3L, 7000L, 1000000L, 7000L),
      (4L, 0L, 3L, 7000L, 1000000L, 7000L),
      (5L, 0L, 3L, 7000L, 1000000L, 7000L)), got.mkString(", "))
  }
}

package graft.queries

/** Hand-computed / plain-Scala-model units for q323-q326. */
class Round13eSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q323 grid close pairs: the banded census matches a plain-Scala " +
    "all-pairs brute force over 400 scrambled points") {
    val keys = (1L to 400L)
    val dir = plant("customer" -> keys.toDF("c_custkey"))
    def x(k: Long) =
      ((((k * 1103515245L + 12345L) % 2147483648L) * 1103515245L + 54321L) %
        2147483648L) % 100000L
    def y(k: Long) =
      ((((k * 69069L + 1L) % 2147483648L) * 69069L + 777L) %
        2147483648L) % 100000L
    val r2 = 4000L * 4000L
    val pts = keys.map(k => (x(k), y(k)))
    val d2s = for {
      i <- pts.indices; j <- (i + 1) until pts.size
      dx = pts(i)._1 - pts(j)._1; dy = pts(i)._2 - pts(j)._2
      d2 = dx * dx + dy * dy if d2 <= r2
    } yield d2
    assert(d2s.nonEmpty) // the fixture must actually exercise the join
    val expected = d2s.groupBy(d2 => d2 * 4 / (r2 + 1)).toSeq.sortBy(_._1)
      .map { case (b, ds) => (b, ds.size.toLong, ds.min, ds.max) }
    val got = run("q323_grid_close_pairs", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q324 CMS audit: estimates match a plain-Scala sketch and never " +
    "undercount; top-20 is cnt-desc key-asc") {
    val rows = (1L to 30L).flatMap(k => Seq.fill(k.toInt)(k))
    val dir = plant("lineitem" -> rows.toDF("l_partkey"))
    val params = Seq((0L, 1549L, 13007L), (1L, 3319L, 27091L),
      (2L, 7907L, 40503L), (3L, 15073L, 55001L))
    def cell(a: Long, b: Long, k: Long) = ((a * k + b) % 2147483647L) % 256L
    val cnt = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sketch = (for {
      (i, a, b) <- params; (k, c) <- cnt
    } yield ((i, cell(a, b, k)), c))
      .groupBy(_._1).map { case (ic, v) => ic -> v.map(_._2).sum }
    val expected = cnt.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
      .map { case (k, c) =>
        val est = params.map { case (i, a, b) => sketch((i, cell(a, b, k))) }.min
        (k, c, est, est - c)
      }
    val got = run("q324_cms_audit", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
    assert(got.forall(_._4 >= 0)) // the CMS one-sided-error invariant
  }

  test("q325 storage advisor: hand-computed runs/widths per 16-day " +
    "rowgroup; the plain/delta tie resolves to plain") {
    // bucket 0 (1995-01-02): ok1 ln1-4, ok2 ln1-4, ok3 ln1 — 9 rows,
    // every price distinct with gaps > 2^32 micros (w_pm = 8);
    // bucket 1 (1995-01-21): ok4-6, 3 distinct wide prices.
    def li(ok: Long, ln: Int, price: Double, day: String) =
      (ok, ln, price, ts(s"${day}T00:00:00Z"))
    val b0 = Seq(
      li(1, 1, 10.00, "1995-01-02"), li(1, 2, 4310.00, "1995-01-02"),
      li(1, 3, 8610.00, "1995-01-02"), li(1, 4, 12910.00, "1995-01-02"),
      li(2, 1, 17210.00, "1995-01-02"), li(2, 2, 21510.00, "1995-01-02"),
      li(2, 3, 25810.00, "1995-01-02"), li(2, 4, 30110.00, "1995-01-02"),
      li(3, 1, 34410.00, "1995-01-02"))
    val b1 = Seq(
      li(4, 1, 1.00, "1995-01-21"), li(5, 1, 10000.00, "1995-01-21"),
      li(6, 1, 20000.00, "1995-01-21"))
    val dir = plant("lineitem" -> (b0 ++ b1)
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"))
    // order_key:   runs 3+3, d=1 -> w1: delta (8+8)+(8+2)=26; rle 72
    // price_micros: runs 9+3, w8 both: delta (8+64)+(8+16)=96 = plain -> tie
    // ship_month:  runs 1+1, d=0: delta 16+10=26; rle 24 wins
    val got = run("q325_storage_advisor", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(got.toSeq == Seq(
      ("order_key", 12L, 6L, 96L, 72L, 26L, "delta"),
      ("price_micros", 12L, 12L, 96L, 144L, 96L, "plain"),
      ("ship_month", 12L, 2L, 96L, 24L, 26L, "rle")), got.mkString(", "))
  }

  test("q326 Shapley attribution: hand-computed lattice over three " +
    "converting masks; untouched channels get exactly zero; the " +
    "below-threshold touch does not count") {
    def ev(u: Long, t: String, v: Double, i: Long) =
      (i, u, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev(1, "click", 200, 0), ev(1, "purchase", 10, 1),
      ev(2, "click", 200, 2), ev(2, "view", 200, 3), ev(2, "purchase", 5, 4),
      ev(3, "purchase", 9, 5),
      ev(4, "view", 200, 6),
      ev(5, "signup", 100, 7), ev(5, "purchase", 1, 8))
      .toDF("event_id", "user_id", "event_type", "value", "ts"))
    // census: mask0 -> 2 (u3, u5: signup v100 < 150 gate), mask1 -> 1,
    // mask9 -> 1. phi_num(click) = 36, phi_num(view) = 12,
    // error/signup = 0; Σphi/24 = 2 = v(15) - v(0). share denom 48.
    val got = run("q326_shapley_attribution", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("click", 36L, 1500000L, 750000L),
      ("error", 0L, 0L, 0L),
      ("signup", 0L, 0L, 0L),
      ("view", 12L, 500000L, 250000L)), got.mkString(", "))
  }
}

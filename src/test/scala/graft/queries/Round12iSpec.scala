package graft.queries

/** Hand-computed units for the round-12 statistical-testing wave
  * (q271-q274): tiny planted order fixtures whose sums of squares,
  * medians, pair-dominance counts and effect sizes were worked out by
  * hand, driven through the REAL registered queries.
  */
class Round12iSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def orders(rows: (String, Double)*) =
    rows.zipWithIndex.map { case ((p, v), i) => (i.toLong, p, v) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")

  test("q271 ANOVA: hand-computed SSB/SSW, eta2, F") {
    // A: {1,3} (s=4, ss=10), B: {5,7} (s=12, ss=74)
    // terms 8+72=80; S2/N=64 -> SSB=16, SSW=84-80=4
    // F = (16/1)/(4/2) = 8; eta2 = 16e6 div 20 = 800000
    val dir = plant("orders" -> orders(
      ("1-URGENT", 1), ("1-URGENT", 3), ("5-LOW", 5), ("5-LOW", 7)))
    val got = run("q271_anova_f", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((2L, 4L, 16L, 4L, 800000L, 8.0)),
      got.mkString(", "))
  }

  test("q272 Brown-Forsythe: median-centered deviations on the " +
    "doubled grid") {
    // A: {1,3,100} med 3 -> z2 = {4,0,194} (s=198, ss=37652);
    // B: {5,5,5} med 5 -> z2 all 0. SSB=6534, SSW=24584,
    // eta2 = 209974, F = 6534/(24584/4) = 1.0631 (n4)
    val dir = plant("orders" -> orders(
      ("1-URGENT", 1), ("1-URGENT", 3), ("1-URGENT", 100),
      ("5-LOW", 5), ("5-LOW", 5), ("5-LOW", 5)))
    val got = run("q272_brown_forsythe", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((2L, 6L, 6534L, 24584L, 209974L, 1.0631)),
      got.mkString(", "))
  }

  test("q273 Cliff's delta: dominance census, ties, off-priority drop") {
    // A {10,20,20} vs B {15,20,25}: gt=2, tied=2, lt=5 of 9 pairs
    // -> delta = -3/9 -> n4 -0.3333; the MEDIUM row must not count
    val dir = plant("orders" -> orders(
      ("1-URGENT", 10), ("2-HIGH", 20), ("1-URGENT", 20),
      ("5-LOW", 15), ("5-LOW", 20), ("5-LOW", 25),
      ("3-MEDIUM", 999)))
    val got = run("q273_cliffs_delta", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((3L, 3L, 2L, 5L, 2L, -0.3333)),
      got.mkString(", "))
  }

  test("q274 Cohen's d / Hedges' g: pooled-SD standardized difference") {
    // A {10,20,20}, B {15,20,25}: d = (50/3 - 20)/sqrt((200/3+50)/4)
    // -> n4 -0.6172; g = d*(1 - 3/15) -> n4 -0.4938
    val dir = plant("orders" -> orders(
      ("1-URGENT", 10), ("2-HIGH", 20), ("1-URGENT", 20),
      ("5-LOW", 15), ("5-LOW", 20), ("5-LOW", 25)))
    val got = run("q274_cohens_d", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq((3L, 3L, 50L, 60L, 900L, 1250L,
      -0.6172, -0.4938)), got.mkString(", "))
  }
}

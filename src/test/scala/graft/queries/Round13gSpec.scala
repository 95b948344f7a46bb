package graft.queries

/** Hand-computed / plain-Scala-model units for q331-q334. */
class Round13gSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q331 Welch t-test: hand-computed moments for a 3-vs-4 sample; " +
    "negative mean diff rides the sign-safe grid; df via BigInt") {
    def ev(t: String, v: Double, i: Long) =
      (i, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev("a", 1.00, 0), ev("a", 2.00, 1), ev("a", 3.00, 2),
      ev("b", 1.00, 3), ev("b", 1.00, 4), ev("b", 4.00, 5), ev("b", 4.00, 6))
      .toDF("event_id", "event_type", "value", "ts"))
    // a: n3 S600 Q140000 -> va = 60000e12 // 18 = 3333333333333333
    // b: n4 S1000 Q340000 -> vb = 360000e12 // 48 = 7500000000000000
    // mdnum = -600 -> md_ppm = -(600e6 // 12) = -50000000
    // t2 = 2.5e24 // 10833333333333333 = 230769230
    val va6 = BigInt(3333333333333333L) / 1000000
    val vb6 = BigInt(7500000000000000L) / 1000000
    val df = (va6 + vb6) * (va6 + vb6) * 1000 * 2 * 3 /
      (va6 * va6 * 3 + vb6 * vb6 * 2)
    val got = run("q331_welch_ttest", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("a", "b", 3L, 4L, -50000000L, 230769230L, df.toLong)),
      got.mkString(", "))
  }

  test("q332 fairness audit: hand-computed confusion cells per segment; " +
    "the all-positive segment's NULL FPR contributes no eo gap") {
    val dir = plant(
      "customer" -> Seq((0L, 6000.0), (4L, 1000.0), (8L, 7000.0),
        (1L, 6000.0), (5L, 1000.0))
        .toDF("c_custkey", "c_acctbal"),
      "orders" -> (Seq.fill(4)((0L, "F")) ++ Seq.fill(5)((1L, "F")) ++
        Seq.fill(4)((5L, "F")) ++ Seq((8L, "F"), (4L, "O")))
        .toDF("o_custkey", "o_orderstatus"))
    // seg0 (ck 0,4,8): n3 lab1 pred2 tp1 fp1 -> base 333333, pos 666666,
    //   tpr 1e6, fpr 500000, gaps 0 (reference)
    // seg1 (ck 1,5): n2 lab2 pred1 tp1 fp NULL-denominator -> base 1e6,
    //   pos 500000, tpr 500000, fpr NULL; dp |500000-666666| = 166666,
    //   eo = max(|500000-1000000|, coalesced 0) = 500000
    val got = run("q332_fairness_audit", dir).collect()
    val seg0 = got(0)
    assert((seg0.getLong(0), seg0.getLong(1), seg0.getLong(2),
      seg0.getLong(3), seg0.getLong(4), seg0.getLong(5), seg0.getLong(6),
      seg0.getLong(7)) ==
      ((0L, 3L, 333333L, 666666L, 1000000L, 500000L, 0L, 0L)),
      seg0.toString)
    val seg1 = got(1)
    assert(seg1.isNullAt(5), seg1.toString) // fpr: no negatives
    assert((seg1.getLong(0), seg1.getLong(1), seg1.getLong(2),
      seg1.getLong(3), seg1.getLong(4), seg1.getLong(6),
      seg1.getLong(7)) ==
      ((1L, 2L, 1000000L, 500000L, 500000L, 166666L, 500000L)),
      seg1.toString)
  }

  test("q333 consistent hashing: matches a plain-Scala successor-probe " +
    "model, and NO key moves between surviving nodes") {
    val ids = (1L to 200L)
    val dir = plant("events" -> ids.map(i =>
      (i, ts("2024-01-01T00:00:00Z"))).toDF("event_id", "ts"))
    def lcg2(id: Long): Long =
      (((id * 1103515245L + 12345L) % 2147483648L) * 1103515245L +
        54321L) % 2147483648L
    def ring(nodes: Int): Seq[(Long, Long)] =
      (0L until nodes * 8L).map(id => (lcg2(id), id / 8))
        .groupBy(_._1).map { case (vh, g) => (vh, g.map(_._2).min) }
        .toSeq.sortBy(_._1)
    def assign(r: Seq[(Long, Long)], kh: Long): Long =
      r.find(_._1 > kh).getOrElse(r.head)._2
    val rb = ring(4); val ra = ring(5)
    val asg = ids.map(lcg2).map(kh => (assign(rb, kh), assign(ra, kh)))
    val expected = (0L to 4L).map { node =>
      val nb = asg.count(_._1 == node).toLong
      val na = asg.count(_._2 == node).toLong
      val moved = asg.count(p => p._2 == node && p._1 != node).toLong
      (node, nb, na, na * 1000000L / 200L, moved)
    }
    val got = run("q333_consistent_hashing", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
    assert(got.filter(_._1 < 4).forall(_._5 == 0L)) // the CH contract
    assert(got.find(_._1 == 4L).exists(_._5 > 0L)) // node 4 stole keys
  }

  test("q334 tokenizer fertility: hand-counted chars/bytes/tokens, " +
    "multi-byte UTF-8 shows up in bytes_per_char only") {
    val dir = plant("documents" -> Seq(
      ("en", "hello world"), ("en", "a b c"), ("zz", "héllo"))
      .toDF("lang", "text"))
    val got = run("q334_tokenizer_fertility", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("en", 2L, 5L, 312500L, 1000L, 3200L),
      ("zz", 1L, 1L, 200000L, 1200L, 5000L)), got.mkString(", "))
  }
}

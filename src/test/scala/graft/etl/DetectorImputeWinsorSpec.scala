package graft.etl

import org.apache.spark.sql.functions._

/** T1 decision thresholds, M2 exact median, M3 mode tie-break (P5),
  * M1 strict-> drop edge, M5 sigma=0 guard (P9).
  */
class DetectorImputeWinsorSpec extends EtlSpecBase {
  import spark.implicits._

  test("T1 decide(): 5-way rule order and thresholds") {
    import TypeDetector.{ColProfile, decide}
    // empty column -> unknown
    assert(decide(ColProfile(0, 0, 0, 0, 0, 0)) == ColType.Unknown)
    // > 0.7 date ratio wins even if numeric also passes
    assert(decide(ColProfile(10, 8, 10, 10, 8, 8)) == ColType.Date)
    // exactly 0.7 does NOT pass (strict >)
    assert(decide(ColProfile(10, 7, 7, 10, 8, 8)) == ColType.Unknown)
    assert(decide(ColProfile(10, 0, 8, 8, 5, 5)) == ColType.Numeric)
    // categorical: 0 < unique_ratio <= 0.3 and distinct < 50
    assert(decide(ColProfile(100, 0, 0, 30, 5, 5)) == ColType.Categorical)
    assert(decide(ColProfile(100, 0, 0, 31, 5, 5)) == ColType.Unknown) // ratio .31
    assert(decide(ColProfile(1000, 0, 0, 50, 5, 5)) == ColType.Unknown) // 50 not < 50
    // text: avg len > 10 and unique_ratio > 0.5
    assert(decide(ColProfile(10, 0, 0, 6, 11, 11)) == ColType.Text)
    assert(decide(ColProfile(10, 0, 0, 6, 10, 10)) == ColType.Unknown) // len==10
    assert(decide(ColProfile(10, 0, 0, 5, 11, 11)) == ColType.Unknown) // ratio==0.5
  }

  test("T1 detect() on a real frame") {
    val df = Seq(
      ("2023-01-01", "1.5", "A", "this is a longer free text one"),
      ("2023-02-01", "2.5", "B", "this is a longer free text two"),
      ("2023-03-01", "x",   "A", "this is a longer free text three"),
      ("nope",       "4.5", "B", "this is a longer free text four"),
    ).toDF("d", "n", "c", "t")
    val types = TypeDetector.detect(df)
    assert(types("d") == ColType.Date)      // 3/4 = 75% > 70%
    assert(types("n") == ColType.Numeric)   // 3/4
    assert(types("t") == ColType.Text)      // long + unique
    // c: unique_ratio 0.5 > 0.3 -> not categorical; short -> unknown
    assert(types("c") == ColType.Unknown)
  }

  test("M2 median: exact linear interpolation like pandas") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    assert(Imputer.medians(df, Seq("x"))("x") == 2.5)
  }

  test("M3 mode: smallest value among most frequent (P5)") {
    val df = Seq("b", "b", "a", "a", "c").toDF("x")
    assert(Imputer.mode(df, "x").contains("a"))
    assert(Imputer.mode(spark.emptyDataset[String].toDF("x"), "x").isEmpty)
  }

  test("M1 drop threshold is strict > 0.8") {
    // 10 rows: 8 nulls = 0.8 -> keep; 9 nulls = 0.9 -> drop
    val keep = (Seq.fill(8)(None) ++ Seq(Some("a"), Some("b"))).toDF("x")
    val drop = (Seq.fill(9)(None) ++ Seq(Some("a"))).toDF("x")
    val types = Map("x" -> ColType.Unknown)
    val dKeep = Imputer.decide(keep, types, Imputer.nullCounts(keep), 10)
    val dDrop = Imputer.decide(drop, types, Imputer.nullCounts(drop), 10)
    assert(dKeep("x") != Imputer.Drop)
    assert(dDrop("x") == Imputer.Drop)
  }

  test("M5 winsorize: spike clamps to p95; inside-band z-flagged value unchanged") {
    // 20 ones + one huge spike: z(spike) > 3, clamp to exact p95
    val vals = Seq.fill(20)(1.0) ++ Seq(1000.0)
    val df = vals.toDF("x")
    val sts = Winsorizer.stats(df, Seq("x"))
    val out = Winsorizer.apply(df, sts).agg(max(col("x"))).collect().head.getDouble(0)
    assert(out == sts("x").p95)
    assert(Winsorizer.flaggedCounts(df, sts)("x") == 1)
  }

  test("M5 sigma=0 clamps nothing (P9)") {
    val df = Seq.fill(5)(7.0).toDF("x")
    val sts = Winsorizer.stats(df, Seq("x"))
    assert(!sts("x").active)
    val out = Winsorizer.apply(df, sts).agg(min(col("x")), max(col("x"))).collect().head
    assert(out.getDouble(0) == 7.0 && out.getDouble(1) == 7.0)
  }
}

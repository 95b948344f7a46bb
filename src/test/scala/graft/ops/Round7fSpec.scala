package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 seventh-wave units: A/B z-statistic and two-sample KS. */
class Round7fSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- abTestZ -----------------------------------------------------------

  test("abTestZ: hand-computed pooled z on a known split") {
    // A: 2/4 convert; B: 1/4 convert
    val df = Seq(
      (true, true), (true, true), (true, false), (true, false),
      (false, true), (false, false), (false, false), (false, false))
      .toDF("a", "c")
    val got = EvalOps.abTestZ(df, col("a"), col("c"))
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert((got._1, got._2, got._3, got._4) == ((4L, 2L, 4L, 1L)), got.toString)
    val p = 3.0 / 8.0
    val z = (0.5 - 0.25) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    val zN4 = math.floor(z * 1e4 + 0.5) / 1e4
    assert(got._7 == zN4, s"${got._7} vs $zN4")
    assert(got._5 == 0.5 && got._6 == 0.25, got.toString)
  }

  test("abTestZ: identical rates yield z = 0") {
    val df = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "c")
    val z = EvalOps.abTestZ(df, col("a"), col("c"))
      .select("z").as[Double].head()
    assert(z == 0.0, z.toString)
  }

  test("abTestZMulti: grid matches per-scenario readouts; degenerate splits go NULL") {
    val df = Seq((1L, "p"), (2L, "p"), (3L, "x"), (4L, "x")).toDF("uid", "t")
    val got = EvalOps.abTestZMulti(df, Seq(
      ("1_norm", col("uid") % 2 === 0, col("t") === "p"),
      ("2_empty_a", col("uid") < 0, col("t") === "p"),
      ("3_zero_conv", col("uid") % 2 === 0, col("t") === "zz"))).collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("1_norm", "2_empty_a", "3_zero_conv"))
    // 1_norm: A = {2,4} converts {2}; B = {1,3} converts {1} -> equal rates, z=0
    val norm = got(0)
    assert((norm.getLong(1), norm.getLong(2), norm.getLong(3), norm.getLong(4)) ==
      ((2L, 1L, 2L, 1L)), norm.toString)
    assert(norm.getDouble(5) == 0.5 && norm.getDouble(6) == 0.5 &&
      norm.getDouble(7) == 0.0, norm.toString)
    // 2_empty_a: no rows match A -> rate_a and z NULL, B side intact
    val empty = got(1)
    assert(empty.getLong(1) == 0L && empty.getLong(3) == 4L, empty.toString)
    assert(empty.isNullAt(5) && empty.getDouble(6) == 0.5 && empty.isNullAt(7),
      empty.toString)
    // 3_zero_conv: zero conversions pool p=0 -> zero-variance denominator -> z NULL
    val zero = got(2)
    assert(zero.getDouble(5) == 0.0 && zero.getDouble(6) == 0.0 &&
      zero.isNullAt(7), zero.toString)
  }

  // ---- ksDrift -----------------------------------------------------------

  test("ksDrift: disjoint supports reach KS = 1 at A's max value") {
    val df = Seq((true, 1L), (true, 2L), (false, 10L), (false, 11L))
      .toDF("a", "v")
    val got = EvalOps.ksDrift(df, col("a"), col("v"))
      .as[(Long, Long, Double, Long)].head()
    assert(got == ((2L, 2L, 1.0, 2L)), got.toString)
  }

  test("ksDrift: identical samples give KS = 0 at the smallest value") {
    val df = Seq((true, 5L), (false, 5L), (true, 9L), (false, 9L))
      .toDF("a", "v")
    val got = EvalOps.ksDrift(df, col("a"), col("v"))
      .as[(Long, Long, Double, Long)].head()
    assert(got == ((2L, 2L, 0.0, 5L)), got.toString)
  }

  test("ksDrift: hand-computed partial overlap") {
    // A = {1, 2}, B = {2, 3}: CDF gaps at v=1: |.5-0|=.5, v=2: |1-.5|=.5,
    // v=3: 0 -> KS .5 at value 1 (tie broken to smallest v)
    val df = Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L))
      .toDF("a", "v")
    val got = EvalOps.ksDrift(df, col("a"), col("v"))
      .as[(Long, Long, Double, Long)].head()
    assert(got == ((2L, 2L, 0.5, 1L)), got.toString)
  }

  // ---- kaplanMeier -------------------------------------------------------

  test("kaplanMeier: textbook risk sets, censoring, and grid log-survival") {
    // times: event@1, censor@2, event@3, event@3, censor@4 (N=5)
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true), (4L, false))
      .toDF("time", "evt")
    val got = StatsOps.kaplanMeier(df, "time", "evt")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    def g(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val s1 = g(4.0 / 5.0) // t=1: n=5, d=1
    val s3 = s1 + g(1.0 / 3.0) // t=3: n=3, d=2
    assert(got == Seq(
      (1L, 5L, 1L, 0L, s1),
      (2L, 4L, 0L, 1L, s1), // pure censor time: no survival step
      (3L, 3L, 2L, 0L, s3),
      (4L, 1L, 0L, 1L, s3)), got.toString)
  }

  test("kaplanMeier: extinction (last event empties the risk set) is NULL logS") {
    val df = Seq((1L, true), (2L, true), (3L, true)).toDF("time", "evt")
    val got = StatsOps.kaplanMeier(df, "time", "evt")
      .select("logs_u").as[Option[Long]].collect().toSeq
    def g(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(got == Seq(Some(g(2.0 / 3.0)), Some(g(2.0 / 3.0) + g(1.0 / 2.0)),
      None), got.toString) // S(3) = 0 exactly: not representable in log units
  }

  // ---- quantizeInt8 ------------------------------------------------------

  test("quantizeInt8: per-dim extreme maps to ±127; zero dim to 0") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(-2.0f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSeq
    // dim0 maxabs 2 -> scale 2/127: 1.0 -> 64 (63.5+.5 floor), -2.0 -> -127
    // dim1 maxabs .5: -0.5 -> -127, 0.25 -> 64; dim2 all zero -> 0
    assert(got == Seq(
      (1L, 0, 64L), (1L, 1, -127L), (1L, 2, 0L),
      (2L, 0, -127L), (2L, 1, 64L), (2L, 2, 0L)), got.toString)
  }

  test("quantizeInt8: reconstruction error bounded by half a scale step") {
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val codes = SimilarityOps.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map { case (id, d, c) => (id, d) -> c }.toMap
    val maxAbs = Array.tabulate(4)(d => vecs.map(v => math.abs(v._2(d))).max)
    for ((id, vec) <- vecs; d <- 0 until 4) {
      val scale = maxAbs(d) / 127.0
      val rec = codes((id, d)) * scale
      assert(math.abs(rec - vec(d)) <= scale / 2 + 1e-9,
        s"vec $id dim $d: ${vec(d)} -> ${codes((id, d))} -> $rec")
    }
  }
}

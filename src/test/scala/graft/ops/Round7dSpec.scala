package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 fifth-wave units: trigram novelty, vocabulary coverage,
  * source overlap, exact rank-sum AUC, and Markov transitions.
  */
class Round7dSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- trigramNovelty ----------------------------------------------------

  test("trigramNovelty: repeats of an earlier doc score zero novelty") {
    val df = Seq(
      (1L, "a b c d"), // trigrams "a b c", "b c d" — both first here
      (2L, "a b c d"), // exact repeat: novelty 0
      (3L, "x y z a b c")) // "x y z", "y z a", "z a b" new; "a b c" seen
      .toDF("id", "t")
    val got = CorpusOps.trigramNovelty(df, "id", "t")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 4L, 3L, 0.75)), got.toString)
  }

  test("trigramNovelty: short docs (<3 tokens) drop out") {
    val df = Seq((1L, "a b"), (2L, "p q r")).toDF("id", "t")
    val got = CorpusOps.trigramNovelty(df, "id", "t")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L), got.toString)
  }

  // ---- vocabCoverage -----------------------------------------------------

  test("vocabCoverage: ranks by count desc then token, shares accumulate to 1") {
    val df = Seq("a a a b b c").toDF("t")
    val got = CorpusOps.vocabCoverage(df, "t", k = 10)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1, "a", 3L, 3L, 0.5),
      (2, "b", 2L, 5L, 5.0 / 6.0),
      (3, "c", 1L, 6L, 1.0)), got.toString)
  }

  test("vocabCoverage: the k boundary is deterministic on count ties") {
    val df = Seq("z y x w").toDF("t") // all count 1: lexicographic order
    val got = CorpusOps.vocabCoverage(df, "t", k = 2)
      .select("tok").as[String].collect().toSeq
    assert(got == Seq("w", "x"), got.toString)
  }

  // ---- sourceOverlap -----------------------------------------------------

  test("sourceOverlap: hand-computed Jaccard, pair order s1 < s2") {
    val df = Seq(
      ("A", "a b c"), ("B", "b c d"), ("C", "zz")).toDF("src", "t")
    val got = CorpusOps.sourceOverlap(df, "src", "t")
      .as[(String, String, Long, Double)].collect().toSeq
    // V_A={a,b,c} V_B={b,c,d}: inter 2, union 4; C shares nothing
    assert(got == Seq(("A", "B", 2L, 0.5)), got.toString)
  }

  // ---- aucRankSum --------------------------------------------------------

  test("aucRankSum: perfect separation 1.0, anti-separation 0.0, ties 0.5") {
    val perfect = Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L))
      .toDF("y", "s")
    val a1 = EvalOps.aucRankSum(perfect, col("y"), col("s"))
      .as[(Long, Long, Double)].head()
    assert(a1 == ((2L, 2L, 1.0)), a1.toString)
    val anti = Seq((false, 10L), (true, 1L)).toDF("y", "s")
    val a0 = EvalOps.aucRankSum(anti, col("y"), col("s"))
      .as[(Long, Long, Double)].head()
    assert(a0._3 == 0.0, a0.toString)
    val tied = Seq((true, 5L), (false, 5L)).toDF("y", "s")
    val ah = EvalOps.aucRankSum(tied, col("y"), col("s"))
      .as[(Long, Long, Double)].head()
    assert(ah._3 == 0.5, ah.toString)
  }

  test("aucRankSum: hand-computed mixed case with a tie straddling classes") {
    // scores: pos {3, 2}, neg {2, 1}; pairs: (3>2)=1 (3>1)=1 (2=2)=.5 (2>1)=1
    // U = 3.5 of 4 -> AUC 0.875
    val df = Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L)).toDF("y", "s")
    val got = EvalOps.aucRankSum(df, col("y"), col("s"))
      .as[(Long, Long, Double)].head()
    assert(got == ((2L, 2L, 0.875)), got.toString)
  }

  test("aucRankSum: single-class input yields NULL, not a crash") {
    val df = Seq((true, 3L), (true, 1L)).toDF("y", "s")
    val got = EvalOps.aucRankSum(df, col("y"), col("s"))
      .select("auc").as[Option[Double]].head()
    assert(got.isEmpty, got.toString)
  }

  // ---- transitionMatrix --------------------------------------------------

  test("transitionMatrix: counts and row-normalized probabilities") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "view"),
      (1L, ts(3), 12L, "click"), (2L, ts(1), 20L, "view"),
      (2L, ts(2), 21L, "buy"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.transitionMatrix(df)
      .as[(String, String, Long, Double)].collect().toSeq
    // from "view": view->view 1, view->click 1, view->buy 1
    assert(got == Seq(
      ("view", "buy", 1L, 1.0 / 3.0),
      ("view", "click", 1L, 1.0 / 3.0),
      ("view", "view", 1L, 1.0 / 3.0)), got.toString)
  }

  test("transitionMatrix: same-timestamp events order by event_id") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, t, 2L, "b"), (1L, t, 1L, "a"), (1L, t, 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.transitionMatrix(df)
      .select("prev", "cur").as[(String, String)].collect().toSeq
    assert(got == Seq(("a", "b"), ("b", "c")), got.toString)
  }
}

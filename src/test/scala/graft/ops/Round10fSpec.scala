package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 sixth-wave units: bucketed global rank and the held-out
  * bigram model's unseen-floor semantics.
  */
class Round10fSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- globalRank ----------------------------------------------------------

  test("globalRank: matches the naive global window incl. duplicate values across cuts") {
    // heavy ties so percentile cuts land ON tied values — the strict->
    // comparison must keep every tie in one bucket
    val rows = Seq(5.0 -> 1L, 5.0 -> 2L, 5.0 -> 3L, 1.0 -> 4L, 2.0 -> 5L,
      2.0 -> 6L, 9.0 -> 7L, 9.0 -> 8L, 3.0 -> 9L, 5.0 -> 10L)
    val df = rows.toDF("v", "id")
    val got = LayoutOps.globalRank(df, "v", "id", nBuckets = 4)
      .orderBy("rank").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val expected = rows.sortBy { case (v, id) => (v, id) }
      .zipWithIndex.map { case ((v, id), i) => (v, id, i + 1L) }
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("globalRank: a two-bucket split still yields a dense 1..n total order") {
    val df = (1 to 50).map(i => ((i % 7).toDouble, i.toLong)).toDF("v", "id")
    val got = LayoutOps.globalRank(df, "v", "id", nBuckets = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(got.toSeq == (1L to 50L), got.mkString(", "))
  }

  // ---- bigramSurprisalHeldout ----------------------------------------------

  test("bigramSurprisalHeldout: unseen bigrams and unseen unigrams hit the add-one floor") {
    // train: "a b" -> uni {a:1, b:1}, V=2, bigram {"a b": 1}
    // val: "a b c d" -> "a b": -ln(2/3); "b c": -ln(1/3); "c d": -ln(1/2)
    val df = Seq((1L, "a b", true), (2L, "a b c d", false))
      .toDF("doc_id", "text", "tr")
    val got = LmOps.bigramSurprisalHeldout(df, "doc_id", "text", col("tr"))
      .collect()
    val exp = Seq(405465L, 1098612L, 693147L) // grid of the three terms
    assert(got.toSeq == Seq(Row(2L, 3L, exp.sum)), got.mkString(", "))
  }

  test("bigramSurprisalHeldout: training docs are never scored") {
    val df = Seq((1L, "a b", true), (2L, "a b", true)).toDF("doc_id", "text", "tr")
    assert(LmOps.bigramSurprisalHeldout(df, "doc_id", "text", col("tr"))
      .count() == 0)
  }
}

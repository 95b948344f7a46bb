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

  // ---- globalRank: ties straddling cuts (VERDICT r10 #4) --------------------

  test("globalRank: one value carrying 60% of the mass collapses " +
    "several cuts onto it — still a dense 1..n total order") {
    // 30 of 50 rows share v=5.0, so cuts 2..4 of an 8-bucket split all
    // equal 5.0; the strict > fold must route the whole tie block into
    // ONE bucket (leaving others empty) without breaking density
    val rows = (1 to 10).map(i => (i.toDouble / 100, i.toLong)) ++
      (11 to 40).map(i => (5.0, i.toLong)) ++
      (41 to 50).map(i => (100.0 + i, i.toLong))
    val df = rows.toDF("v", "id")
    val got = LayoutOps.globalRank(df, "v", "id", nBuckets = 8)
      .orderBy("rank").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val expected = rows.sortBy { case (v, id) => (v, id) }
      .zipWithIndex.map { case ((v, id), i) => (v, id, i + 1L) }
    assert(got.toSeq == expected, got.take(10).mkString(", "))
  }

  test("globalRank: an all-equal column degenerates to the tie order") {
    val df = (1 to 20).map(i => (7.0, i.toLong)).toDF("v", "id")
    val got = LayoutOps.globalRank(df, "v", "id", nBuckets = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (1 to 20).map(i => (i.toLong, i.toLong)),
      got.mkString(", "))
  }

  test("globalRank: NULL values are rejected up front (documented " +
    "contract), non-NULL rows rank densely") {
    val df = Seq((Some(3.0), 1L), (None, 2L), (Some(1.0), 3L),
      (None, 4L), (Some(2.0), 5L)).toDF("v", "id")
    val got = LayoutOps.globalRank(df, "v", "id", nBuckets = 2)
      .orderBy("rank").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1.0, 3L, 1L), (2.0, 5L, 2L), (3.0, 1L, 3L)),
      got.mkString(", "))
  }
}

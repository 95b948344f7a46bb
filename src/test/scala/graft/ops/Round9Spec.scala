package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row

/** Round-9 units: CDC log compaction and the Count-Min sketch. */
class Round9Spec extends EtlSpecBase {

  import spark.implicits._

  // ---- cdcApply ----------------------------------------------------------

  test("cdcApply: highest-seq op wins, delete removes the key, payload is row-atomic") {
    val log = Seq(
      (1L, 1L, "upsert", 10.0, "A"),
      (1L, 5L, "upsert", 20.0, "B"), // winner for key 1 (seq out of order)
      (1L, 3L, "upsert", 30.0, "C"),
      (2L, 2L, "upsert", 40.0, "D"),
      (2L, 9L, "delete", 0.0, "X"), // key 2 deleted last -> absent
      (3L, 4L, "delete", 0.0, "X"),
      (3L, 6L, "upsert", 50.0, "E") // key 3 re-upserted after delete
    ).toDF("k", "seq", "op", "price", "status")
    val got = ScdOps.cdcApply(log, "k", "seq", "op", Seq("price", "status"))
      .orderBy("k").collect()
    assert(got.toSeq == Seq(
      Row(1L, 20.0, "B", 5L),
      Row(3L, 50.0, "E", 6L)), got.mkString(", "))
  }

  test("cdcApply: a log of only deletes yields an empty state") {
    val log = Seq((1L, 1L, "delete", 0.0, "X")).toDF("k", "seq", "op", "p", "s")
    assert(ScdOps.cdcApply(log, "k", "seq", "op", Seq("p", "s")).count() == 0)
  }

  // ---- cmsTopK -----------------------------------------------------------

  test("cmsTopK: exact top-k ordering, estimates dominate exact counts") {
    val df = (Seq.fill(10)(7L) ++ Seq.fill(5)(3L) ++ Seq.fill(2)(11L) ++
      Seq(1L, 2L)).toDF("k")
    val got = SketchOps.cmsTopK(df, "k", 3, depth = 4, width = 16).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 10L), (3L, 5L), (11L, 2L)), got.mkString(", "))
    // CMS never underestimates, and over_cnt is the reported gap
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), r.toString)
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1), r.toString)
    }
  }

  test("cmsTopK: few keys in a wide sketch estimate exactly") {
    val df = Seq(1L, 1L, 2L, 3L).toDF("k")
    val got = SketchOps.cmsTopK(df, "k", 3, depth = 4, width = 1024).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), got.mkString(", "))
    got.foreach(r => assert(r.getLong(3) == 0L, r.toString))
  }

  test("cmsCountsRows equals cmsCounts over the per-key count frame") {
    import org.apache.spark.sql.functions._
    val df = (Seq.fill(6)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L)).toDF("k")
    val viaRows = SketchOps.cmsCountsRows(df, "k", 4, 64)
      .orderBy("r", "b").collect().toSeq
    val viaKeyCounts = SketchOps.cmsCounts(
        df.groupBy("k").agg(count(lit(1)).as("c")), "k", "c", 4, 64)
      .orderBy("r", "b").collect().toSeq
    assert(viaRows == viaKeyCounts)
    // every row of the input lands in exactly `depth` cells
    assert(viaRows.map(_.getLong(2)).sum == 4L * 10)
  }

  test("scd2AsOf: as-of 0 rebuilds the pre-merge dimension; as-of 1 the open rows") {
    import org.apache.spark.sql.functions._
    val current = Seq((1L, "A", 0L), (2L, "B", 0L))
      .toDF("k", "seg", "valid_from")
    val updates = Seq((1L, "X"), (3L, "C")).toDF("k", "seg")
    val merged = ScdOps.scd2Merge(current, updates, "k", "seg", 1L)
    val asOf0 = ScdOps.scd2AsOf(merged, 0L)
      .select("k", "seg").orderBy("k").collect().toSeq
    assert(asOf0.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "A"), (2L, "B")), asOf0.toString) // insert k=3 not yet visible
    val asOf1 = ScdOps.scd2AsOf(merged, 1L)
      .select("k", "seg").orderBy("k").collect().toSeq
    assert(asOf1.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "X"), (2L, "B"), (3L, "C")), asOf1.toString)
  }

  test("kmvOverlap: identical sets give J=1 and exact fallback below k") {
    import org.apache.spark.sql.functions._
    val df = (1L to 40L).map(i => (i, true)).toDF("id", "f")
    val got = SketchOps.kmvOverlap(df, "id", col("f"), col("f"), 64, 3L)
      .collect().head
    // 40 < k=64 -> every estimate is the exact count; sketches coincide
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((40L, 40L, 40L)))
    assert(got.getDouble(4) == 40.0 && got.getDouble(6) == 40.0, got.toString)
    assert(got.getLong(7) == 40L, s"all union hashes in both sketches: $got")
    assert(got.getDouble(8) == 40.0, got.toString)
  }

  test("kmvOverlap: disjoint sets estimate zero intersection") {
    import org.apache.spark.sql.functions._
    val df = (1L to 400L).map(i => (i, i % 2 == 0)).toDF("id", "even")
    val got = SketchOps.kmvOverlap(df, "id", col("even"), !col("even"), 64, 3L)
      .collect().head
    assert(got.getLong(3) == 0L, got.toString)
    assert(got.getLong(7) == 0L && got.getDouble(8) == 0.0,
      s"no union hash can be in both sketches: $got")
  }

  // ---- weightedSample ----------------------------------------------------

  test("weightedSample: k per stratum, zero weights excluded, dominant weight ranks first") {
    val df = Seq(
      (1L, "a", 3L), (2L, "a", 3L), (3L, "a", 3L), (4L, "a", 0L),
      (5L, "a", 1000000000L), // ln(u)/1e9 beats every w=3 key
      (6L, "b", 5L), (7L, "b", 5L)
    ).toDF("doc_id", "source", "w")
    val got = MixOps.weightedSample(df, "doc_id", "source", "w", 3, 7L)
      .collect()
    val bySrc = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 3, "b" -> 2), bySrc.toString)
    assert(!got.exists(_.getLong(2) == 4L), "zero-weight row was sampled")
    val aFirst = got.filter(r => r.getString(0) == "a" && r.getLong(1) == 1L)
    assert(aFirst.map(_.getLong(2)).toSeq == Seq(5L),
      s"dominant weight must rank first: ${got.mkString(", ")}")
  }

  test("weightedSample: pure function of (id, seed) — same seed same sample, new seed reshuffles") {
    val df = (1L to 200L).map(i => (i, "s", 10L + i % 7)).toDF("doc_id", "source", "w")
    val a1 = MixOps.weightedSample(df, "doc_id", "source", "w", 10, 1L).collect().toSeq
    val a2 = MixOps.weightedSample(df, "doc_id", "source", "w", 10, 1L).collect().toSeq
    val b = MixOps.weightedSample(df, "doc_id", "source", "w", 10, 2L).collect().toSeq
    assert(a1 == a2)
    assert(a1.map(_.getLong(2)) != b.map(_.getLong(2)),
      "different seeds must draw different samples")
  }
}

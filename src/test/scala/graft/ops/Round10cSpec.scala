package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row

/** Round-10 third-wave units: BPE merge learning and k-core peeling. */
class Round10cSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- bpeMerges -----------------------------------------------------------

  test("bpeMerges: frequency-weighted merges chain across iterations") {
    // words: to x3, tot x1 -> pair (t,o) freq 4 merges first, then
    // (to,t) freq 1 from the updated symbolization of 'tot'
    val docs = Seq("to to to tot").toDF("text")
    val got = LmOps.bpeMerges(docs, "text", 2).collect()
    assert(got.toSeq == Seq(
      Row(1, "t", "o", "to", 4L),
      Row(2, "to", "t", "tot", 1L)), got.mkString(", "))
  }

  test("bpeMerges: overlapping repeats merge left-to-right non-overlapping") {
    // 'aaaa' = [a,a,a,a]: pair (a,a) counts 3 (multiplicity), merging
    // yields [aa,aa] (positions 1+2 and 3+4, NOT the overlapping
    // middle) -> second merge is (aa,aa)
    val docs = Seq("aaaa").toDF("text")
    val got = LmOps.bpeMerges(docs, "text", 2).collect()
    assert(got.toSeq == Seq(
      Row(1, "a", "a", "aa", 3L),
      Row(2, "aa", "aa", "aaaa", 1L)), got.mkString(", "))
  }

  test("bpeMerges: frequency ties break lexicographically") {
    val docs = Seq("cd ab").toDF("text")
    val got = LmOps.bpeMerges(docs, "text", 1).collect()
    assert(got.toSeq == Seq(Row(1, "a", "b", "ab", 1L)), got.mkString(", "))
  }

  test("bpeVocab: census reflects the post-merge symbolization") {
    // after merge (t,o): 'to' x3 -> [to]; 'tot' -> [to, t]
    val docs = Seq("to to to tot").toDF("text")
    val got = LmOps.bpeVocab(docs, "text", iters = 1, topK = 5).collect()
    assert(got.toSeq == Seq(Row("to", 4L), Row("t", 1L)), got.mkString(", "))
  }

  // ---- kCorePeel -----------------------------------------------------------

  test("kCorePeel: peels the chain tail off a triangle+path, round by round") {
    // triangle 1-2-3 plus chain 3-4-5, k=2:
    // round 1 removes 5 (deg 1); round 2 removes 4 (deg fell to 1)
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
      .toDF("a", "b")
    val got = GraphOps.kCorePeel(edges, k = 2, rounds = 2).collect()
    assert(got.toSeq == Seq(
      Row(1, 1L, 4L, 4L),
      Row(2, 1L, 3L, 3L)), got.mkString(", "))
  }

  test("kCorePeel: k above max degree empties the graph and stays stable") {
    val edges = Seq(1L -> 2L, 2L -> 3L).toDF("a", "b")
    val got = GraphOps.kCorePeel(edges, k = 5, rounds = 2).collect()
    assert(got.toSeq == Seq(
      Row(1, 3L, 0L, 0L),
      Row(2, 0L, 0L, 0L)), got.mkString(", "))
  }

  test("kCorePeel: an already-k-core graph is a fixpoint (nothing removed)") {
    // K4: every degree 3 >= k=3
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L).toDF("a", "b")
    val got = GraphOps.kCorePeel(edges, k = 3, rounds = 2).collect()
    assert(got.toSeq == Seq(
      Row(1, 0L, 4L, 6L),
      Row(2, 0L, 4L, 6L)), got.mkString(", "))
  }

  // ---- q151's adaptive Apriori prune ---------------------------------------

  test("Apriori prune: semi-join-pruned pair census == unpruned census " +
    "filtered post-hoc (the correctness-preserving property q151 relies on)") {
    import org.apache.spark.sql.functions._
    val minPairs = 2L
    // items 1,2,3 frequent (co-occur twice); 7,8,9 appear once each —
    // infrequent, so their pairs can never clear the floor
    val rel = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 7L),
      (20L, 1L), (20L, 2L), (20L, 3L), (20L, 8L),
      (30L, 9L), (30L, 1L)).toDF("ok", "item")
    val baskets = GraphOps.cappedBaskets(rel, col("ok"), col("item"), 20)
    val itemCnt = baskets.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("c"))
    val freq = itemCnt.where(col("c") >= minPairs).select("pk")
    assert(freq.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    def census(pairs: org.apache.spark.sql.DataFrame) = pairs
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val raw = GraphOps.pairsFromBaskets(baskets)
    val pruned = raw
      .join(broadcast(freq.select(col("pk").as("a"))), Seq("a"), "left_semi")
      .join(broadcast(freq.select(col("pk").as("b"))), Seq("b"), "left_semi")
    assert(census(pruned) == census(raw))
    assert(census(raw) == Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L)))
    // and the prune DID remove rows before the exchange
    assert(pruned.count() < raw.count())
  }
}

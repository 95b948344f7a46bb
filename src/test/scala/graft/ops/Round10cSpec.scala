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
}

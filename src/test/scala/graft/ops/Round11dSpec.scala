package graft.ops

import graft.etl.EtlSpecBase

import org.apache.spark.sql.functions._

/** Round-11 wave-p units: HITS mutual reinforcement pinned against a
  * fully hand-unrolled 3-iteration trace on a 3-edge bipartite graph
  * (every integral division worked out by hand — the synth+check
  * discipline: the expected grid never touches [[GraphOps.hits]]).
  */
class Round11dSpec extends EtlSpecBase {

  import spark.implicits._

  // 1→10, 2→10, 2→11 at scaleU=1000. Hand trace:
  //   h0: h(1)=h(2)=1000
  //   i1: a_raw(10)=2000, a_raw(11)=1000, tot=3000
  //       → a(10)=666, a(11)=333
  //       h_raw(1)=666, h_raw(2)=999, tot=1665 → h(1)=400, h(2)=600
  //   i2: a_raw(10)=1000, a_raw(11)=600, tot=1600 → a=(625, 375)
  //       h_raw(1)=625, h_raw(2)=1000, tot=1625 → h=(384, 615)
  //   i3: a_raw(10)=999, a_raw(11)=615, tot=1614 → a=(618, 381)
  //       h_raw(1)=618, h_raw(2)=999, tot=1617 → h=(382, 617)
  test("hits: 3-iteration integer trace matches the hand-unrolled grid") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, iters = 3, scaleU = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (10L, "authority", 618L), (11L, "authority", 381L),
      (2L, "hub", 617L), (1L, "hub", 382L)))
  }

  test("hits: mass conservation — each side's scores sum to ~scaleU " +
    "(short of it only by the per-node floor of the integral division)") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L))
      .toDF("src", "dst")
    val rows = GraphOps.hits(edges, iters = 2, scaleU = 1000000L).collect()
    for (kind <- Seq("hub", "authority")) {
      val side = rows.filter(_.getString(1) == kind)
      val total = side.map(_.getLong(2)).sum
      assert(total <= 1000000L && total > 1000000L - side.length,
        s"$kind mass $total outside [scaleU-n, scaleU]")
    }
  }

  test("hits: a pure sink never gets a hub row; a pure source never " +
    "gets an authority row") {
    val edges = Seq((1L, 10L), (2L, 10L)).toDF("src", "dst")
    val rows = GraphOps.hits(edges, iters = 1).collect()
    assert(!rows.exists(r => r.getString(1) == "hub" && r.getLong(0) == 10L))
    assert(!rows.exists(r => r.getString(1) == "authority" &&
      (r.getLong(0) == 1L || r.getLong(0) == 2L)))
  }

  test("hits: rejects non-positive iteration counts") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphOps.hits(edges, iters = 0))
  }
}

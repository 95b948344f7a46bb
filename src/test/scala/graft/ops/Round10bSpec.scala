package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-10 second-wave units: WAV container kernels, degree-ordered
  * triangle census, frontier BFS, t-closeness, and the CUSUM scan.
  */
class Round10bSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- WAV header kernels ------------------------------------------------

  test("wavDims: parses a hand-written spec-literal mono 8kHz header") {
    // bytes laid out straight from the canonical WAVE description,
    // NOT from wavHeader — pins the parser to the real format so a
    // shared offset/endianness bug in synth+parse cannot cancel out.
    // 8000 Hz mono 16-bit, 2 frames -> data size 4, riff size 40.
    val spec: Array[Byte] = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, // riff size 40 little-endian
      'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, // fmt chunk size 16
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1F, 0, 0, // 8000 = 0x1F40 little-endian
      0x80, 0x3E, 0, 0, // byte rate 16000 = 0x3E80
      2, 0, // block align
      16, 0, // bits
      'd', 'a', 't', 'a', 4, 0, 0, 0 // 2 frames * 2 bytes
    ).map(_.toByte)
    val got = MultimodalKernels.wavDims(spec)
    assert(got != null && got.toLongArray().toSeq == Seq(8000L, 1L, 16L, 2L, 0L))
  }

  test("wavHeader/wavDims roundtrip incl. exact integer duration") {
    val ok = MultimodalKernels.wavDims(
      MultimodalKernels.wavHeader(44100, 2, 66150, valid = true))
    // 66150 frames at 44100 Hz = 1.5 s -> floor to 1500 ms
    assert(ok.toLongArray().toSeq == Seq(44100L, 2L, 16L, 66150L, 1500L))
    // duration floors, never rounds: 1 frame at 8kHz is 0 ms
    val tiny = MultimodalKernels.wavDims(
      MultimodalKernels.wavHeader(8000, 1, 1, valid = true))
    assert(tiny.toLongArray().toSeq == Seq(8000L, 1L, 16L, 1L, 0L))
  }

  test("wavDims rejects RIFX tag, truncation, and inconsistent derived fields") {
    assert(MultimodalKernels.wavDims(
      MultimodalKernels.wavHeader(8000, 1, 10, valid = false)) == null)
    assert(MultimodalKernels.wavDims(Array[Byte](1, 2, 3)) == null)
    assert(MultimodalKernels.wavDims(
      MultimodalKernels.wavHeader(8000, 1, 10, valid = true).take(43)) == null)
    // corrupt the derived byte-rate field: primaries stay valid, the
    // cross-check must still reject
    val bad = MultimodalKernels.wavHeader(8000, 1, 10, valid = true)
    bad(28) = (bad(28) ^ 1).toByte
    assert(MultimodalKernels.wavDims(bad) == null)
    // non-PCM format code
    val alaw = MultimodalKernels.wavHeader(8000, 1, 10, valid = true)
    alaw(20) = 6
    assert(MultimodalKernels.wavDims(alaw) == null)
  }

  // ---- triangleStats -----------------------------------------------------

  private def edgesOf(rows: (Long, Long)*) = rows.toSeq.toDF("a", "b")

  test("triangleStats: one triangle plus a pendant, exact wedge census") {
    // triangle 1-2-3 plus pendant edge 3-4; input includes a
    // duplicate, a reversed duplicate, and a self-loop to normalize
    val got = GraphOps.triangleStats(edgesOf(
      1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L,
      2L -> 1L, 1L -> 2L, 4L -> 4L)).collect()
    // degs: 1:2 2:2 3:3 4:1 -> wedges 1+1+3+0 = 5; gcc = 3e6*1 div 5
    assert(got.toSeq == Seq(Row(4L, 4L, 5L, 1L, 600000L)), got.mkString(", "))
  }

  test("triangleStats: two triangles sharing an edge") {
    // K4 minus edge 3-4: triangles {1,2,3} and {1,2,4}
    val got = GraphOps.triangleStats(edgesOf(
      1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L)).collect()
    // degs: 1:3 2:3 3:2 4:2 -> wedges 3+3+1+1 = 8; gcc = 6e6 div 8
    assert(got.toSeq == Seq(Row(4L, 5L, 8L, 2L, 750000L)), got.mkString(", "))
  }

  test("triangleStats: triangle-free graph reports zero with gcc 0") {
    val got = GraphOps.triangleStats(edgesOf(1L -> 2L, 2L -> 3L, 3L -> 4L))
      .collect()
    assert(got.toSeq == Seq(Row(4L, 3L, 2L, 0L, 0L)), got.mkString(", "))
  }

  // ---- bfsLevels ----------------------------------------------------------

  test("bfsLevels: shortest-path levels, unreachable component excluded") {
    // path 1-2-3-4-5 plus disconnected 8-9; undirected via both dirs
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 8L -> 9L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.bfsLevels(edges, seeds, maxHops = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // level 0: {1}, 1: {2}, 2: {3}, 3: {4}; 5 beyond hops, 8/9 unreachable
    assert(got == Seq(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L), got.toString)
  }

  test("bfsLevels: a node is counted at its FIRST level only (diamond)") {
    // 1->2, 1->3, 2->4, 3->4: node 4 reachable twice at level 2
    val und = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.bfsLevels(edges, Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // level 1: {2,3}; level 2: {4} once; frontier then empties -> no level 3 row
    assert(got == Seq(0 -> 1L, 1 -> 2L, 2 -> 1L), got.toString)
  }

  // ---- tCloseness ---------------------------------------------------------

  test("tCloseness: hand-computed TVD incl. the absent-source tail") {
    // g1: A x3, B x1 (n=4); g2: A x1, C x1 (n=2). N=6, N_A=4 N_B=1 N_C=1
    // t(g1) = (|18-16| + |6-4| + absent C: 4*(6-5)) / (2*4*6) = 8/48 = 0.1667
    // t(g2) = (|6-8| + |6-2| + absent B: 2*(6-5)) / (2*2*6) = 8/24 = 0.3333
    val df = (Seq.fill(3)(("g1", "A")) ++ Seq(("g1", "B"), ("g2", "A"), ("g2", "C")))
      .toDF("g", "src")
    val got = StatsOps.tCloseness(df, Seq("g" -> col("g")), col("src"))
      .orderBy("g").collect()
    assert(got.toSeq == Seq(Row("g1", 4L, 0.1667), Row("g2", 2L, 0.3333)),
      got.mkString(", "))
  }

  test("tCloseness: a group matching the global distribution reads zero") {
    val df = (Seq.fill(2)(("g1", "A")) ++ Seq.fill(2)(("g1", "B")) ++
      Seq.fill(4)(("g2", "A")) ++ Seq.fill(4)(("g2", "B"))).toDF("g", "src")
    val got = StatsOps.tCloseness(df, Seq("g" -> col("g")), col("src"))
      .orderBy("g").collect()
    assert(got.toSeq == Seq(Row("g1", 4L, 0.0), Row("g2", 8L, 0.0)),
      got.mkString(", "))
  }

  // ---- cusumDaily ----------------------------------------------------------

  test("cusumDaily: level shift puts the |max| excursion at the boundary day") {
    // 10.00 for 3 days then 20.00 for 3: S*n = -3000,-6000,-9000,-6000,-3000,0
    val orders = (1 to 6).map(d =>
      (f"2024-01-0$d", if (d <= 3) 10.0 else 20.0)).toDF("o_orderdate", "o_totalprice")
    val got = StatsOps.cusumDaily(orders).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1000L, -3000L, false),
      ("2024-01-02", 1000L, -6000L, false),
      ("2024-01-03", 1000L, -9000L, true),
      ("2024-01-04", 2000L, -6000L, false),
      ("2024-01-05", 2000L, -3000L, false),
      ("2024-01-06", 2000L, 0L, false)), got.mkString(", "))
  }

  test("cusumDaily: ties on |S| flag the EARLIEST day") {
    // alternating +-: |S| ties across days; only the first flags
    val orders = Seq(("2024-01-01", 20.0), ("2024-01-02", 10.0),
      ("2024-01-03", 20.0), ("2024-01-04", 10.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = StatsOps.cusumDaily(orders).collect()
    assert(got.count(_.getBoolean(3)) == 1)
    assert(got.head.getBoolean(3), got.mkString(", "))
  }
}

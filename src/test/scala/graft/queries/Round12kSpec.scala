package graft.queries

/** Hand-computed units for q277 (MMR re-ranking) and q278 (Jaccard
  * threshold sweep).
  */
class Round12kSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q277 MMR: greedy relevance/redundancy trade, exhausted " +
    "candidates stop early") {
    // query v0=[1,0]; candidates v1=[1,0] (rel 1), v2=[.8,.6] (.8),
    // v3=[.6,.8] (.6), v4=[0,1] (0); sims: (1,2)=.8 (1,3)=.6 (1,4)=0
    // (2,3)=.96 (2,4)=.6 (3,4)=.8. Picks: v1 (700000), v2 (.32 beats
    // v3's .24), v3 (132000 — its .96 sim to v2 bites), v4 (-240000);
    // only 4 candidates -> 4 rows despite MmrPicks = 5.
    val dir = plant("embeddings" -> Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.8f, 0.6f)), (3L, Seq(0.6f, 0.8f)),
      (4L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding"))
    val got = run("q277_mmr_rerank", dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, 1L, 1.0, 0.0, 700000L),
      (2, 2L, 0.8, 0.8, 320000L),
      (3, 3L, 0.6, 0.96, 132000L),
      (4, 4L, 0.0, 0.8, -240000L)), got.mkString(", "))
  }

  test("q278 Jaccard sweep: dense decile spine, survival curve") {
    // one doc + its auto near-copy (corpus builder appends ' qq zz vv'
    // to every doc_id % 10 = 0): 11 distinct tokens -> 9 shingles vs
    // 12 -> jac = 9/12 = .75 -> bucket 7; survival 1 through bucket 7
    val dir = plant("documents" ->
      Seq((0L, "a b c d e f g h i j k")).toDF("doc_id", "text"))
    val got = run("q278_jaccard_sweep", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (0L to 9L).map(b =>
      (b, if (b == 7) 1L else 0L, if (b <= 7) 1L else 0L)),
      got.mkString(", "))
  }
}

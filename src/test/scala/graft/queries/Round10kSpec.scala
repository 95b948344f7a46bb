package graft.queries

/** Hand-computed edge units for the round-10 eleventh wave
  * (q184-q185), driven through the REAL registered queries on planted
  * fixtures (VERDICT r10 #4): centroid cosine on orthogonal/opposed
  * sources and the exact interpolated skew percentiles.
  */
class Round10kSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q184: identical centroids give cosine 1.0, opposed give -1.0") {
    // s1 docs: [1,0] and [0,1] -> centroid direction (1,1)
    // s2 doc:  [1,1]           -> same direction  => cos(s1,s2) = 1
    // s3 doc:  [-1,-1]         -> opposed         => cos = -1
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s2"), (4L, "s3"))
      .toDF("doc_id", "source")
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f)), (4L, Array(-1f, -1f))
    ).toDF("vec_id", "embedding")
    val got = run("q184_source_centroids",
        plant("documents" -> docs, "embeddings" -> emb))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val expected = Seq(("s1", "s2", 1.0), ("s1", "s3", -1.0),
      ("s2", "s3", -1.0))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q185: exact interpolated p99 of a planted hot-key profile") {
    // loads: key 1 -> 10 rows, keys 2..5 -> 1 row each
    // sorted loads [1,1,1,1,10]: p50 = 1, p99 at 0-based rank
    // 0.99*4 = 3.96 -> 1 + 0.96*(10-1) = 9.64
    val li = ((1 to 10).map(_ => 1L) ++ Seq(2L, 3L, 4L, 5L))
      .toDF("l_suppkey")
    val got = run("q185_join_skew_stats", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    // skew_x1000 = max*1000*keys div rows = 10*1000*5 div 14 = 3571
    assert(got.toSeq == Seq((14L, 5L, 10L, 1.0, 9.64, 3571L)),
      got.mkString(", "))
  }
}

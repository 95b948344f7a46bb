package graft.queries

/** Hand-computed edge units for the round-10 closing wave
  * (q186-q187), driven through the REAL registered queries on planted
  * fixtures (VERDICT r10 #4).
  */
class Round10lSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q186: token savings count cross-document duplicates once per " +
    "source — exact ppm, hand-computed") {
    // source a: doc 1 "w", doc 7 "x y z" (7 % 7 == 0 -> re-referenced)
    //   refs: {w, xyz, xyz}      tok_total = 1 + 3 + 3 = 7
    //   uniq: {w, xyz}           tok_unique = 4
    //   savings = (7-4)*1e6 div 7 = 428571
    // source b: docs 14 and 21 share the SAME text (both %7==0)
    //   refs: {qq x4}            tok_total = 8
    //   uniq: {qq}               tok_unique = 2
    //   savings = 6e6 div 8 = 750000
    val docs = Seq(
      (1L, "w", "a"), (7L, "x y z", "a"),
      (14L, "q q", "b"), (21L, "q q", "b")
    ).toDF("doc_id", "text", "source")
    val got = run("q186_dedup_savings", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = Seq(
      ("a", 3L, 2L, 7L, 4L, 428571L),
      ("b", 4L, 1L, 8L, 2L, 750000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q187: percentile normalization spans exactly 0..1000000 ppm " +
    "and is monotone in the quality score") {
    // 5 docs with strictly increasing quality (longer, cleaner text
    // scores higher under the q16 scorer is NOT assumed — monotonicity
    // is asserted against the returned q4 itself, not the text)
    val docs = Seq(
      (1L, "a"), (2L, "some words here"), (3L, "a plain readable sentence " +
        "with several words."), (4L, "Another plain readable sentence, " +
        "slightly longer and punctuated properly."), (5L, "zz!!")
    ).toDF("doc_id", "text")
    val got = run("q187_quantile_norm", plant("documents" -> docs))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == 5)
    val byRank = got.sortBy(_._3)
    // dense ppm grid over n=5 docs: 0, 250000, 500000, 750000, 1000000
    assert(byRank.map(_._3).toSeq ==
      Seq(0L, 250000L, 500000L, 750000L, 1000000L), got.mkString(", "))
    // rank order must follow (q4, doc_id) lexicographically
    val resorted = got.sortBy(r => (r._2, r._1)).map(_._1).toSeq
    assert(byRank.map(_._1).toSeq == resorted, got.mkString(", "))
  }
}

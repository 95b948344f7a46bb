package graft.queries

/** Units for q393 — q-gram prefix blocking must reproduce q105's
  * best-match table exactly (recall-lossless blocking). */
class Round14dSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q393: q-gram blocking re-links planted typos identically to " +
    "the domain-block path") {
    // 18-char synthetic names in the fixture shape; custkey % 3 drives
    // the typo class (delete char 12 / swap 14-15 / exact)
    val names = (0L until 30L).map { k =>
      (k, f"Customer#$k%09d", 0, 0.0, "seg")
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val dir = plant("customer" -> names)
    // q105 defaults to the deletion path since round 15 — pin the
    // LEGACY suffix-block path here so the two sides stay independent
    // implementations (the comparison is the point of this test).
    // withSysProp documents the serial-suite-execution requirement
    // and restores any prior value even on assertion failure
    val viaBlock = withSysProp("graft.match.block", "true") {
      run("q105_fuzzy_match", dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val viaQgram = run("q393_fuzzy_deletion_join", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaBlock.nonEmpty)
    assert(viaQgram == viaBlock,
      s"qgram=${viaQgram.take(5)} block=${viaBlock.take(5)}")
    // every dirty row must link back to its own key at the planted
    // distance (delete = 1; swap = 2 when the swapped digits differ,
    // else 0; exact = 0)
    def name(k: Long) = f"Customer#$k%09d"
    viaQgram.foreach { case (id, m, d) =>
      val n = name(id)
      val expected = id % 3 match {
        case 0 => 1L
        case 1 => if (n.charAt(13) == n.charAt(14)) 0L else 2L
        case _ => 0L
      }
      assert(m == id && d == expected, s"($id,$m,$d) want $expected")
    }
  }
}

package graft.queries

/** Hand-computed units for the round-11 additions (q190-q194),
  * driven through the REAL registered queries on planted fixtures.
  */
class Round11Spec extends PlantedQuerySpec {

  import spark.implicits._

  test("q190: exact Σc² self-join size vs the independence estimate, " +
    "hand-computed") {
    // day counts 3 / 1 / 2: exact = 9+1+4 = 14, indep = 36 div 3 = 12,
    // blowup = 14000 div 12 = 1166, top share = 9e6 div 14 = 642857
    val orders = (Seq.fill(3)("1970-01-02") ++ Seq("1970-01-03") ++
      Seq.fill(2)("1970-01-04"))
      .map(d => (ts(s"${d}T00:00:00Z"), 1.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = run("q190_join_size_preflight", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq((6L, 3L, 3L, 14L, 12L, 1166L, 642857L)),
      got.mkString(", "))
  }

  test("q191: router separates ok / null_like / unparseable with the " +
    "real C1 kernel as the verdict") {
    // l_linenumber % 5 picks the dirt class (see q191Dirty)
    val li = Seq(
      (1L, 1, 1234.56, 10.0), // "1234,56"   -> euro decimal, cleans OK
      (2L, 2, 99.5, 7.0),     // "7.0.000,25"-> multi-dot, unparseable
      (3L, 3, 1.0, 1.0),      // "N/A"       -> strips to "", null_like
      (4L, 4, 1.0, 1.0),      // "n.a."      -> strips to "..", unparseable
      (5L, 5, 50.25, 1.0)     // "50.25"     -> clean passthrough (5%5=0)
    ).toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    val got = run("q191_quarantine_channel", plant("lineitem" -> li))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val expected = Seq(
      ("null_like", 1L, "N/A", 3L),
      ("ok", 2L, "1234,56", 5L),        // string-min sample
      ("unparseable", 2L, "7.0.000,25", 4L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q192: lambda trio on hand vectors — strict > on the filter, " +
    "floor-grid on norm and head (incl. a negative head)") {
    val emb = Seq(
      (1L, Array(3f, 4f)),      // l2 5.0 -> 50000; both large; head 30000
      (2L, Array(0.5f, -0.5f)), // strict >0.5 excludes both; l2 ~0.7071
      (3L, Array(-0.2f, 0f))    // negative head floors to -2000
    ).toDF("vec_id", "embedding")
    val got = run("q192_vector_hof_stats", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3)))
    val expected = Seq(
      (1L, 50000L, 2, 30000L),
      (2L, 7071L, 0, 5000L),
      (3L, 2000L, 0, -2000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q193: cosine² ranking with a deliberate tie broken by partner " +
    "id, and a below-floor pair dropped") {
    // baskets {1,2,3} x2, {1,2}, {4,5}: pair (4,5) has support 1 -> out
    // c1=3 c2=3 c3=2; sim²: (1,2)=9e9/9=1e9, (1,3)=(2,3)=4e9/6
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 1L), (30L, 2L),
      (40L, 4L), (40L, 5L)
    ).toDF("l_orderkey", "l_partkey")
    val got = run("q193_item_recs", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val tie = 4000000000L / 6
    val expected = Seq(
      (1L, 1, 2L, 3L, 1000000000L), (1L, 2, 3L, 2L, tie),
      (2L, 1, 1L, 3L, 1000000000L), (2L, 2, 3L, 2L, tie),
      (3L, 1, 1L, 2L, tie), (3L, 2, 2L, 2L, tie))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q196: fact before the first version reports UNMATCHED; a " +
    "same-day version tie closes the earlier one into an empty interval") {
    val orders = Seq(
      // cust 1: A valid [day1, day9), B valid [day9, inf)
      (1L, 11L, ts("1970-01-02T00:00:00Z"), "A"),
      (1L, 21L, ts("1970-01-10T00:00:00Z"), "B"),
      // cust 2: single order, orderkey % 5 == 0 -> fact probes at -1
      // day, BEFORE the only version -> UNMATCHED
      (2L, 5L, ts("1970-01-05T00:00:00Z"), "C"),
      // cust 3: two versions on the SAME day: D closes empty, E wins
      (3L, 31L, ts("1970-01-03T00:00:00Z"), "D"),
      (3L, 32L, ts("1970-01-03T00:00:00Z"), "E")
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val got = run("q196_temporal_dim_join", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // facts: ok11 ts=day16 -> B; ok21 ts=day24 -> B; ok5 ts=day3 ->
    // UNMATCHED; ok31/ok32 ts=day17 -> E (never D)
    val expected = Seq(("B", 2L, 1L), ("E", 2L, 1L), ("UNMATCHED", 1L, 1L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q197: sentence census — trailing enders yield no empty " +
    "sentence, an unpunctuated doc is one sentence, an enders-only " +
    "doc has zero (NULL ratio)") {
    val docs = Seq(
      (1L, "Hello world. Bye!", "s"),
      (2L, "no punct", "s"),
      (3L, "...", "t")
    ).toDF("doc_id", "text", "source")
    val got = run("q197_sentence_stats", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val expected = Seq(
      ("s", 2L, 3L, 5L, Some(5000L / 3L)), // 3 sents, 5 tokens
      ("t", 1L, 0L, 1L, None))             // "..." is 1 token, 0 sents
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q199: purge drops exactly the deletion set from every store " +
    "and the leak re-scan is zero") {
    // ids 1..34; ids 1 and 17 are long enough for TWO chunks; 17 and
    // 34 are in the deletion set (id % 17 == 0)
    val docs = (1L to 34L)
      .map(i => (i, if (i == 1 || i == 17) "b" * 200 else "a" * 100))
      .toDF("doc_id", "text")
    val got = run("q199_erasure_audit", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = Seq(
      ("chunks", 36L, 33L, 0L), // 34 + 2 extras; purge drops 17's 2 + 34's 1
      ("documents", 34L, 32L, 0L),
      ("fingerprints", 34L, 32L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q200: exact-duplicate texts across sources collapse to one " +
    "manifest document under the min-id canonical source") {
    val docs = Seq(
      (7L, "the very same text appears twice", "src_b"),
      (3L, "the very same text appears twice", "src_a")
    ).toDF("doc_id", "text", "source")
    val got = run("q200_freeze_manifest", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // one distinct text -> one rep (doc 3, src_a); median == its own
    // q4 so the floor keeps it; 6 whitespace tokens
    assert(got.length == 1, got.mkString(", "))
    assert(got.head._2 == "src_a" && got.head._3 == 1L && got.head._4 == 6L,
      got.mkString(", "))
  }

  test("q201: prefix filtering finds the above-threshold shingle pair " +
    "and exact verification rejects the near-miss") {
    // doc 1 "a b c d e"   -> shingles {abc, bcd, cde}
    // doc 2 "a b c d e f" -> + {def}: jac = 3/4 = 750000 ppm >= 600000
    // doc 3 "a b c d x"   -> {abc, bcd, cdx}: jac with 1 = 2/4 = 0.5 -> out
    // doc 4 "x y z w"     -> unrelated
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f"), (3L, "a b c d x"),
      (4L, "x y z w")
    ).toDF("doc_id", "text")
    val got = run("q201_prefix_simjoin", plant("documents" -> docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 750000L)), got.mkString(", "))
  }

  test("q202: exact-proportion split floors tiny strata (a 3-doc source " +
    "gets 2/0/1, never a hash-lottery 0-train)") {
    val docs = ((1L to 10L).map(i => (i, "s")) ++
      (11L to 13L).map(i => (i, "t")))
      .toDF("doc_id", "source")
    val got = run("q202_stratified_split", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val expected = Seq(
      ("s", "test", 1L, 100000L), ("s", "train", 8L, 800000L),
      ("s", "val", 1L, 100000L),
      ("t", "test", 1L, 333333L), ("t", "train", 2L, 666666L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q194: the top-1% cut is an integer rank comparison — 2 of 200 " +
    "customers, hand-computed share") {
    // 199 customers at $1.00, customer 200 at $100.00
    val orders = ((1 to 199).map(c => (c.toLong, 1.0)) :+ (200L, 100.0))
      .toDF("o_custkey", "o_totalprice")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.lit(ts("2024-01-01T00:00:00Z")))
    val got = run("q194_top_revenue_share", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val share = 10100L * 1000000L / 29900L
    assert(got.toSeq == Seq((200L, 2L, 10100L, 29900L, share)),
      got.mkString(", "))
  }
}

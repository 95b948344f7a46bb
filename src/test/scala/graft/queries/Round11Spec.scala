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

  test("q203: a cheap 3-edge path found at round 3 CORRECTS the " +
    "expensive 1-edge label assigned at round 1") {
    // customers 1, 2 (nodes 2, 4); suppliers 1, 2 (nodes 3, 5); seed is
    // cust 1 (custkey % 100 == 1). Weights = 1 + min floor(qty):
    //   (c1,s1) w=5, (c2,s1) w=3, (c2,s2) w=10, (c1,s2) w=26.
    // Round 1 labels s2 at 26 via the direct edge; round 3 improves it
    // to 0+5+3+10 = 18 via s1→c2 — the label-correcting case.
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (10L, 1L, 4.7), (20L, 1L, 2.0), (20L, 2L, 9.9), (30L, 2L, 25.0)
    ).toDF("l_orderkey", "l_suppkey", "l_quantity")
    val got = run("q203_sssp_census", plant("orders" -> orders, "lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L), (5L, 1L), (8L, 1L), (18L, 1L)),
      got.mkString(", "))
  }

  test("q204: next-fit-decreasing bins — a boundary-straddling file " +
    "opens a new bin; an oversized file absorbs its trailer") {
    // 2024-01 sizes desc: 30M, 30M, 25M, 10M (target 50M) — cumsums
    // 30/60/85/95M -> bins {30M} and {30M+25M+10M = 65M}.
    // 2024-02: 120M then 1M — cum 120M and 121M both land in bin
    // (cum-1) div 50M = 2: the oversized file fills its bin past the
    // boundary and the 1M trailer tops it off (next-fit semantics).
    val orders = Seq(
      (1L, "2024-01-05", 3.0e7), (2L, "2024-01-10", 3.0e7),
      (3L, "2024-01-15", 2.5e7), (4L, "2024-01-20", 1.0e7),
      (5L, "2024-02-05", 1.2e8), (6L, "2024-02-10", 1.0e6)
    ).map { case (k, d, p) => (k, ts(s"${d}T00:00:00Z"), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = run("q204_compaction_plan", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = Seq(
      ("2024-01", 4L, 2L, 95000000L, 65000000L, 30000000L),
      ("2024-02", 2L, 1L, 121000000L, 121000000L, 121000000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q205: one deliberate arrival inversion — hand-computed delays, " +
    "lateness, and interpolated percentiles") {
    // delay(id) = ((id + 31) * 48271) % P % 120e6 µs:
    //   id1 1544672, id2 1592943, id3 1641214, id4 1689485.
    // ts (µs after B=1e12): id3 +0, id2 +60000, id1 +100000, id4 +200000.
    // Arrival = ts + delay: id3 first (1641214), then id1 (1644672),
    // id2 (1652943) — id2 arrives AFTER id1 with an EARLIER event time
    // -> late by 100000-60000 = 40000 µs; id4 last, on time.
    // late_us = [0,0,40000,0]: ppm = 250000, p50 = 0, p95 = idx 2.85
    // -> 0.85·40000 = 34000, p99 -> 38800, max = 40000.
    val base = 1000000000000L
    val events = Seq(
      (1L, 100000L), (2L, 60000L), (3L, 0L), (4L, 200000L)
    ).map { case (id, off) =>
      (id, java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plusNanos((base + off) * 1000L)))
    }.toDF("event_id", "ts")
    val got = run("q205_lateness_census", plant("events" -> events))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == Seq((4L, 1L, 250000L, 0.0, 34000.0, 38800.0, 40000L)),
      got.mkString(", "))
  }

  test("q206: hand-computed g2/g3 — a violated FD, a holding FD, and a " +
    "unique-LHS key with NULL viol_ppm") {
    // part 10 ships from supps {100, 200, 100}: all2 = 6, ok2 = 2 ->
    // viol_pairs = 2, ppm = 4e6 div 6 = 666666, g3 = 4 - (2+1) = 1.
    // okey 1 has flags {A,A,A}: FD holds (viol 0, ppm 0, g3 0).
    // (okey, line) is unique: all2 = 0 -> ppm NULL.
    val li = Seq(
      (1L, 1, 10L, 100L, "A"), (1L, 2, 10L, 200L, "A"),
      (1L, 3, 11L, 300L, "A"), (2L, 1, 10L, 100L, "N")
    ).toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_returnflag")
    val got = run("q206_fd_profile", plant("lineitem" -> li))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    val expected = Seq(
      ("lpart->lsupp", 4L, 2L, 2L, Some(666666L), 1L),
      ("okey,line->lpart", 4L, 4L, 0L, None, 0L),
      ("okey->retflag", 4L, 2L, 0L, Some(0L), 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q207: edge days drop; a single spike pulls neighboring trends " +
    "and leaves negative deviations (trunc-div parity)") {
    // 9 consecutive days from 1970-01-01 (Thu): rev 14 except day8=84.
    // Full 7-day windows exist only for days 4-6: trends 14/24/24 ->
    // devs 0/-10/-10 on isodow 7/1/2; one day per dow -> sea = dev,
    // residuals 0.
    val revs = Seq(14.0, 14.0, 14.0, 14.0, 14.0, 14.0, 14.0, 84.0, 14.0)
    val orders = revs.zipWithIndex.map { case (r, i) =>
      (i.toLong, ts(f"1970-01-${i + 1}%02dT00:00:00Z"), r)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = run("q207_seasonal_decompose", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = Seq((1L, 1L, -10L, 0L), (2L, 1L, -10L, 0L), (7L, 1L, 0L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q208: each dirt class fires exactly its residue docs; a doc in " +
    "two classes counts once per flag but is clean-excluded once") {
    // source s: ids 1 (clean), 3 (moji), 5 (fffd), 11 (ctrl), 13 (crlf)
    // source t: id 26 = 2x13 (crlf) and 26 % 7 == 5 (fffd) -> stacked
    val docs = (Seq(1L, 3L, 5L, 11L, 13L).map(i => (i, "hello", "s")) :+
      ((26L, "hello", "t"))).toDF("doc_id", "text", "source")
    val got = run("q208_mojibake_census", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val expected = Seq(
      ("s", 5L, 1L, 1L, 1L, 1L, 200000L),
      ("t", 1L, 0L, 1L, 0L, 1L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q209: the late-dimension relation reports exactly the withheld " +
    "and absent keys; clean relations report zero with NULL key range") {
    // customer {1, 2, 257}; late dim withholds 257 (% 250 == 7).
    // orders reference custkeys 1, 257, 257, 9 -> orphans vs late dim:
    // key 257 (2 rows) + key 9 (1 row, absent entirely) = 3 rows / 2
    // keys, ppm = 3e6 div 4 = 750000, key range [9, 257].
    val cust = Seq(1L, 2L, 257L).toDF("c_custkey")
    val orders = Seq((1L, 1L), (2L, 257L), (3L, 257L), (4L, 9L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(1L, 1L, 2L).toDF("l_orderkey")
    val events = Seq((1L, ts("2024-01-01T00:00:00Z")),
      (2L, ts("2024-01-02T00:00:00Z"))).toDF("user_id", "ts")
    val got = run("q209_ri_audit", plant("customer" -> cust,
      "orders" -> orders, "lineitem" -> li, "events" -> events))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val expected = Seq(
      ("events->customer", 2L, 0L, 0L, 0L, None, None),
      ("lineitem->orders", 3L, 0L, 0L, 0L, None, None),
      ("orders->late_customer", 4L, 3L, 2L, 750000L, Some(9L), Some(257L)))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q210: df counts a repeated token once per doc; the digest trio " +
    "pins posting membership; ties order by token") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = run("q210_inverted_index", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = Seq(
      ("b", 2L, 2L, 3L, 1L, 2L),
      ("a", 1L, 2L, 1L, 1L, 1L),
      ("c", 1L, 1L, 2L, 2L, 2L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q211: hand-computed Flesch milli grid; an enders-only doc has " +
    "zero sentences and is skipped (an unpunctuated doc would score " +
    "as ONE sentence — the q197 contract)") {
    // "The cat sat. It ran away!": W=6, S=2, vowel groups=7
    // ('away' has two: 'a', 'ay') -> wps 3000, spw 1166,
    // flesch = 206835 - 3045 - 98643 = 105147. "..." -> S=0, skipped.
    val docs = Seq(
      (1L, "The cat sat. It ran away!", "s"),
      (2L, "...", "s")
    ).toDF("doc_id", "text", "source")
    val got = run("q211_readability", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("s", 1L, 1L, 3000L, 1166L, 105147L)),
      got.mkString(", "))
  }

  test("q212: separable subspace patterns land on the init exemplars — " +
    "all 8 joint codes hand-derivable") {
    // Constant 32-dim patterns P_j = j*10; vecs 1-4 are (P0,P0)..(P3,P3)
    // (the by-id init picks them as the 4 centroids in BOTH subspaces),
    // vecs 5-8 mix halves: (P0,P1),(P1,P2),(P2,P3),(P3,P0). Exact
    // matches -> stable Lloyd trajectory; codes = lo*4 + hi.
    def p(j: Int) = Array.fill(32)(j * 10f)
    val emb = Seq(
      (1L, p(0) ++ p(0)), (2L, p(1) ++ p(1)), (3L, p(2) ++ p(2)),
      (4L, p(3) ++ p(3)), (5L, p(0) ++ p(1)), (6L, p(1) ++ p(2)),
      (7L, p(2) ++ p(3)), (8L, p(3) ++ p(0))
    ).toDF("vec_id", "embedding")
    val got = run("q212_pq_codebook", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = Seq(
      (0L, 1L, 1L, 1L, 1L), (1L, 1L, 5L, 5L, 5L), (5L, 1L, 2L, 2L, 2L),
      (6L, 1L, 6L, 6L, 6L), (10L, 1L, 3L, 3L, 3L), (11L, 1L, 7L, 7L, 7L),
      (12L, 1L, 8L, 8L, 8L), (15L, 1L, 4L, 4L, 4L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q213: four singleton buckets — the median of means is the " +
    "interpolated middle, untouched by the outlier the mean swallows") {
    // h2(1..4) % 16 = 6,3,0,12 — all distinct, so each order is its
    // own bucket: means {10,20,40,1000}; median = (20+40)/2 = 30;
    // plain mean = 1070 div 4 = 267.
    val orders = Seq((1L, 10.0), (2L, 20.0), (3L, 40.0), (4L, 1000.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = run("q213_median_of_means", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((4L, 4L, 267L, 30.0, 10L, 1000L)),
      got.mkString(", "))
  }

  test("q214: a feature that determines the label scores IG = H(label); " +
    "single-valued features score exactly 0") {
    // statuses O,O,F,F; priority 1-URGENT for O, 2-HIGH for F; same
    // day and price for all. H(label) = 2*floor(0.5*ln2*1e6 + 0.5) =
    // 693148 micro-nats; cond(priority) = 0 (pure leaves, ln 1 = 0);
    // dow/price have one value -> cond == label -> IG 0.
    val d = ts("2024-03-04T00:00:00Z")
    val orders = Seq(
      (1L, "O", "1-URGENT", d, 10.0), (2L, "O", "1-URGENT", d, 10.0),
      (3L, "F", "2-HIGH", d, 10.0), (4L, "F", "2-HIGH", d, 10.0)
    ).toDF("o_orderkey", "o_orderstatus", "o_orderpriority",
      "o_orderdate", "o_totalprice")
    val got = run("q214_info_gain", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = Seq(
      ("dow", 1L, 693148L, 693148L, 0L),
      ("price_bucket", 1L, 693148L, 693148L, 0L),
      ("priority", 2L, 693148L, 0L, 693148L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q215: hand-iterated 3-round restart walk — a component with no " +
    "seed stays at EXACTLY zero; ranks oscillate along the seed edge") {
    // Trade pairs: cust1(node2)~supp1(node3), cust2(node4)~supp2(node5).
    // Seed = node2 (custkey 1). Hand iteration (scaleU 1e12, d .85,
    // teleU 1.5e11): r1 = (1.5e11, 8.5e11), r2 = (8.725e11, 1.275e11),
    // r3: node2 = 1.5e11 + floor(.85*1.275e11) = 2.58375e11,
    //     node3 = floor(.85*8.725e11) = 7.41625e11; nodes 4/5 = 0.
    val orders = Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1L), (20L, 2L)).toDF("l_orderkey", "l_suppkey")
    val got = run("q215_ppr_cohort", plant("orders" -> orders, "lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = Seq((3L, 741625000000L), (2L, 258375000000L),
      (4L, 0L), (5L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q216: a snippet fully inside a longer doc scores containment " +
    "1.0 where its Jaccard (3/8) would fail q201's gate; the reverse " +
    "direction and unrelated docs stay out") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y z w v")
    ).toDF("doc_id", "text")
    val got = run("q216_containment_join", plant("documents" -> docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1000000L)), got.mkString(", "))
  }

  test("q217: hand-replayed table build and draw census — cf^0.75 " +
    "weights via double-sqrt, 4096 Lehmer probes") {
    // cf: a=4, b=2, c=1 -> weights 2828427/1681793/1000000, wtot
    // 5510220; replaying h2(0..4095) % wtot against the spans lands
    // 2099/1255/742 draws (independently computed).
    val docs = Seq((1L, "a a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = run("q217_neg_sampling", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = Seq(
      ("a", 4L, 2828427L, 513305L, 512451L, 2099L),
      ("b", 2L, 1681793L, 305213L, 306396L, 1255L),
      ("c", 1L, 1000000L, 181480L, 181152L, 742L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q218: time-split honesty — a post-cutoff transition with an " +
    "unseen predecessor counts as uncovered, not as a miss") {
    val d20 = "2024-01-20T"
    val d26 = "2024-01-26T"
    val events = Seq(
      (1L, ts(s"${d20}10:00:00Z"), 1L, "A"), // A->B train
      (2L, ts(s"${d20}11:00:00Z"), 1L, "B"), // B->A train
      (3L, ts(s"${d20}12:00:00Z"), 1L, "A"), // A->B TEST (nts post-cutoff)
      (4L, ts(s"${d26}10:00:00Z"), 1L, "B"), // B->A TEST
      (5L, ts(s"${d26}11:00:00Z"), 1L, "A"),
      (6L, ts(s"${d26}09:00:00Z"), 2L, "C"), // C->D TEST, C unseen
      (7L, ts(s"${d26}10:00:00Z"), 2L, "D")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = run("q218_markov_eval", plant("events" -> events))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // model from train: A->B, B->A; test: A->B hit, B->A hit, C->D
    // uncovered -> 3 test, 2 covered, 2 hits, 666666 ppm, 1e6 ppm
    assert(got.toSeq == Seq((3L, 2L, 2L, 666666L, 1000000L)),
      got.mkString(", "))
  }

  test("q219: a matched click emits its pair; an old orphan click " +
    "emits with NULL view; a click past the final watermark is " +
    "withheld entirely") {
    val t0 = "2024-01-01T00:00:00Z"
    val events = Seq(
      (1L, ts(t0), 1L, "view"),                      // matches click 2
      (2L, ts("2024-01-01T01:00:00Z"), 1L, "click"), // matched
      (3L, ts("2024-01-01T00:30:00Z"), 2L, "click"), // orphan, old -> NULL row
      (4L, ts("2024-01-02T06:00:00Z"), 3L, "click"), // orphan, too new -> held
      (5L, ts("2024-01-02T06:00:00Z"), 9L, "view")   // advances view watermark
    ).toDF("event_id", "ts", "user_id", "event_type")
    // wm = min(max_click, max_view) - 4h = Jan 2 02:00; click 3
    // (00:30) < wm emits unmatched; click 4 (06:00) >= wm is held
    val dir = plant()
    plantFile(dir, "events", events) // single FILE: the stream's layout
    val got = run("q219_stream_outer_join", dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val expected = Seq(
      (2L, Some(1L), 1L, Some(3600000000L)),
      (3L, None, 2L, None))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q220: track-count census with hand-derived durations; the " +
    "corrupt payload lands in INVALID with NULL max") {
    // partkey 1: tsc 900, dur 601, 2 traks -> 601000 div 900 = 667
    // partkey 3: tsc 600, dur 603, 4 traks -> 1005
    // partkey 29: % 29 == 0 -> corrupt ftyp -> INVALID (2 traks, 177 B)
    val part = Seq(1L, 3L, 29L).toDF("p_partkey")
    val got = run("q220_mp4_metadata", plant("part" -> part))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    val expected = Seq(
      ("INVALID", 1L, 0L, None, 177L),
      ("t2", 1L, 667L, Some(667L), 177L),
      ("t4", 1L, 1005L, Some(1005L), 209L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q221: four singleton quartiles — percent_rank thirds on the " +
    "milli grid, cume_dist quarters, nth_value NULL before row 2") {
    val orders = Seq((1L, "P", 10.0), (2L, "P", 20.0), (3L, "P", 30.0),
      (4L, "P", 40.0)).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = run("q221_analytic_suite", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val expected = Seq(
      ("P", 1L, 1L, 10L, 0L, 250L, None),
      ("P", 2L, 1L, 20L, 333L, 500L, Some(2L)),
      ("P", 3L, 1L, 30L, 667L, 750L, Some(2L)),
      ("P", 4L, 1L, 40L, 1000L, 1000L, Some(2L)))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q222: a perfectly linear pre/post relation fits theta = 2, " +
    "adjusts every user to the same value, and zeroes the variance " +
    "ratio while variant means keep their levels") {
    // cust 1 (variant A): x=10, y=20; cust 2 (variant B): x=30, y=60
    // theta = 800/400 = 2, xbar = 20 -> adj = 40 for BOTH users
    val pre = ts("1995-06-01T00:00:00Z")
    val post = ts("1999-06-01T00:00:00Z")
    val orders = Seq(
      (1L, 1L, pre, 10.0), (2L, 1L, post, 20.0),
      (3L, 2L, pre, 30.0), (4L, 2L, post, 60.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = run("q222_cuped_ab", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val expected = Seq(
      ("A", 1L, 20L, 400000L, 0.0),
      ("B", 1L, 60L, 400000L, 0.0))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q223: hand-computed rank test with a cross-variant tie — the " +
    "half-count survives in 2U and the tie term corrects the variance") {
    // h2(.,91)%2: keys 1,3 -> A; keys 2,5 -> B. Values A={10,20},
    // B={20,30}: 2U = 1 (only the tie's half-count), ties term = 6,
    // z = -3 / (2*sqrt(4*(5 - 6/12)/12)) = -1.22474... -> -1.2247
    val orders = Seq((1L, 10.0), (3L, 20.0), (2L, 20.0), (5L, 30.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = run("q223_mann_whitney", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq((2L, 2L, 1L, -1.2247)), got.mkString(", "))
  }

  test("q224: a wide-range file is scanned by every probe (pure I/O " +
    "amplification); tight files skip cleanly") {
    // file 1 (keys 1, 98): {10, 500000}; file 2: {100}; file 3: {1500}
    val d = ts("2024-01-10T00:00:00Z")
    val orders = Seq((1L, d, 10.0), (98L, d, 500000.0), (2L, d, 100.0),
      (3L, d, 1500.0)).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = run("q224_skipping_stats", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val expected = Seq(
      ("p1_low", 3L, 1L, 333333L, 3L, 1L, Some(3000000L)),
      ("p2_mid", 3L, 2L, 666666L, 2L, 0L, None),
      ("p3_high", 3L, 2L, 666666L, 2L, 1L, Some(2000000L)))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q225: only the triple repeated across baskets clears the " +
    "floor; sub-3 and over-cap baskets contribute nothing") {
    // order 1: supps {1,2,3,4}; orders 2,3: {1,2,3} (order 3 with a
    // duplicate line that collect_set must fold); order 4: {5,6}
    // (size 2 -> no triples); order 5: 13 supps -> dropped by the cap
    val li = (Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 1L),
      (4L, 5L), (4L, 6L)) ++
      (10L to 22L).map(s => (5L, s)))
      .toDF("l_orderkey", "l_suppkey")
    val got = run("q225_supplier_triples", plant("lineitem" -> li))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 3L)), got.mkString(", "))
  }

  test("q226: fold balance reflects group ROW mass; the spanning audit " +
    "is zero by construction") {
    // h2(uid, 97) % 5: users 1..6 -> folds 3,2,4,1,0,2
    val events = Seq((1L, 3), (2L, 1), (3L, 1), (4L, 1), (5L, 2), (6L, 2))
      .flatMap { case (u, n) => (1 to n).map(i =>
        (u * 100 + i, ts(f"2024-01-${i}%02dT00:00:00Z"), u)) }
      .toDF("event_id", "ts", "user_id")
    val got = run("q226_group_kfold", plant("events" -> events))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = Seq(
      (0L, 1L, 2L, 200000L, 0L), (1L, 1L, 1L, 100000L, 0L),
      (2L, 2L, 3L, 300000L, 0L), (3L, 1L, 3L, 300000L, 0L),
      (4L, 1L, 1L, 100000L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q227: confusion census covers hit, cross-language miss, und " +
    "fallback, and the es-before-fr tiebreak; recall is per-truth") {
    // en #1 "the of and" -> en (hit); en #2 "le la de" -> fr 3 beats
    // es 2 (miss); fr "xyz" -> no hits -> und; de "der und ist" -> de;
    // es "de" -> es/fr tie at 1, earlier language (es) wins.
    val docs = Seq(
      ("en", "the of and"), ("en", "le la de"), ("fr", "xyz"),
      ("de", "der und ist"), ("es", "de"))
      .toDF("lang", "text")
    val got = run("q227_langid_eval", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // accuracy 3/5 = 600000 ppm on every row; en recall splits 50/50
    val expected = Seq(
      ("de", "de", 1L, 1000000L, 600000L),
      ("en", "en", 1L, 500000L, 600000L),
      ("en", "fr", 1L, 500000L, 600000L),
      ("es", "es", 1L, 1000000L, 600000L),
      ("fr", "und", 1L, 1000000L, 600000L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q228: Theil-Sen median slope shrugs off the spike that drags " +
    "OLS negative-safe trunc on the down-slopes") {
    // daily revenue: d=0 -> 30 (10.5+20.7 floored per row), d=1 -> 50,
    // d=3 -> 20. slopes_u: (0,1)=20e6, (0,3)=-10e6 div 3 = -3333333
    // (toward zero), (1,3)=-15e6. median = -3333333. OLS: n=3 sd=4
    // sr=100 sdd=10 sdr=110 -> (330-400)/(30-16) = -5.0 -> -5e6.
    val orders = Seq(
      (ts("1970-01-01T00:00:00Z"), 10.5),
      (ts("1970-01-01T00:00:00Z"), 20.7),
      (ts("1970-01-02T00:00:00Z"), 50.9),
      (ts("1970-01-04T00:00:00Z"), 20.2))
      .toDF("o_orderdate", "o_totalprice")
    val got = run("q228_theil_sen", plant("orders" -> orders))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq((3L, 3L, -3333333.0, -5000000.0)),
      got.mkString(", "))
  }

  test("q229: Q5 keeps only in-window orders whose supplier shares the " +
    "customer's nation inside the region") {
    // JAPAN: order 1 line via supp 100 (nation match; the CHINA line on
    // the same order fails the match) + order 5; CHINA: order 2;
    // order 3 is out of the date window; order 4 is EUROPE
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "JAPAN", 1), (11, "CHINA", 1), (20, "FRANCE", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((100L, 10), (101L, 11), (102L, 20))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((1000L, 10), (1001L, 11), (1002L, 20))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, 1000L, ts("1996-06-01T00:00:00Z")),
      (2L, 1001L, ts("1996-07-01T00:00:00Z")),
      (3L, 1000L, ts("1995-01-01T00:00:00Z")),
      (4L, 1002L, ts("1996-06-01T00:00:00Z")),
      (5L, 1000L, ts("1996-12-31T00:00:00Z")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1L, 100L, 10.0, 0.0),   // 1000*100 = 100000 -> JAPAN
      (1L, 101L, 99.0, 0.0),   // supp CHINA vs cust JAPAN -> dropped
      (2L, 101L, 20.0, 0.10),  // 2000*90  = 180000 -> CHINA
      (3L, 100L, 50.0, 0.0),   // out of window
      (4L, 102L, 70.0, 0.0),   // EUROPE supplier
      (5L, 100L, 5.5, 0.01))   // 550*99   =  54450 -> JAPAN
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = run("q229_tpch_q5", plant("region" -> region,
        "nation" -> nation, "supplier" -> supplier, "customer" -> customer,
        "orders" -> orders, "lineitem" -> lineitem))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("CHINA", 180000L), ("JAPAN", 154450L)),
      got.mkString(", "))
  }

  test("q230: identical-vector clones land in their anchor's inverted " +
    "list; ADC reads the micro-grid reconstruction, exact rides along") {
    // anchors 0..3 (all-constant 64-dim vectors 0,1,2,3) seed the 4
    // cells; id4 = all-0.1 joins cell 0 (recon mean 0.05 -> m_u 50000),
    // id5 clones anchor 1. Probes = all 6; cells 2/3 are singletons so
    // probes 2/3 retrieve nothing. ADC(0,4) = 2 subspaces × 32 ×
    // 50000² = 16e10; exact = 64 × 100000² = 64e10.
    val emb = Seq(
      (0L, Array.fill(64)(0.0f)), (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(64)(2.0f)), (3L, Array.fill(64)(3.0f)),
      (4L, Array.fill(64)(0.1f)), (5L, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val got = run("q230_ivfpq_adc", plant("embeddings" -> emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = Seq(
      (0L, 1L, 4L, 160000000000L, 640000000000L),
      (1L, 1L, 5L, 0L, 0L),
      (4L, 1L, 0L, 160000000000L, 640000000000L),
      (5L, 1L, 1L, 0L, 0L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q231: two overlapping groups, hand-ranked — mid-rank tie at 2, " +
    "exact H and the tie-corrected H'") {
    // a = {1, 2}, b = {2, 3}: 2R_a = 7, 2R_b = 13 (ranks 1, 2.5, 2.5,
    // 4); terms 3.675/12.675 -> h_u = 16350000 - 15000000 = 1350000;
    // ties T = 6, H' = 1.35/0.9 = 1.5
    val orders = Seq(("a", 1.2), ("a", 2.7), ("b", 2.3), ("b", 3.9))
      .toDF("o_orderpriority", "o_totalprice")
    val got = run("q231_kruskal_wallis", plant("orders" -> orders))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val expected = Seq(
      ("a", 2L, 7L, 3675000L, 1350000L, 1.5),
      ("b", 2L, 13L, 12675000L, 1350000L, 1.5))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q232: RRF merges a lexical-only, a semantic-only, and two " +
    "dual-ranked docs with the exact 1e6 div (60+r) grid") {
    // lex ranks (BM25): doc1 (all 4 terms) > doc0 (2 terms, short) >
    // doc2 (hash twice); doc3 matches nothing. sem ranks from probe 0:
    // doc1 cos .6 > doc2 cos 0 > doc3 cos -1; doc0 is the probe.
    val docs = Seq(
      (0L, "join window"), (1L, "hash join spark window"),
      (2L, "hash hash"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.6f, 0.8f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = run("q232_rrf_fusion", plant("documents" -> docs,
        "embeddings" -> emb))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    val expected = Seq(
      (1L, Some(1L), Some(1L), 32786L),
      (2L, Some(3L), Some(2L), 32002L),
      (0L, Some(2L), None, 16129L),
      (3L, None, Some(3L), 15873L))
    assert(got.toSeq == expected, got.mkString(", "))
  }
}

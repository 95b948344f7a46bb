package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Unit coverage for the north-star extension operators (the t2 oracle
  * covers them end-to-end on fixtures; these pin the local semantics).
  */
class OpsSpec extends EtlSpecBase {
  import spark.implicits._

  // ---- TextOps ----------------------------------------------------------

  test("tokenHash matches the reference formula and is order-sensitive") {
    def refCharHash(s: String): Long =
      s.zipWithIndex.map { case (c, i) =>
        c.toLong * (((i + 1) * 2654435761L) % 1000003L)
      }.sum
    val df = Seq("spark", "kraps").toDF("t")
      .select(col("t"), TextOps.tokenHash(col("t")).as("h")).collect()
    val expected = df.map(r => refCharHash(r.getString(0)) % 1000000007L)
    assert(df.map(_.getLong(1)).toSeq == expected.toSeq)
    assert(df(0).getLong(1) != df(1).getLong(1)) // anagram, different hash
  }

  test("tokenHashesOf / bigramFpsOf match per-token tokenHash and pack " +
      "invertibly") {
    val P = TextOps.HashP
    val toksDf = Seq("a bb ccc").toDF("t")
      .select(TextOps.tokens(col("t")).as("toks"))
    val hs = toksDf.select(TextOps.tokenHashesOf(col("toks")))
      .as[Seq[Long]].head()
    val want = Seq("a", "bb", "ccc").map(w =>
      Seq(w).toDF("x").select(TextOps.tokenHash(col("x"))).as[Long].head())
    assert(hs == want, hs.toString)
    val fps = toksDf.select(TextOps.bigramFpsOf(col("toks")))
      .as[Seq[Long]].head()
    assert(fps == Seq(hs(0) * P + hs(1), hs(1) * P + hs(2)), fps.toString)
    assert(fps.map(f => (f / P, f % P)) == Seq((hs(0), hs(1)), (hs(1), hs(2))))
    // degenerate arities: empty and single-token arrays have no bigrams
    val short = Seq("solo").toDF("t")
      .select(TextOps.bigramFpsOf(TextOps.tokens(col("t"))))
      .as[Seq[Long]].head()
    assert(short.isEmpty, short.toString)
  }

  test("tokenCensusEntriesOf: per-doc distinct counts, first-occurrence " +
      "order, strings stable across rows") {
    val rows = Seq("b a b b", "a a c").toDF("t")
      .select(TextOps.tokenCensusEntriesOf(TextOps.tokens(col("t")))
        .as("census"))
      .as[Seq[(String, Long)]].collect().toSeq
    assert(rows(0) == Seq(("b", 3L), ("a", 1L)), rows(0).toString)
    assert(rows(1) == Seq(("a", 2L), ("c", 1L)), rows(1).toString)
    // exploding the census == the explode+groupBy census (the contract
    // that lets an index build skip the (token, doc)-keyed shuffle)
    val docs = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    val viaKernel = docs.select(col("doc_id"),
        explode(TextOps.tokenCensusEntriesOf(TextOps.tokens(col("text"))))
          .as("e"))
      .select(col("doc_id"), col("e.token"), col("e.c"))
      .orderBy("doc_id", "token")
      .as[(Long, String, Long)].collect().toSeq
    val viaShuffle = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .orderBy("doc_id", "token")
      .as[(Long, String, Long)].collect().toSeq
    assert(viaKernel == viaShuffle, viaKernel.toString)
  }

  test("langId: stopword argmax with first-language tiebreak") {
    val df = Seq(
      "the cat of the house",   // en
      "der hund ist und",       // de
      "der el",                 // de=1 es=1 tie -> de (first in order)
      "xyzzy qwerty").toDF("text")
      .select(TextOps.langId(col("text"))).as[String].collect()
    assert(df.toSeq == Seq("en", "de", "de", "und"))
  }

  test("quality score is in [0,1] and favors long diverse text") {
    val rows = Seq(
      ("short", "a a a a"),
      ("rich", ("the quick brown fox jumps over the lazy dog " * 12).trim))
      .toDF("name", "text")
      .select(col("name"), TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.values.forall(v => v >= 0 && v <= 1))
    assert(rows("rich") > rows("short"))
  }

  // ---- DedupOps ---------------------------------------------------------

  test("shingles: k-grams, distinct, short-doc guard") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(DedupOps.shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty) // < k tokens: empty, not sequence(1,0)
  }

  test("exact jaccard of shingle hash sets") {
    val df = Seq(("a b c d e", "a b c d f")).toDF("x", "y")
      .select(DedupOps.jaccard(
        DedupOps.shingleHashes(col("x")),
        DedupOps.shingleHashes(col("y"))).as("j"))
    // shingles x: {abc,bcd,cde}, y: {abc,bcd,cdf} -> 2/4
    assert(df.as[Double].head() == 0.5)
  }

  test("minhash LSH finds the planted near-dup and skips unrelated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.nearDupPairs(docs, "doc_id", "text",
      numHashes = 12, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: equal texts collide, disjoint texts are distant") {
    val out = Seq(
      "spark scala engine data query",
      "spark scala engine data query",
      "totally different words entirely here")
      .toDF("t").select(DedupOps.simhash32(col("t"))).as[Long].collect()
    assert(out(0) == out(1))
    val xor = out(0) ^ out(2)
    assert(java.lang.Long.bitCount(xor) > 0)
  }

  // ---- SimilarityOps ----------------------------------------------------

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(1f, 0.01f)))
      .toDF("vec_id", "embedding")
    val top = SimilarityOps.bruteForceTopK(vecs, vecs.where($"vec_id" === 0), 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(3L, 1L)) // 3 is closest to [1,0], then 1
  }

  test("annTopK returns exactly-ranked results among bucket candidates") {
    val dims = 64
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dims)(d =>
        (math.sin(i * dims + d) * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val ann = SimilarityOps.annTopK(vecs, vecs.where($"vec_id" < 2), 3,
      tables = 2, bits = 4, dims = dims)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // ranks are 1..k, contiguous per query
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size))
    }
  }

  // ---- MultimodalOps ----------------------------------------------------

  test("multimodal stub decode: binary plumbing end-to-end") {
    val f = MultimodalOps.decodeStub(7L, "ab".getBytes("UTF-8"))
    assert(f.n_bytes == 2 && f.first_byte == 97 && f.checksum == 195)
    val docs = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val out = MultimodalOps.extractFeatures(MultimodalOps.withPayload(docs))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_bytes") == 5)
    assert(out(1).getAs[Int]("n_bytes") == 0 && out(1).getAs[Int]("first_byte") == 0)
    assert(out(0).getAs[scala.collection.Seq[Float]]("fake_embedding").size == 4)
  }

  // ---- EventOps ---------------------------------------------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: exact-gap merges (end-inclusive), beyond-gap splits") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 10:15:00")),  // exactly 10 min after -> MERGES
      (1L, ts("2024-01-01 10:25:01")),  // 10:00.001 after -> new session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val sessions = EventOps.sessionize(events, "10 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(sessions.length == 3)
    assert(sessions(0).getAs[Long]("n") == 3) // 10:00, 10:05, 10:15
    assert(sessions(1).getAs[Long]("n") == 1) // 10:25:01 alone
  }

  test("streaming tumbling counts equal the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.5),
      (ts("2024-01-01 10:55:00"), "click", 2.5),
      (ts("2024-01-01 11:05:00"), "view", 3.0))
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(data: _*)
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventOps.streaming.tumblingCounts(sdf)
      .writeStream.format("memory").queryName("tumble_test")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumble_test")
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = EventOps.tumblingCounts(data.toDF("ts", "event_type", "value"))
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }

  test("asofJoin: latest right row at-or-before, per key; null when none") {
    val clicks = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 09:30:00"), 5.0),
      (1L, ts("2024-01-01 11:00:00"), 7.0),
      (1L, ts("2024-01-01 12:00:00"), 9.0),  // equal ts -> included (>= tie)
      (2L, ts("2024-01-01 10:00:00"), 3.0))  // after the only click of user 2
      .toDF("user_id", "ts", "value")
    val out = EventOps.asofJoin(clicks, purchases, "user_id", "ts")
      .orderBy("event_id")
      .select("event_id", "asof_value").collect()
    assert(out(0).getDouble(1) == 5.0)            // 10:00 -> 09:30 purchase
    assert(out(1).getDouble(1) == 9.0)            // 12:00 -> equal-ts purchase
    assert(out(2).isNullAt(1))                    // user 2: no prior purchase
  }

  test("rangeSelfJoin: bucketed pairs equal the exact range predicate incl. boundary") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:03:00")),
      (1L, 12L, ts("2024-01-01 10:05:30")), // 5:30 after 10 -> out; 2:30 after 11 -> in
      (1L, 13L, ts("2024-01-01 10:20:00")),
      (2L, 20L, ts("2024-01-01 11:00:00")),
      (2L, 21L, ts("2024-01-01 11:05:00"))) // exactly 5 min -> included (<=)
      .toDF("user_id", "event_id", "ts")
    val pairs = EventOps.rangeSelfJoin(events, "user_id", "ts", 5L * 60 * 1000000)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (11L, 12L), (20L, 21L)))
  }

  test("stateful streaming: mapGroupsWithState running counts accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val sdf = stream.toDF().toDF("user_id")
    val q = EventOps.streaming.runningCountsPerUser(sdf)
      .writeStream.format("memory").queryName("ucount_test")
      .outputMode("update").start()
    stream.addData(1L, 1L, 2L)
    q.processAllAvailable()
    stream.addData(1L, 2L, 2L)
    q.processAllAvailable()
    q.stop()
    // last emitted row per user carries the cumulative count
    val finalCounts = spark.table("ucount_test")
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == Map(1L -> 3L, 2L -> 3L))
  }

  test("SQL surface: registered graft_* functions run in spark.sql") {
    graft.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_tokenhash('spark') AS h, graft_pytitle('n/a') AS t,
        |       graft_parse_date('15-03-2023') AS d, graft_simhash32('a b c') AS s
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) ==
      Seq("spark").toDF("x").select(TextOps.tokenHash(col("x"))).as[Long].head())
    assert(row.getString(1) == "N/A")
    assert(row.getDate(2).toString == "2023-03-15")
    assert(row.getLong(3) ==
      Seq("a b c").toDF("x").select(DedupOps.simhash32(col("x"))).as[Long].head())
    val vec = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
        |""".stripMargin).collect()(0)
    assert(vec.getDouble(0) == 11.0)
    assert(vec.getDouble(1) == 1.0)
    // normalizer: NFC-composes the decomposed accent, collapses spaces
    // (NOTE: Spark's chr() wraps at 256 — DuckDB's takes a code point —
    // so the combining mark must be a literal here)
    val norm = spark.sql(
      "SELECT graft_normalize('café  x ') AS n")
      .collect()(0).getString(0)
    assert(norm == "café x", norm)
    // entropy kernel == the Column form; zvalue kernel == the Column form
    val ent = spark.sql("SELECT graft_token_entropy('a b a') AS e")
      .collect()(0).getLong(0)
    assert(ent == Seq("a b a").toDF("x")
      .select(TextOps.tokenEntropyMicro(col("x"))).as[Long].head(), ent.toString)
    val zv = spark.sql("SELECT graft_zvalue(12345L, 54321L) AS z")
      .collect()(0).getLong(0)
    assert(zv == Seq((12345L, 54321L)).toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"))).as[Long].head(), zv.toString)
  }

  test("readStream file source: tumbling counts from a parquet directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val data = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0)).toDF("ts", "event_type", "value")
    data.write.mode("overwrite").parquet(dir)
    val sdf = spark.readStream.schema(data.schema).parquet(dir)
    val q = EventOps.streaming.tumblingCounts(sdf)
      .writeStream.format("memory").queryName("file_tumble_test")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("file_tumble_test").orderBy("ws", "event_type")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", 2L), ("view", 1L)))
  }

  test("flatMapGroupsWithState: sessions emit on gap-close and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val sdf = stream.toDF().toDF("user_id", "ts")
    val q = EventOps.streaming.closedSessions(sdf)
      .writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").start()
    // batch 1: user 1 has an open session (2 events, 5 min apart)
    stream.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    assert(spark.table("fmgws_test").count() == 0) // still open
    // batch 2: an event far beyond the gap closes it in-group AND
    // advances the watermark
    stream.addData((1L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // batch 3: another user's event advances the watermark past the
    // 12:00 session's timeout so IT emits too
    stream.addData((2L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fmgws_test")
      .orderBy("session_start").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // first session: 2 events; second (12:00, 1 event) closed by timeout
    assert(out.take(2) == Seq((1L, 2L), (1L, 1L)))
  }

  test("jsonK extracts the numeric property") {
    val out = Seq("""{"k": 87}""", """{"x": 1}""").toDF("props")
      .select(EventOps.jsonK(col("props"))).as[Option[Int]].collect()
    assert(out(0).contains(87) && out(1).isEmpty)
  }
}

package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 third-wave units: C4-style boilerplate-line removal,
  * token-distribution entropy, chunk-text derivation, and the
  * stream-stream join shape.
  */
class Round7bSpec extends EtlSpecBase {

  import spark.implicits._

  // ---- dropBoilerplateLines ----------------------------------------------

  test("dropBoilerplateLines: hot lines removed, unique lines kept in order") {
    // "nav" appears in 3 docs (minDocs = 3 -> removed); bodies unique
    val df = Seq(
      (1L, "nav\nalpha body\nbeta body"),
      (2L, "nav\ngamma body"),
      (3L, "delta body\nnav"),
      (4L, "epsilon body")).toDF("id", "t")
    val got = TextOps.dropBoilerplateLines(df, "id", "t", 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha body\nbeta body", 1L),
      (2L, "gamma body", 1L),
      (3L, "delta body", 1L),
      (4L, "epsilon body", 0L)), got.toString)
  }

  test("dropBoilerplateLines: all-boilerplate doc survives as empty string") {
    val df = Seq(
      (1L, "promo"), (2L, "promo"), (3L, "promo"),
      (4L, "promo\nreal content")).toDF("id", "t")
    val got = TextOps.dropBoilerplateLines(df, "id", "t", 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "", 1L), (2L, "", 1L), (3L, "", 1L),
      (4L, "real content", 1L)), got.toString)
  }

  test("dropBoilerplateLines: repeats within ONE doc don't make a line hot") {
    // "x" occurs 3 times but in a single doc: count(DISTINCT doc) = 1
    val df = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("id", "t")
    val got = TextOps.dropBoilerplateLines(df, "id", "t", 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "x\nx\nx", 0L), (2L, "y", 0L)), got.toString)
  }

  test("dropBoilerplateLines: null text is total (empty output, zero removed)") {
    val df = Seq((1L, null: String), (2L, "real"), (3L, "real2")).toDF("id", "t")
    val got = TextOps.dropBoilerplateLines(df, "id", "t", 2)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    // the null doc contributes one empty line; only ONE doc has it, so
    // nothing is hot and nothing is removed anywhere
    assert(got == Seq((1L, "", 0L), (2L, "real", 0L), (3L, "real2", 0L)),
      got.toString)
  }

  test("dropBoilerplateLines: rejects minDocs < 2") {
    val df = Seq((1L, "a")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      TextOps.dropBoilerplateLines(df, "id", "t", 1)
    }
  }

  // ---- tokenEntropyMicro --------------------------------------------------

  test("tokenEntropyMicro: uniform = ln(k), constant = 0, empty = 0") {
    val df = Seq(
      (1L, "a b c d"),        // uniform over 4 -> ln(4)
      (2L, "w w w w w"),      // single token -> 0
      (3L, "")).toDF("id", "t")
    val got = df.select(col("id"), TextOps.tokenEntropyMicro(col("t")).as("e"))
      .orderBy("id").as[(Long, Long)].collect().toMap
    val ln4u = math.floor((-(0.25) * math.log(0.25)) * 1e6 + 0.5).toLong * 4
    assert(got(1L) == ln4u, s"uniform-4 entropy: ${got(1L)} vs $ln4u")
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
  }

  test("tokenEntropyMicro: token order never changes the integer sum") {
    val base = "q r r s s s t t t t".split(" ")
    val perms = Seq(base, base.reverse, base.sortBy(_.hashCode))
    val vals = perms.map { p =>
      Seq((1L, p.mkString(" "))).toDF("id", "t")
        .select(TextOps.tokenEntropyMicro(col("t"))).as[Long].head()
    }
    assert(vals.distinct.size == 1, vals.toString)
    // and the value is the hand-computed histogram entropy
    val n = 10.0
    val expect = Seq(1, 2, 3, 4).map { c =>
      math.floor((-(c / n) * math.log(c / n)) * 1e6 + 0.5).toLong
    }.sum
    assert(vals.head == expect, s"${vals.head} vs $expect")
  }

  test("tokenEntropyAgg: the scale path reproduces the kernel exactly") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "w w w w w"), (3L, "q r r s s s t t t t"),
      (4L, "x"), (5L, "one two two three three three")).toDF("id", "t")
    val kernel = docs.select(col("id"),
        TextOps.tokenEntropyMicro(col("t")).as("e"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val agg = TextOps.tokenEntropyAgg(docs, "id", "t")
      .select(col("id"), col("ent_u"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(agg == kernel, s"$agg vs $kernel")
    val ntok = TextOps.tokenEntropyAgg(docs, "id", "t")
      .orderBy("id").select("n_tok").as[Long].collect().toSeq
    assert(ntok == Seq(4L, 5L, 10L, 1L, 6L), ntok.toString)
  }

  // ---- charChunks withText ------------------------------------------------

  test("charChunks withText: chunk text equals the substr derivation") {
    val df = Seq((7L, "abcdefghij")).toDF("id", "text")
    val got = TextOps.charChunks(df, "id", "text", 4, 3, withText = true)
      .orderBy("chunk_idx").select("chunk").as[String].collect().toSeq
    assert(got == Seq("abcd", "defg", "ghij", "j"), got.toString)
  }

  // ---- funnelSteps --------------------------------------------------------

  test("funnelSteps: ordered steps, per-step deadline, non-converters kept") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: full conversion inside deadlines
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: click misses the 6h deadline
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 17:00:00"), "click"),
      // user 3: purchase BEFORE the click doesn't count; none after
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:30:00"), "purchase"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      // user 4: never views (no funnel entry at all)
      (4L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 6)
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    def us(s: String) = ts(s).getTime * 1000
    assert(got == Seq(
      (1L, Some(us("2024-01-01 10:00:00")), Some(us("2024-01-01 11:00:00")),
        Some(us("2024-01-01 12:00:00"))),
      (2L, Some(us("2024-01-01 10:00:00")), None, None),
      (3L, Some(us("2024-01-01 10:00:00")), Some(us("2024-01-01 11:00:00")), None)),
      got.toString)
  }

  test("funnelSteps: earliest qualifying step wins, not any qualifying step") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two clicks qualify; the funnel must anchor the purchase deadline
    // on the EARLIER one (11:00), so the 18:00 purchase misses it
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 15:00:00"), "click"),
      (1L, ts("2024-01-01 18:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnelSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 6)
      .as[(Long, Option[Long], Option[Long], Option[Long])].head()
    assert(got._3.isDefined && got._4.isEmpty, got.toString)
  }

  // ---- scd2Merge ----------------------------------------------------------

  test("scd2Merge: change closes + reopens, no-op and absent keep, insert opens") {
    val current = Seq(
      (1L, "GOLD", 0L), (2L, "SILVER", 0L), (3L, "BRONZE", 0L)
    ).toDF("k", "seg", "valid_from")
    val updates = Seq(
      (1L, "PLATINUM"), // change
      (2L, "SILVER")    // no-op update
      // 3 untouched; 9 is an insert
    ).toDF("k", "seg").union(Seq((9L, "NEW")).toDF("k", "seg"))
    val got = ScdOps.scd2Merge(current, updates, "k", "seg", 7L)
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "GOLD", 0L, Some(7L), false),
      (1L, "PLATINUM", 7L, None, true),
      (2L, "SILVER", 0L, None, true),
      (3L, "BRONZE", 0L, None, true),
      (9L, "NEW", 7L, None, true)), got.toString)
  }

  test("scd2Merge: idempotent re-application of the same batch") {
    val current = Seq((1L, "A", 0L), (2L, "B", 0L)).toDF("k", "seg", "valid_from")
    val updates = Seq((1L, "A2")).toDF("k", "seg")
    val once = ScdOps.scd2Merge(current, updates, "k", "seg", 3L)
    // re-merge the same batch into the CURRENT rows of the result:
    // nothing changes (A2 == A2 is a no-op), so versions don't multiply
    val currentAfter = once.where(col("is_current"))
      .select(col("k"), col("seg"), col("valid_from"))
    val twice = ScdOps.scd2Merge(currentAfter, updates, "k", "seg", 3L)
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(twice == Seq(
      (1L, "A2", 3L, None, true),
      (2L, "B", 0L, None, true)), twice.toString)
  }

  // ---- LayoutOps (Z-order) ------------------------------------------------

  test("zValue: bit-exact against a reference interleave; zBucket bounds both dims") {
    // reference Morton implementation, independent of the Column one
    def spreadRef(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (42L, 99L))
    val df = cases.toDF("a", "b")
    val got = df.select(LayoutOps.zValue(col("a"), col("b"))).as[Long].collect().toSeq
    val expect = cases.map { case (a, b) => spreadRef(a) | (spreadRef(b) << 1) }
    assert(got == expect, s"$got vs $expect")
    // zBucket(z, 2k) fixes both dims' bits above k -> within one
    // bucket each dim spans < 2^k. Verify on the orders fixture.
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val days = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1992-01-01"))).cast("long")
    val spans = o.select(col("o_custkey"), days.as("d"),
        LayoutOps.zBucket(LayoutOps.zValue(col("o_custkey"), days), 20).as("f"))
      .groupBy("f").agg((max("o_custkey") - min("o_custkey")).as("ck_span"),
        (max("d") - min("d")).as("d_span"))
      .agg(max("ck_span"), max("d_span")).as[(Long, Long)].head()
    assert(spans._1 < 1024 && spans._2 < 1024,
      s"bucket spans must be < 2^10: $spans")
  }

  test("zBucket rejects out-of-range shifts") {
    intercept[IllegalArgumentException] { LayoutOps.zBucket(lit(1L), 0) }
    intercept[IllegalArgumentException] { LayoutOps.zBucket(lit(1L), 32) }
  }

  // ---- CheckOps -----------------------------------------------------------

  test("CheckOps.validate: every rule counts exactly its planted violations") {
    val df = Seq(
      (Some(1L), "a", "O", 10.0),
      (None, "b", "O", 20.0),     // not_null violation
      (Some(3L), "b", "F", -5.0), // unique dup + in_range violation
      (Some(4L), "c", "X", 30.0), // accepted_values violation
      (None, "c", "O", 600.0)     // not_null + unique dup + in_range
    ).toDF("k", "v", "status", "price")
    val got = CheckOps.validate(df, Seq(
        CheckOps.NotNull("k"), CheckOps.Unique("v"),
        CheckOps.AcceptedValues("status", Seq("O", "F")),
        CheckOps.InRange("price", 0d, 500d)))
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("accepted_values", "status", 1L),
      ("in_range", "price", 2L),
      ("not_null", "k", 2L),
      ("unique", "v", 2L)), got.toString)
  }

  test("CheckOps: null comparisons don't count toward value rules; empty rules rejected") {
    // nulls are the not_null rule's business, never in_range/accepted's
    val df = Seq[(Option[Double], Option[String])](
      (None, None), (Some(1.0), Some("O"))).toDF("p", "s")
    val got = CheckOps.validate(df, Seq(
        CheckOps.InRange("p", 0d, 10d),
        CheckOps.AcceptedValues("s", Seq("O"))))
      .as[(String, String, Long)].collect().toSeq
    assert(got.forall(_._3 == 0L), got.toString)
    intercept[IllegalArgumentException] { CheckOps.validate(df, Seq.empty) }
    intercept[IllegalArgumentException] { CheckOps.InRange("p", 5d, 1d) }
    intercept[IllegalArgumentException] { CheckOps.AcceptedValues("s", Seq.empty) }
  }

  // ---- streaming foreachBatch -> JDBC serving sink ------------------------

  test("foreachBatch JDBC sink: stream lands in Derby, replay overwrites idempotently") {
    import graft.etl.Io
    val dir = java.nio.file.Files.createTempDirectory("graft_fb_jdbc").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0)).toDF("ts", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)
    val db = "graft_fb_jdbc_test"
    val url = s"jdbc:derby:memory:$db;create=true"
    try {
      def runOnce(): Unit = {
        val q = EventOps.tumblingCounts(
            spark.readStream.schema(events.schema).parquet(dir))
          .writeStream.outputMode("complete")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            Io.writeJdbc(df, url, "window_counts")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      runOnce() // replay: overwrite-replace keeps the table identical
      val got = Io.readJdbc(spark, url, "window_counts")
        .orderBy("ws", "event_type")
        .select("event_type", "n").as[(String, Long)].collect().toSeq
      assert(got == Seq(("click", 2L), ("view", 1L)), got.toString)
    } finally Io.dropDerbyInMemory(db)
  }

  // ---- stream-stream join shape ------------------------------------------

  test("stream-stream inner join: in-window pairs only, state watermark-bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_join").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "view", 0.0),
      (2L, ts("2024-01-01 10:30:00"), 5L, "click", 0.0),  // 30 min after view -> match
      (3L, ts("2024-01-01 14:00:00"), 5L, "click", 0.0),  // 4h after view -> no match
      (4L, ts("2024-01-01 10:10:00"), 6L, "view", 0.0),
      (5L, ts("2024-01-01 10:05:00"), 6L, "click", 0.0)   // click BEFORE view -> no match
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)
    def src() = spark.readStream.schema(events.schema).parquet(dir)
    val clicks = src().where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .withWatermark("cts", "4 hours")
    val views = src().where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vuid"), col("ts").as("vts"))
      .withWatermark("vts", "4 hours")
    val q = clicks.join(views,
        expr("user_id = vuid AND vts <= cts AND vts >= cts - interval 2 hours"))
      .select(col("click_id"), col("view_id"))
      .writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss_join_test").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 1L)), got.toString)
  }
}

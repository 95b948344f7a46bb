package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops._

/** Round-7 third wave: C4-style boilerplate-line removal, the
  * stream-stream join (the one core Structured Streaming shape the
  * portfolio still lacked), a composed RAG retrieval pipeline
  * (chunk → BM25 over chunks), and token-distribution entropy. Each
  * beyond the reference surface (SURVEY.md §7.5 north-star scope)
  * with a full DuckDB oracle.
  */
object Round7bQueries {

  // -- q90: boilerplate line removal (C4-style) -----------------------------
  // The fixture corpus has no line structure, so both engines plant
  // the SAME boilerplate deterministically (the q89 discipline):
  // every 5th doc gets a "subscribe" header line, every 7th a
  // "copyright" footer line. With minDocs = 5 the planted lines are
  // hot (~100 docs each at sf0.001) and removed; body lines survive.
  private val BoilerHead = "subscribe to our newsletter today"
  private val BoilerFoot = "copyright example all rights reserved"
  private val BoilerMinDocs = 5L

  private def q90(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val withHead = when(col("doc_id") % 5 === 0,
      concat(lit(BoilerHead + "\n"), col("text"))).otherwise(col("text"))
    val dirty = when(col("doc_id") % 7 === 0,
      concat(withHead, lit("\n" + BoilerFoot))).otherwise(withHead)
    TextOps.dropBoilerplateLines(
        d.select(col("doc_id"), dirty.as("t")), "doc_id", "t", BoilerMinDocs)
      .orderBy("doc_id")
  }

  private val q90Oracle: String = {
    val dirtyCtes =
      s"""__d0 AS (SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN '$BoilerHead' || chr(10) || text
         |         ELSE text END AS t0
         |  FROM documents),
         |__dirty AS (SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN t0 || chr(10) || '$BoilerFoot'
         |         ELSE t0 END AS t
         |  FROM __d0)""".stripMargin
    TextOps.dropBoilerplateLinesSql("__dirty", "doc_id", "t",
      BoilerMinDocs, extraCtes = dirtyCtes) + "\nORDER BY doc_id"
  }

  // -- q91: stream-stream join (click ← view attribution) -------------------
  // Each click joined to the same user's views in the preceding two
  // hours — the canonical ad-attribution stream-stream inner join.
  // Watermarks on BOTH sides bound the join state (Spark evicts a
  // view row once its watermark passes click-ts - 2h); inner-join
  // matches emit eagerly, so AvailableNow + memory sink sees every
  // pair. Streaming == batch == the SQL oracle, like q47/q69/q75/q87.
  //
  // Cost note (VERDICT r7 #8): the two `eventStream()` calls below are
  // two physical source scans BY CONSTRUCTION, and that is inherent to
  // a Spark stream-stream self-join — each side of the join needs its
  // own watermark column and its own per-side state store, and reusing
  // one readStream DataFrame for both sides still plans two
  // StreamingRelation source nodes (Spark has no streaming common-
  // subplan reuse; the only single-scan alternative is materializing
  // through an intermediate sink, which trades the extra read for an
  // extra write plus end-to-end latency). The doubled source I/O is
  // the documented price of the operator, not an accident.
  private def q91(spark: SparkSession, sfDir: String): DataFrame = {
    def eventStream(): DataFrame = Tables.eventsStream(spark, sfDir)
    val clicks = eventStream().where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
      .withWatermark("cts", "4 hours")
    val views = eventStream().where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vuid"),
        col("ts").as("vts"))
      .withWatermark("vts", "4 hours")
    val joined = clicks.join(views,
        expr("user_id = vuid AND vts <= cts AND vts >= cts - interval 2 hours"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        (unix_micros(col("cts")) - unix_micros(col("vts"))).as("lag_us"))
    val sink = "graft_q91_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("click_id", "view_id")
  }

  private val q91Oracle: String =
    """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
      |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
      |FROM events c JOIN events v
      |  ON c.user_id = v.user_id
      | AND c.event_type = 'click' AND v.event_type = 'view'
      | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 2 HOUR
      |ORDER BY click_id, view_id""".stripMargin

  // -- q92: RAG passage retrieval (chunk → BM25) ----------------------------
  // The composed retrieval pipeline: overlapping 200/150 chunking
  // (q70's generator) feeds chunk-level BM25 top-k (q81's scorer) —
  // the passage index a RAG system actually queries. chunk_key packs
  // (doc_id, chunk_idx) into one BIGINT with a DATA-DERIVED multiplier:
  // charChunks emits chunk_idx ∈ [0, (len-1) div stride], so
  // max((length(text)-1) div 150) + 1 over the corpus strictly bounds
  // every chunk_idx — computed by a THIN one-row aggregate over
  // documents (ADVICE r8: the previous max(chunk_idx) form evaluated
  // the whole posexplode chunk subtree twice). The packing stays
  // collision-free while max(doc_id)·mult fits in a BIGINT — ~2^40
  // docs at fixture-scale chunk counts; beyond that pack into a
  // struct key instead of arithmetic. That bound is ENFORCED, not
  // assumed: the same one-row aggregate also carries max(doc_id),
  // and the packing expression raise_errors if
  // max(doc_id) > Long.MaxValue/mult - 1 (overflow-safe division
  // form; non-ANSI Spark would otherwise wrap silently and corrupt
  // keys) — the guard costs one branch on two broadcast literals.
  private val RagTerms = Seq("hash", "join", "spark", "window")
  private val RagK = 20

  private def q92(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    val mult = docs.where(length(col("text")) > 0)
      .agg((max(expr("(length(text) - 1) div 150")) + 1)
        .cast("long").as("__m"),
        max(col("doc_id")).cast("long").as("__maxdoc"))
    val raw = TextOps.charChunks(docs, "doc_id", "text",
      200, 150, withText = true)
    // fits iff maxdoc*m + (m-1) <= Long.MaxValue, checked without
    // overflowing the check itself: maxdoc <= LongMax/m - 1
    val fits = col("__maxdoc") <= lit(Long.MaxValue) / col("__m") - 1
    val packed = when(fits, col("doc_id") * col("__m") + col("chunk_idx"))
      .otherwise(raise_error(lit(
        "q92 chunk_key would overflow BIGINT: pack (doc_id, chunk_idx) " +
          "into a struct key instead")).cast("long"))
    val chunks = raw.crossJoin(broadcast(mult))
      .select(packed.as("chunk_key"), col("chunk"))
    TextOps.bm25TopK(chunks, "chunk_key", "chunk", RagTerms, RagK)
  }

  private val q92Oracle: String = {
    val multSql = "(SELECT CAST(max((length(text) - 1) // 150) + 1 AS BIGINT) " +
      "FROM documents WHERE length(text) > 0)"
    val chunkCte =
      s"""__raw AS (${TextOps.charChunksSql("documents", "doc_id", "text", 200, 150)}),
         |__chunks AS (SELECT doc_id * $multSql
         |    + chunk_idx AS chunk_key, chunk
         |  FROM __raw)""".stripMargin
    TextOps.bm25TopKSql("__chunks", "chunk_key", "chunk", RagTerms, RagK,
      extraCtes = chunkCte)
  }

  // -- q93: token-distribution entropy --------------------------------------
  // Shannon entropy of each doc's token histogram in integer
  // micro-nats — the cheap gibberish/template detector. Per-term
  // contributions are floored onto a 1e-6 grid and integer-summed, so
  // the result is order-independent. Runs the explode+aggregate SCALE
  // path (TextOps.tokenEntropyAgg — the per-row higher-order form
  // measured 9.5 s at sf0.1, this one is sub-second); the kernel and
  // the agg form share one oracle.
  private def q93(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.tokenEntropyAgg(
        Tables.read(spark, sfDir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val q93Oracle: String =
    s"""SELECT doc_id,
       |  CAST(${TextOps.nTokensSql("text")} AS BIGINT) AS n_tok,
       |  CAST(${TextOps.tokenEntropyMicroSql("text")} AS BIGINT) AS ent_u
       |FROM documents ORDER BY doc_id""".stripMargin

  // -- q94: ordered funnel analysis -----------------------------------------
  // view -> click -> purchase, each step within 6 hours of the prior
  // step's first completion. Per-user stage timestamps (epoch µs),
  // null from the first stage the user never reached.
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val FunnelDeadlineH = 6

  private def q94(spark: SparkSession, sfDir: String): DataFrame =
    EventOps.funnelSteps(Tables.read(spark, sfDir, "events"),
        "user_id", "ts", "event_type", FunnelSteps, FunnelDeadlineH)
      .orderBy("user_id")

  private val q94Oracle: String =
    EventOps.funnelStepsSql("user_id", "ts", "event_type",
      FunnelSteps, FunnelDeadlineH) + "\nORDER BY user_id"

  // -- q95: SCD-2 dimension merge -------------------------------------------
  // The warehouse MERGE: customer segment as the tracked attribute,
  // with a planted update batch derived from the table itself (both
  // engines build the identical batch): every 10th key changes to
  // PROMO, every (10k+1)th gets a no-op update, keys 1-5 re-enter as
  // brand-new +1M surrogates. NULL-attr branches are planted too, so
  // the driver's hash gate locks in ScdOps' null-safe compare
  // (VERDICT r8 #6): keys %10∈{3,6} carry a NULL segment in the
  // CURRENT dimension; the batch then sends NULL to the 3s (NULL→NULL
  // must be a no-op, not a close+reopen) and 'RESET' to the 6s
  // (NULL→value must version), and value→NULL rides the 4s.
  private def q95(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
    val nullStr = lit(null).cast("string")
    val current = cust.select(col("c_custkey"),
      when(col("c_custkey") % 10 === 3 || col("c_custkey") % 10 === 6,
        nullStr).otherwise(col("c_mktsegment")).as("c_mktsegment"),
      lit(0L).as("valid_from"))
    val updates = cust.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), lit("PROMO").as("c_mktsegment"))
      .union(cust.where(col("c_custkey") % 10 === 1)
        .select(col("c_custkey"), col("c_mktsegment")))
      .union(cust.where(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"), nullStr.as("c_mktsegment")))
      .union(cust.where(col("c_custkey") % 10 === 4)
        .select(col("c_custkey"), nullStr.as("c_mktsegment")))
      .union(cust.where(col("c_custkey") % 10 === 6)
        .select(col("c_custkey"), lit("RESET").as("c_mktsegment")))
      .union(cust.where(col("c_custkey") <= 5)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          col("c_mktsegment")))
    ScdOps.scd2Merge(current, updates, "c_custkey", "c_mktsegment", 1L)
      .orderBy("c_custkey", "valid_from")
  }

  private val q95Oracle: String = {
    val cur = "SELECT c_custkey, CASE WHEN c_custkey % 10 IN (3, 6) THEN NULL " +
      "ELSE c_mktsegment END AS c_mktsegment, CAST(0 AS BIGINT) AS valid_from FROM customer"
    val upd = "SELECT c_custkey, 'PROMO' AS c_mktsegment FROM customer WHERE c_custkey % 10 = 0 " +
      "UNION ALL SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 10 = 1 " +
      "UNION ALL SELECT c_custkey, CAST(NULL AS VARCHAR) FROM customer WHERE c_custkey % 10 = 3 " +
      "UNION ALL SELECT c_custkey, CAST(NULL AS VARCHAR) FROM customer WHERE c_custkey % 10 = 4 " +
      "UNION ALL SELECT c_custkey, 'RESET' FROM customer WHERE c_custkey % 10 = 6 " +
      "UNION ALL SELECT c_custkey + 1000000, c_mktsegment FROM customer WHERE c_custkey <= 5"
    ScdOps.scd2MergeSql(cur, upd, "c_custkey", "c_mktsegment", 1L) +
      "\nORDER BY c_custkey, valid_from"
  }

  // -- q96: Z-order layout stats --------------------------------------------
  // Morton-interleave (o_custkey, order-date-days) and report per
  // Z-prefix bucket: row count and both dims' min/max — the row-group
  // stats a Z-sorted write would give a scan planner. The per-bucket
  // spans are bounded by construction (shift 20 -> each dim's high
  // bits fixed within a bucket), which is the data-skipping claim,
  // and the spec asserts it.
  private val ZShift = 20

  private def q96(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
    val days = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1992-01-01"))).cast(LongType)
    val z = LayoutOps.zValue(col("o_custkey"), days)
    o.select(col("o_custkey"), days.as("__days"),
        LayoutOps.zBucket(z, ZShift).as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("o_custkey").as("ck_min"), max("o_custkey").as("ck_max"),
        min("__days").as("d_min"), max("__days").as("d_max"))
      .orderBy("file_id")
  }

  private val q96Oracle: String = {
    val days = "CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01') AS BIGINT)"
    val z = LayoutOps.zValueSql("o_custkey", days)
    s"""WITH __z AS (SELECT o_custkey, $days AS days,
       |    ${LayoutOps.zBucketSql(z, ZShift)} AS file_id
       |  FROM orders)
       |SELECT file_id, count(*) AS n,
       |  min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
       |  min(days) AS d_min, max(days) AS d_max
       |FROM __z GROUP BY file_id ORDER BY file_id""".stripMargin
  }

  // -- q97: day-2 incremental curation pipeline -----------------------------
  // The composed COMPLEMENT of q67 (which curates day-1 from scratch):
  // a new ingest batch lands against an existing curated corpus —
  //   1. incremental dedup   drop exact re-crawls of the corpus AND
  //                          in-batch copies (q72's verified operator)
  //   2. quality floor       q16's scorer, survivors only
  //   3. per-source quota    cap each source's contribution, best-
  //                          quality-first (q85's operator)
  //   4. seeded shuffleShard day-2 shards in a FRESH shard space
  //                          (different seed than day-1 — appends never
  //                          rewrite day-1 files)
  // Planted batch (rendered identically by both engines): every 5th
  // corpus doc re-crawled verbatim (+3M ids, dropped by stage 1), every
  // 3rd doc re-submitted with new tail content (+4M, kept), and every
  // 15th of THOSE duplicated in-batch (+5M, min-id survivor).
  private val Day2Seed = 43L
  private val Day2Shards = 4
  private val Day2Quality = 0.3
  // binds at every SF (≈8 survivors/source at sf0.001)
  private val Day2Quota = 6

  private def q97(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val corpus = d.select("doc_id", "text")
    val batch = d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"),
          col("source"))
      .unionByName(d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" fresh day two tail")).as("text"),
          col("source")))
      .unionByName(d.where(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" fresh day two tail")).as("text"),
          col("source")))
    val s1 = DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
    val survivors = batch.join(s1.select(col("id").as("doc_id"), col("fp")),
      Seq("doc_id"))
    val s2 = survivors
      .withColumn("score", Norm.n4(TextOps.qualityScore(col("text"))))
      .where(col("score") >= Day2Quality)
    val s3 = MixOps.perKeyQuota(s2, "source",
      Seq(col("score").desc, col("doc_id").asc), Day2Quota)
    MixOps.shuffleShard(s3, "doc_id", Day2Seed, Day2Shards)
      .select(col("doc_id"), col("source"), col("fp"),
        col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  private val q97Oracle: String = {
    val fp = graft.ops.TextOps.fingerprintSql("text")
    val fpC = graft.ops.TextOps.fingerprintSql("c.text")
    val quality = graft.ops.TextOps.qualityScoreSql("b.text")
    s"""WITH batch AS (
       |  SELECT doc_id + 3000000 AS doc_id, text, source FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 4000000, text || ' fresh day two tail', source FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 5000000, text || ' fresh day two tail', source FROM documents WHERE doc_id % 15 = 0),
       |brep AS (SELECT min(doc_id) AS id, text, $fp AS fp
       |         FROM batch GROUP BY text),
       |s1 AS (SELECT r.id, r.fp FROM brep r
       |       WHERE NOT EXISTS (SELECT 1 FROM documents c
       |                         WHERE $fpC = r.fp AND c.text = r.text)),
       |s2 AS (SELECT b.doc_id, b.source, s1.fp,
       |         ${graft.etl.OracleSql.n4(quality)} AS score
       |       FROM batch b JOIN s1 ON b.doc_id = s1.id),
       |s2q AS (SELECT * FROM s2 WHERE score >= $Day2Quality),
       |s3 AS (SELECT doc_id, source, fp FROM (
       |         SELECT *, row_number() OVER (PARTITION BY source
       |                    ORDER BY score DESC, doc_id) AS rk FROM s2q)
       |       WHERE rk <= $Day2Quota),
       |h1 AS (SELECT *, ((doc_id % ${MixOps.P} + $Day2Seed) * 48271) % ${MixOps.P} AS h1 FROM s3),
       |sh AS (SELECT doc_id, source, fp,
       |         CAST(h1 % $Day2Shards AS INTEGER) AS shard,
       |         ((h1 + 1) * 69621) % ${MixOps.P} AS h2
       |       FROM h1)
       |SELECT doc_id, source, fp, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id)
       |       AS INTEGER) AS pos
       |FROM sh ORDER BY shard, pos""".stripMargin
  }

  // -- q98: streaming -> JDBC serving sink (foreachBatch) -------------------
  // The missing streaming SINK shape: the tumbling aggregation streams
  // into an embedded-Derby table via foreachBatch with
  // overwrite-replace per micro-batch — the idempotent serving-table
  // recipe (a replayed batch rewrites the same rows; no dedup ledger
  // needed). Result = the table READ BACK over JDBC, so the oracle
  // (q26/q47's tumbling SQL) verifies the whole stream->DB->scan loop.
  private def q98(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val agged = EventOps.tumblingCounts(stream.withWatermark("ts", "2 hours"))
    val db = s"graft_q98_${spark.sparkContext.applicationId}"
    val url = s"jdbc:derby:memory:$db;create=true"
    StreamTuning.withStateParts(spark) {
      val q = agged.writeStream
        .outputMode("complete")
        .foreachBatch { (df: DataFrame, _: Long) =>
          graft.etl.Io.writeJdbc(df, url, "window_counts")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out = graft.etl.Io.readJdbc(spark, url, "window_counts")
      .orderBy("ws", "event_type")
      .localCheckpoint(true) // materialize before dropping the database
    graft.etl.Io.dropDerbyInMemory(db)
    out
  }

  // -- q99: windowed approximate-distinct users -----------------------------
  // Per-tumbling-window unique-user counts the scale way: an HLL
  // sketch per window (mergeable, no per-window value shuffle beyond
  // the window key) gated against the exact count in the q62 style —
  // the oracle hashes (ws, exact, within_5pct must be TRUE). Exact and
  // sketch live in SEPARATE aggregates joined on the window start
  // (q62's Expand-avoidance: countDistinct alone plans as two plain
  // hash aggregates; mixing it with another aggregate compiles to a
  // 2x-replicating Expand).
  private def q99(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.read(spark, sfDir, "events")
    def ws(df: DataFrame) = df
      .groupBy(window(col("ts"), "1 hour").as("w"))
    val exact = ws(e).agg(countDistinct(col("user_id")).as("n_exact"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("n_exact"))
    val approx = ws(e).agg(approx_count_distinct(col("user_id"), 0.01).as("ap"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("ap"))
    exact.join(approx, "ws")
      .select(col("ws"), col("n_exact"),
        (abs(col("ap") - col("n_exact")) <= lit(0.05) * col("n_exact"))
          .as("within_5pct"))
      .orderBy("ws")
  }

  private val q99Oracle: String =
    """SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS ws,
      |  count(DISTINCT user_id) AS n_exact, true AS within_5pct
      |FROM events GROUP BY 1 ORDER BY ws""".stripMargin

  // -- q100: cohort retention matrix ----------------------------------------
  // Users cohorted by first-activity week (Monday-truncated on both
  // engines); for each (cohort, weeks-since) cell, how many of the
  // cohort's users were active that week — the classic retention
  // triangle. Scale shape: one user-keyed min-aggregate (cohort), one
  // distinct (user, week) aggregate, a broadcast-or-hash join back on
  // user, then a small (cohort, week) count — every exchange keys on
  // user or the tiny cell grid.
  private def q100(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.read(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohorts = e.groupBy("user_id").agg(min("wk").as("cohort"))
    val active = e.distinct()
    active.join(cohorts, "user_id")
      .groupBy(unix_timestamp(col("cohort")).as("cohort_ws"),
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort"))) / 604800L)
          .cast("int").as("week_n"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort_ws", "week_n")
  }

  private val q100Oracle: String =
    """WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |cohorts AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
      |active AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT epoch(cohort)::BIGINT AS cohort_ws,
      |  CAST((epoch(wk) - epoch(cohort)) / 604800 AS INTEGER) AS week_n,
      |  count(DISTINCT a.user_id) AS users
      |FROM active a JOIN cohorts USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_ws, week_n""".stripMargin

  // -- q101: declarative data-quality validation ----------------------------
  // dbt-test-style rule set compiled into ONE aggregate pass, with
  // violations planted deterministically on both engines: every 7th
  // order loses its custkey (not_null), dup_key = orderkey % 1000
  // (unique), status 'P' sits outside the accepted {'O','F'} set, and
  // every 11th price flips negative (in_range).
  private val CheckRules: Seq[CheckOps.Rule] = Seq(
    CheckOps.NotNull("o_custkey"),
    CheckOps.Unique("dup_key"),
    CheckOps.AcceptedValues("o_orderstatus", Seq("O", "F")),
    CheckOps.InRange("o_totalprice", 0d, 500000d))

  private def q101(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
    val dirty = o.select(
      when(col("o_orderkey") % 7 === 0, lit(null))
        .otherwise(col("o_custkey")).as("o_custkey"),
      (col("o_orderkey") % 1000).as("dup_key"),
      col("o_orderstatus"),
      when(col("o_orderkey") % 11 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"))
    CheckOps.validate(dirty, CheckRules)
  }

  private val q101Oracle: String =
    s"""WITH __dirty AS (SELECT
       |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
       |    o_orderkey % 1000 AS dup_key,
       |    o_orderstatus,
       |    CASE WHEN o_orderkey % 11 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
       |  FROM orders)
       |${CheckOps.validateSql("__dirty", CheckRules)}""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q90_boilerplate_lines", q90, Some(q90Oracle)),
    QueryDef("q91_stream_attribution", q91, Some(q91Oracle)),
    QueryDef("q92_rag_retrieval", q92, Some(q92Oracle)),
    QueryDef("q93_token_entropy", q93, Some(q93Oracle)),
    QueryDef("q94_funnel", q94, Some(q94Oracle)),
    QueryDef("q95_scd2_merge", q95, Some(q95Oracle)),
    QueryDef("q96_zorder_stats", q96, Some(q96Oracle)),
    QueryDef("q97_incremental_pipeline", q97, Some(q97Oracle)),
    QueryDef("q98_stream_jdbc_sink", q98, Some(EventOps.tumblingSql)),
    QueryDef("q99_window_distinct", q99, Some(q99Oracle)),
    QueryDef("q100_cohort_retention", q100, Some(q100Oracle)),
    QueryDef("q101_data_checks", q101, Some(q101Oracle)),
  )
}

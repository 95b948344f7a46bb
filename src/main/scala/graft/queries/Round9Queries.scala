package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, MixOps, ScdOps, SketchOps, StatsOps, TextOps}

/** Round-9 additions: CDC log compaction and Count-Min heavy hitters. */
object Round9Queries {

  // -- q125: CDC log compaction ---------------------------------------------
  // A deterministic change log derived from orders (both engines build
  // the identical feed): key = o_custkey, offset = o_orderkey (unique,
  // totally ordered), every 7th offset is a delete, payload =
  // (o_totalprice, o_orderstatus) — with NULL payload columns
  // sprinkled in (every 11th offset NULLs the status, every 13th the
  // price) so the gate exercises the real-feed case where the
  // highest-seq row carries NULLs: the compacted state must surface
  // those NULLs, not resurrect stale values (the row-atomicity
  // contract of max_by(struct, seq); see cdcApplySql's struct
  // arg_max note). Fixture-verified (round 11, DuckDB census): the
  // highest-seq entry is a NULL-price upsert for 13/85/982 keys and a
  // NULL-status upsert for 10/120/1189 keys at sf0.001/0.01/0.1 — the
  // driver gate provably exercises the NULL-at-top path at every SF.
  // Current state = highest-offset entry per key,
  // gone if that entry is a delete — ONE map-side-combining max_by
  // aggregate (ScdOps.cdcApply).
  private def q125(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.read(spark, sfDir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, "delete").otherwise("upsert").as("op"),
      when(col("o_orderkey") % 13 === 0, lit(null))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % 11 === 0, lit(null))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"))
    ScdOps.cdcApply(log, "o_custkey", "o_orderkey", "op",
        Seq("o_totalprice", "o_orderstatus"))
      .orderBy("o_custkey")
  }

  private val q125Oracle: String = {
    val log = "SELECT o_custkey, o_orderkey, CASE WHEN o_orderkey % 7 = 0 " +
      "THEN 'delete' ELSE 'upsert' END AS op, " +
      "CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice, " +
      "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus " +
      "FROM orders"
    ScdOps.cdcApplySql(log, "o_custkey", "o_orderkey", "op",
      Seq("o_totalprice", "o_orderstatus")) + "\nORDER BY o_custkey"
  }

  // -- q126: Count-Min heavy hitters ----------------------------------------
  // Exact top-25 suppliers by lineitem rows, each verified against its
  // Count-Min estimate (4 x 1024 sketch, over_cnt = est - exact >= 0
  // by construction) — the sketch-vs-truth pattern of q62/q64/q99 for
  // the frequency-sketch family.
  private def q126(spark: SparkSession, sfDir: String): DataFrame =
    SketchOps.cmsTopK(Tables.read(spark, sfDir, "lineitem"),
      "l_suppkey", 25)

  private val q126Oracle: String =
    SketchOps.cmsTopKSql("lineitem", "l_suppkey", 25)

  // -- q127: bucketed co-located join ---------------------------------------
  // The 100 TB join strategy made demonstrable: orders and customer
  // are written as 8-bucket hash-bucketed, bucket-sorted tables on
  // o_custkey/c_custkey (LayoutOps.writeBucketed), then joined and
  // rolled up per market segment. Because both sides are bucketed by
  // the join key into the same bucket count, the SortMergeJoin reads
  // buckets pairwise and NEITHER SIDE SHUFFLES — the only exchange in
  // the plan is the 5-group segment rollup (plan-asserted). The merge
  // hint pins SMJ (a broadcast would hide the co-location the query
  // exists to prove). Revenue folds as floor(o_totalprice) BIGINTs so
  // the sum is order-independent and exact on both engines.
  /** Delete /tmp leftovers from PAST sessions' roundtrip writes (the
    * per-applicationId naming means mode-overwrite never reclaims
    * them). Age-gated at 72 h — well past any session's lifetime
    * (multi-hour sessions are documented in BASELINE.md, so a 12 h
    * gate could have deleted a long-lived sibling's registered
    * bucketed table out from under it; 72 h cannot) — so a
    * concurrently-running sibling session is never touched.
    */
  private def sweepStaleTmp(prefix: String): Unit = {
    val cutoff = System.currentTimeMillis() - 72L * 3600 * 1000
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.lastModified() < cutoff)
      .foreach { f =>
        try org.apache.spark.network.util.JavaUtils.deleteRecursively(f)
        catch { case scala.util.control.NonFatal(_) => () }
      }
  }

  private def q127(spark: SparkSession, sfDir: String): DataFrame = {
    sweepStaleTmp("graft_q127_")
    val tag = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val (to, tc) = (s"graft_q127_orders_$tag", s"graft_q127_customer_$tag")
    LayoutOps.writeBucketed(
      Tables.read(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      to, s"/tmp/$to", "o_custkey", 8)
    LayoutOps.writeBucketed(
      Tables.read(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
      tc, s"/tmp/$tc", "c_custkey", 8)
    val ob = spark.table(to)
    val cb = spark.table(tc)
    ob.hint("merge").join(cb, ob("o_custkey") === cb("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice")).cast("long")).as("rev_floor"),
        max(col("o_custkey")).as("max_custkey"))
      .orderBy("c_mktsegment")
  }

  private val q127Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev_floor,
      |  max(o_custkey) AS max_custkey
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -- q128: weighted sampling (A-ES) ---------------------------------------
  // Quality-weighted curation sampling: 20 docs per source, inclusion
  // probability rising in n_chars (the weight stand-in), every draw a
  // pure function of (doc_id, seed) — the deterministic
  // Efraimidis-Spirakis reservoir (MixOps.weightedSample).
  private val WsK = 20
  private val WsSeed = 42L

  private def q128(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.weightedSample(Tables.read(spark, sfDir, "documents"),
      "doc_id", "source", "n_chars", WsK, WsSeed)

  private val q128Oracle: String =
    MixOps.weightedSampleSql("documents", "doc_id", "source", "n_chars",
      WsK, WsSeed)

  // -- q129: partitioned write + pruned read --------------------------------
  // The other half of on-disk data skipping (q127 proves bucket
  // co-location): orders re-written hive-partitioned by order YEAR,
  // then a one-year query reads back through the partition column.
  // The plan guard proves the year predicate lands in
  // `PartitionFilters` (directory pruning at plan time — at 100 TB
  // the other years' files are never even listed into the scan), not
  // in post-scan data filters. Revenue folds as floored BIGINTs.
  private val PruneYear = 1995

  private def q129(spark: SparkSession, sfDir: String): DataFrame = {
    sweepStaleTmp("graft_q129_")
    val tag = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_q129_$tag"
    Tables.read(spark, sfDir, "orders")
      .select(col("o_orderdate"), col("o_totalprice"),
        year(to_date(col("o_orderdate"))).as("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    spark.read.parquet(path)
      .where(col("o_year") === PruneYear)
      .groupBy(month(to_date(col("o_orderdate"))).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice")).cast("long")).as("rev_floor"))
      .orderBy("o_month")
  }

  private val q129Oracle: String =
    s"""SELECT month(CAST(o_orderdate AS DATE)) AS o_month, count(*) AS n_orders,
       |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev_floor
       |FROM orders WHERE year(CAST(o_orderdate AS DATE)) = $PruneYear
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q130: per-source quality percentile calibration ----------------------
  // A global quality threshold over heterogeneous sources silently
  // over-prunes the source whose scorer runs low (wiki prose vs code
  // comments); the standard fix is to threshold each doc's PERCENTILE
  // RANK within its own source. percent_rank = (rank-1)/(n-1) is an
  // exact integer ratio — identical doubles on both engines, ties
  // share ranks identically — over the q16 scorer's n4 grid.
  private def q130(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.read(spark, sfDir, "documents").select(
      col("doc_id"), col("source"),
      Norm.n4(TextOps.qualityScore(col("text"))).as("score"))
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
    scored.withColumn("pct", percent_rank().over(w)).orderBy("doc_id")
  }

  private val q130Oracle: String =
    s"""WITH __s AS (SELECT doc_id, source,
       |    ${graft.etl.OracleSql.n4(TextOps.qualityScoreSql("text"))} AS score
       |  FROM documents)
       |SELECT doc_id, source, score,
       |  percent_rank() OVER (PARTITION BY source ORDER BY score) AS pct
       |FROM __s ORDER BY doc_id""".stripMargin

  // -- q131: k-anonymity audit ----------------------------------------------
  // The release-gate privacy check on quasi-identifiers: any
  // (lang, source, length-bucket) combination observed on fewer than
  // K documents is a re-identification risk — report each rare combo
  // with its member count. ONE partial-aggregable group-count; at
  // 100 TB the shuffle is the quasi-identifier domain, not the corpus.
  private val AnonK = 5

  private def q131(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") < AnonK)
      .orderBy("lang", "source", "len_bucket")

  private val q131Oracle: String =
    s"""SELECT lang, source, n_chars // 100 AS len_bucket, count(*) AS n
       |FROM documents GROUP BY 1, 2, 3 HAVING count(*) < $AnonK
       |ORDER BY 1, 2, 3""".stripMargin

  // -- q132: streaming Count-Min sketch -------------------------------------
  // The sixth streaming run, extending the streaming==batch==oracle
  // contract to SKETCHES: the row-level CMS form (explode to (r, b)
  // cells, ONE count aggregate — chained aggregations are illegal in
  // a stream) over the events file source, complete mode, hashed
  // against the batch-built sketch. This is the incrementally-
  // updatable heavy-hitter state a live ingest keeps.
  private def q132(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val sk = SketchOps.cmsCountsRows(
      stream.select(col("user_id")), "user_id", 4, 1024)
    val sink = "graft_q132_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = sk.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("r", "b")
  }

  private val q132Oracle: String =
    SketchOps.cmsCountsRowsSql("events", "user_id", 4, 1024)

  // -- q133: SCD-2 time travel ----------------------------------------------
  // Version reconstruction over a scd2Merge output: AS OF batch 0 the
  // filter rebuilds the PRE-merge dimension from the post-merge table
  // (closed rows still carry their history), AS OF batch 1 it yields
  // exactly the open rows — each a pure map-side predicate, no join,
  // no window (the payoff of batch-id version bounds). Both epochs
  // ride in one result, tagged `asof_batch` (`asof` alone is a
  // DuckDB reserved word — ASOF JOIN).
  private def q133(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
    val current = cust.select(col("c_custkey"), col("c_mktsegment"),
      lit(0L).as("valid_from"))
    val updates = cust.where(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("PROMO").as("c_mktsegment"))
    val merged = ScdOps.scd2Merge(current, updates, "c_custkey",
      "c_mktsegment", 1L)
    ScdOps.scd2AsOf(merged, 0L).withColumn("asof_batch", lit(0L))
      .union(ScdOps.scd2AsOf(merged, 1L).withColumn("asof_batch", lit(1L)))
      .orderBy("asof_batch", "c_custkey", "valid_from")
  }

  private val q133Oracle: String = {
    val cur = "SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from FROM customer"
    val upd = "SELECT c_custkey, 'PROMO' AS c_mktsegment FROM customer WHERE c_custkey % 10 = 0"
    val merge = ScdOps.scd2MergeSql(cur, upd, "c_custkey", "c_mktsegment", 1L)
    s"""SELECT *, CAST(0 AS BIGINT) AS asof_batch FROM (${ScdOps.scd2AsOfSql(merge, 0L)})
       |UNION ALL
       |SELECT *, CAST(1 AS BIGINT) AS asof_batch FROM (${ScdOps.scd2AsOfSql(merge, 1L)})
       |ORDER BY asof_batch, c_custkey, valid_from""".stripMargin
  }

  // -- q134: custom-state streaming sessions (flatMapGroupsWithState) -------
  // The seventh streaming run closes the last streaming-API gap in the
  // gate: EventOps.streaming.closedSessions keeps arbitrary per-user
  // state (start, lastTs, n) under an EVENT-TIME TIMEOUT and emits a
  // session when a successor event overruns the gap in-group OR when
  // the watermark passes the session's timeout. Against the
  // AvailableNow file source that semantics is exactly reproducible in
  // SQL: all events land in one data batch, so every non-final session
  // per user closes in-group, and each user's FINAL session emits iff
  // its timeout — (end_us + gap_us) div 1000 + 1 ms, the exact
  // arithmetic of the state function — is strictly below the final
  // watermark, max_event_ms − 10 min (Spark tracks event time in ms
  // and evicts state at timeoutTimestamp < watermark; the fixtures'
  // second-granular timestamps keep every session ~1e6 µs clear of
  // the 1 ms boundary, and both < and <= were verified to agree).
  // All integer arithmetic, so the oracle replays the stream
  // bit-for-bit; q28/q75 share the underlying sessionization.
  private val SessGapUs = 600000000L // 10 min
  private val SessWmMs = 600000L

  private def q134(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val sink = "graft_q134_sink"
    spark.catalog.dropTempView(sink)
    StreamTuning.withStateParts(spark) {
      val q = graft.ops.EventOps.streaming.closedSessions(stream).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("user_id", "session_start")
  }

  private val q134Oracle: String =
    s"""WITH __e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
       |__wm AS (SELECT max(tus) // 1000 - $SessWmMs AS wm_ms FROM __e),
       |__f AS (SELECT user_id, tus,
       |    CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
       |      <= $SessGapUs THEN 0 ELSE 1 END AS new_s
       |  FROM __e),
       |__s AS (SELECT user_id, tus,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM __f),
       |__agg AS (SELECT user_id, sid, min(tus) AS session_start,
       |    max(tus) AS end_us, count(*) AS n
       |  FROM __s GROUP BY user_id, sid),
       |__r AS (SELECT user_id, session_start, end_us, n,
       |    row_number() OVER (PARTITION BY user_id ORDER BY session_start DESC)
       |      AS rdesc
       |  FROM __agg)
       |SELECT user_id, session_start, CAST(n AS BIGINT) AS n
       |FROM __r, __wm
       |WHERE rdesc > 1 OR (end_us + $SessGapUs) // 1000 + 1 < wm_ms
       |ORDER BY user_id, session_start""".stripMargin

  // -- q135: KMV sketch set overlap -----------------------------------------
  // Distinct-set intersection the HLL family can't answer: how many
  // parts ever ship as a single unit (some line with l_quantity = 1)
  // AND as a pair (l_quantity = 2)? Each predicate catches a partial,
  // overlapping slice of the part domain (~hundreds of lines per part
  // would make broader predicates degenerate to "every part"). Three
  // 64-row KMV sketches estimate |A|, |B|, |A∪B| and |A∩B|, exact
  // counts alongside — the mergeable sketch a 1000-executor overlap
  // monitor would actually keep.
  private val KmvK = 64
  private val KmvSeed = 9L

  private def q135(spark: SparkSession, sfDir: String): DataFrame =
    SketchOps.kmvOverlap(Tables.read(spark, sfDir, "lineitem"),
      "l_partkey", col("l_quantity") === 1, col("l_quantity") === 2,
      KmvK, KmvSeed)

  private val q135Oracle: String =
    SketchOps.kmvOverlapSql("lineitem", "l_partkey",
      "l_quantity = 1", "l_quantity = 2", KmvK, KmvSeed)

  // -- q136: daily gap-fill + forward fill ----------------------------------
  // Temporal densification (StatsOps.gapFillDaily): 1995-Q1 daily
  // grid per ordering customer — the resample/ffill primitive feature
  // pipelines need before any rolling computation over sparse facts.
  private def q136(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.gapFillDaily(Tables.read(spark, sfDir, "orders"),
      "1995-01-01", "1995-03-31")

  private val q136Oracle: String =
    StatsOps.gapFillDailySql("orders", "1995-01-01", "1995-03-31")

  // -- q137: Benford first-digit audit --------------------------------------
  // The fabricated-data / wrong-unit red flag on order totals:
  // observed leading-digit counts vs n·log10(1+1/d) and the exact
  // micro-unit χ². TPC-H totalprice is range-uniform, NOT Benford —
  // the audit flags it loudly, which is the point of the check.
  private def q137(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.benfordCheck(Tables.read(spark, sfDir, "orders"),
      col("o_totalprice"))

  private val q137Oracle: String =
    StatsOps.benfordCheckSql("orders", "o_totalprice")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q134_stream_state_sessions", q134, Some(q134Oracle)),
    QueryDef("q135_kmv_overlap", q135, Some(q135Oracle)),
    QueryDef("q136_gapfill_daily", q136, Some(q136Oracle)),
    QueryDef("q137_benford_audit", q137, Some(q137Oracle)),
    QueryDef("q125_cdc_apply", q125, Some(q125Oracle)),
    QueryDef("q126_cms_topk", q126, Some(q126Oracle)),
    QueryDef("q127_bucketed_join", q127, Some(q127Oracle)),
    QueryDef("q128_weighted_sample", q128, Some(q128Oracle)),
    QueryDef("q129_partition_prune", q129, Some(q129Oracle)),
    QueryDef("q130_pct_calibrate", q130, Some(q130Oracle)),
    QueryDef("q131_k_anonymity", q131, Some(q131Oracle)),
    QueryDef("q132_stream_cms", q132, Some(q132Oracle)),
    QueryDef("q133_scd2_asof", q133, Some(q133Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-11 seventh wave: referential-integrity auditing, inverted-index
  * construction, and readability scoring.
  */
object Round11gQueries {

  // -- q209: referential-integrity audit -------------------------------------
  // The cross-table data-quality gate every warehouse load runs: for
  // each FK relation, how many fact rows reference a dimension key
  // that isn't there? The fixture's natural FKs all hold (verified),
  // so the middle relation audits the REALISTIC failure — a
  // late-arriving dimension (customer with a deterministic residue
  // class withheld) — and must find exactly the withheld references;
  // the two clean relations are the controls.
  //
  // Scale shape: facts collapse to a KEY CENSUS first (one map-side-
  // combining aggregate — the only data-sized shuffle), then the tiny
  // key frame anti-joins the dimension's key frame; fact payloads
  // never shuffle and the dimension is never scanned twice. Summary
  // rows assemble from two one-row stats frames via broadcast cross
  // (the stats-literal pattern).
  private def riAudit(name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val census = fact.groupBy(col(factKey).as("k"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the total AND the orphan anti-join
    val totals = census.agg(sum(col("n")).as("n_facts"))
    val orphans = census
      .join(dim.select(col(dimKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"),
        min(col("k")).as("orphan_key_min"),
        max(col("k")).as("orphan_key_max"))
    totals.crossJoin(broadcast(orphans))
      .select(lit(name).as("rel"), col("n_facts"), col("n_orphan_rows"),
        col("n_orphan_keys"),
        expr("n_orphan_rows * 1000000 div n_facts").as("orphan_ppm"),
        col("orphan_key_min"), col("orphan_key_max"))
  }

  private def q209(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    val orders = Tables.read(spark, sfDir, "orders")
    val cust = Tables.read(spark, sfDir, "customer")
    val events = Tables.read(spark, sfDir, "events")
    val lateCust = cust.where(col("c_custkey") % 250 =!= 7)
    riAudit("events->customer", events, "user_id", cust, "c_custkey")
      .unionAll(riAudit("lineitem->orders", li, "l_orderkey",
        orders, "o_orderkey"))
      .unionAll(riAudit("orders->late_customer", orders, "o_custkey",
        lateCust, "c_custkey"))
      .orderBy("rel")
  }

  private def riAuditSql(name: String, factTable: String, factKey: String,
      dimSql: String, dimKey: String): String =
    s"""SELECT '$name' AS rel, t.n_facts, o.n_orphan_rows, o.n_orphan_keys,
       |  CAST(o.n_orphan_rows * 1000000 // t.n_facts AS BIGINT) AS orphan_ppm,
       |  o.orphan_key_min, o.orphan_key_max
       |FROM (SELECT CAST(count(*) AS BIGINT) AS n_facts FROM $factTable) t
       |CROSS JOIN (
       |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
       |    count(*) AS n_orphan_keys,
       |    min(k) AS orphan_key_min, max(k) AS orphan_key_max
       |  FROM (SELECT $factKey AS k, count(*) AS n
       |        FROM $factTable GROUP BY 1) fk
       |  WHERE NOT EXISTS (SELECT 1 FROM ($dimSql) d
       |                    WHERE d.$dimKey = fk.k)) o""".stripMargin

  private val q209Oracle: String = Seq(
    riAuditSql("events->customer", "events", "user_id",
      "SELECT c_custkey FROM customer", "c_custkey"),
    riAuditSql("lineitem->orders", "lineitem", "l_orderkey",
      "SELECT o_orderkey FROM orders", "o_orderkey"),
    riAuditSql("orders->late_customer", "orders", "o_custkey",
      "SELECT c_custkey FROM customer WHERE c_custkey % 250 <> 7",
      "c_custkey"))
    .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rel")

  // -- q210: inverted-index build --------------------------------------------
  // The search-index construction pass: token → (document frequency,
  // corpus frequency, posting-list digest). Postings collapse per
  // (token, doc) INSIDE the tokenizing kernel (TextKernels
  // .tokenCensusEntries — the q110 within-doc-collapse lesson), so
  // the term census is the ONLY aggregation and its exchange input is
  // per-partition-vocab-sized after map-side combine; the original
  // two-census form shuffled every distinct (token, doc) string pair
  // and measured 5.9× per 10×. Membership is pinned by the
  // order-independent digest trio (Σ doc_id, min, max) instead of a
  // materialized list, so the hot-token posting ("the", df ≈ corpus)
  // never ships as an array. Top-25 tokens by (df desc, token asc)
  // via TakeOrdered — k rows leave the executors. (A hash-keyed
  // variant with a broadcast string join-back was measured SLOWER at
  // both 1× and 10× — the extra name pass cost more than the string
  // keys; the kernel collapse is where the win was.)
  private def q210(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(TextOps.tokenCensusEntriesOf(
          TextOps.tokens(col("text")))).as("e"))
      .select(col("doc_id"), col("e.token").as("token"), col("e.c").as("c"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
        sum(col("doc_id")).as("posting_sum"),
        min(col("doc_id")).as("doc_min"), max(col("doc_id")).as("doc_max"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(25)

  private val q210Oracle: String =
    s"""WITH p AS (SELECT token, doc_id, count(*) AS c
       |  FROM (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS token
       |        FROM documents)
       |  GROUP BY 1, 2)
       |SELECT token, count(*) AS df, CAST(sum(c) AS BIGINT) AS cf,
       |  CAST(sum(doc_id) AS BIGINT) AS posting_sum,
       |  min(doc_id) AS doc_min, max(doc_id) AS doc_max
       |FROM p GROUP BY 1 ORDER BY df DESC, token ASC LIMIT 25""".stripMargin

  // -- q211: readability census ----------------------------------------------
  // Flesch reading ease per source, on the engine's deterministic
  // integer grid: per doc W = whitespace tokens, S = non-blank [.!?]+
  // sentences (the q197 kernel), Y = [aeiouy]+ vowel groups (the
  // classic syllable heuristic; groups never span the whitespace
  // token boundary, so one regex pass over the doc equals the
  // per-word sum). flesch_milli = 206835 − 1015·wps div 1000 −
  // 84600·spw div 1000 with wps/spw in exact milli units — identical
  // trunc-div arithmetic on both engines, no IEEE in sight. Docs
  // with no sentence structure are SKIPPED and counted, not scored
  // as garbage. Pure projection + one census aggregate.
  private def q211(spark: SparkSession, sfDir: String): DataFrame = {
    val w = TextOps.nTokens(col("text")).cast("long")
    val s = size(filter(split(col("text"), "[.!?]+"),
      x => length(trim(x)) > 0)).cast("long")
    val y = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val perDoc = Tables.read(spark, sfDir, "documents")
      .select(col("source"), w.as("w"), s.as("s"), y.as("y"))
      .withColumn("scored", col("w") > 0 && col("s") > 0)
      .withColumn("wps_milli",
        when(col("scored"), expr("w * 1000 div s")))
      .withColumn("spw_milli",
        when(col("scored"), expr("y * 1000 div w")))
      .withColumn("flesch_milli",
        when(col("scored"), lit(206835L) -
          expr("(1015 * wps_milli) div 1000") -
          expr("(84600 * spw_milli) div 1000")))
    perDoc.groupBy("source")
      .agg(sum(when(col("scored"), 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("scored"), 0L).otherwise(1L)).as("n_skipped"),
        sum(col("wps_milli")).as("__sw"), sum(col("spw_milli")).as("__ss"),
        sum(col("flesch_milli")).as("__sf"))
      .select(col("source"), col("n_scored"), col("n_skipped"),
        when(col("n_scored") > 0,
          expr("__sw div n_scored")).as("wps_milli_avg"),
        when(col("n_scored") > 0,
          expr("__ss div n_scored")).as("spw_milli_avg"),
        when(col("n_scored") > 0,
          expr("__sf div n_scored")).as("flesch_milli_avg"))
      .orderBy("source")
  }

  private val q211Oracle: String = {
    val toks = TextOps.nTokensSql("text")
    s"""WITH d AS (SELECT source, $toks AS w,
       |    len(list_filter(string_split_regex(text, '[.!?]+'),
       |      x -> len(trim(x)) > 0)) AS s,
       |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
       |  FROM documents),
       |g AS (SELECT source, (w > 0 AND s > 0) AS scored,
       |    CASE WHEN w > 0 AND s > 0 THEN w * 1000 // s END AS wps_milli,
       |    CASE WHEN w > 0 AND s > 0 THEN y * 1000 // w END AS spw_milli
       |  FROM d),
       |f AS (SELECT source, scored, wps_milli, spw_milli,
       |    206835 - (1015 * wps_milli) // 1000
       |      - (84600 * spw_milli) // 1000 AS flesch_milli
       |  FROM g)
       |SELECT source,
       |  CAST(sum(CASE WHEN scored THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       |  CAST(sum(CASE WHEN scored THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped,
       |  CASE WHEN sum(CASE WHEN scored THEN 1 ELSE 0 END) > 0 THEN
       |    CAST(sum(wps_milli) // sum(CASE WHEN scored THEN 1 ELSE 0 END)
       |      AS BIGINT) END AS wps_milli_avg,
       |  CASE WHEN sum(CASE WHEN scored THEN 1 ELSE 0 END) > 0 THEN
       |    CAST(sum(spw_milli) // sum(CASE WHEN scored THEN 1 ELSE 0 END)
       |      AS BIGINT) END AS spw_milli_avg,
       |  CASE WHEN sum(CASE WHEN scored THEN 1 ELSE 0 END) > 0 THEN
       |    CAST(sum(flesch_milli) // sum(CASE WHEN scored THEN 1 ELSE 0 END)
       |      AS BIGINT) END AS flesch_milli_avg
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q209_ri_audit", q209, Some(q209Oracle)),
    QueryDef("q210_inverted_index", q210, Some(q210Oracle)),
    QueryDef("q211_readability", q211, Some(q211Oracle)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-3 training-pipeline operators: PII redaction, deterministic
  * stratified sampling, canonical-document selection per duplicate
  * cluster, URL/domain analytics, train/eval n-gram contamination,
  * and sketch-vs-exact verification rows (HLL distinct, approximate
  * percentiles) for the 100 TB scale path.
  */
object Round3Queries {

  import OracleHelpers._

  // -- q56: PII redaction -------------------------------------------------
  // Deterministic dirty corpus: every doc gets an email / phone / IPv4
  // appended by doc_id class, rendered identically by both engines.
  private def dirtyPiiExpr(str: String): String =
    s"""(CASE doc_id % 4
       | WHEN 0 THEN concat(text, ' contact user', CAST(doc_id % 50 AS $str), '@example.com now')
       | WHEN 1 THEN concat(text, ' call 555-', lpad(CAST(doc_id % 900 AS $str), 3, '0'),
       |                    '-', lpad(CAST(doc_id % 9000 AS $str), 4, '0'), ' today')
       | WHEN 2 THEN concat(text, ' from 10.', CAST(doc_id % 250 AS $str),
       |                    '.0.', CAST(doc_id % 200 AS $str))
       | ELSE text END)""".stripMargin.replaceAll("\n", " ")

  private def q56(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .withColumn("raw", expr(dirtyPiiExpr("STRING")))
      .select(col("doc_id"),
        TextOps.redactPii(col("raw")).as("redacted"),
        TextOps.piiCount(col("raw")).as("n_pii"))
      .orderBy("doc_id")

  private val q56Oracle: String =
    s"""WITH b AS (SELECT doc_id, ${dirtyPiiExpr("VARCHAR")} AS raw FROM documents)
       |SELECT doc_id, ${TextOps.redactPiiSql("raw")} AS redacted,
       |  CAST(${TextOps.piiCountSql("raw")} AS BIGINT) AS n_pii
       |FROM b ORDER BY doc_id""".stripMargin

  // -- q57: deterministic stratified sampling -----------------------------
  // Per-stratum rates via a content hash, not rand(): the same row is
  // in or out on every engine, every run, every cluster size — the
  // property a reproducible training-data mix needs. One filter
  // projection, no shuffle.
  private val strataRates: Seq[(String, Int)] =
    Seq("view" -> 10, "click" -> 25, "purchase" -> 50)

  private def q57(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = strataRates.foldRight(lit(100): org.apache.spark.sql.Column) {
      case ((t, r), els) => when(col("event_type") === t, lit(r)).otherwise(els)
    }
    Tables.read(spark, sfDir, "events")
      .where(TextOps.tokenHash(col("event_id").cast("string")) % 100 < rate)
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id", "event_type")
  }

  private val q57Oracle: String = {
    val rate = strataRates.map { case (t, r) => s"WHEN '$t' THEN $r" }
      .mkString("CASE event_type ", " ", " ELSE 100 END")
    s"""SELECT event_id, event_type FROM events
       |WHERE ${TextOps.tokenHashSql("CAST(event_id AS VARCHAR)")} % 100 < $rate
       |ORDER BY event_id, event_type""".stripMargin
  }

  // -- q58: canonical document per duplicate cluster ----------------------
  // After near-dup clustering, keep ONE representative per cluster:
  // the member with the highest quality score (id tiebreak). The
  // standard "which copy survives dedup" policy, as an oracle row.
  private def q58(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = ExtQueries.nearDupCorpus(spark, sfDir)
    val clusters = DedupOps.dupClusters(
      DedupOps.nearDupPairs(corpus, "doc_id", "text",
        ExtQueries.MinHashes, ExtQueries.Bands, ExtQueries.JacThreshold))
    val scored = clusters.join(
      corpus.select(col("doc_id").as("member_id"),
        Norm.n4(TextOps.qualityScore(col("text"))).as("score")), "member_id")
    val w = Window.partitionBy("cluster_rep")
      .orderBy(col("score").desc, col("member_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("cluster_rep")))
      .where(col("rn") === 1)
      .select(col("cluster_rep"), col("member_id").as("keep_id"),
        col("score").as("keep_score"), col("n_members"))
      .orderBy("cluster_rep")
  }

  private val q58Oracle: String =
    s"""${ExtQueries.dupClustersCte},
       |qual AS (SELECT id, ${n4(TextOps.qualityScoreSql("text"))} AS score FROM corpus),
       |scored AS (SELECT c.cluster_rep, c.member_id, q.score,
       |    row_number() OVER (PARTITION BY c.cluster_rep
       |                       ORDER BY q.score DESC, c.member_id) AS rn,
       |    count(*) OVER (PARTITION BY c.cluster_rep) AS n_members
       |  FROM clusters c JOIN qual q ON c.member_id = q.id)
       |SELECT cluster_rep, member_id AS keep_id, score AS keep_score, n_members
       |FROM scored WHERE rn = 1 ORDER BY cluster_rep""".stripMargin

  // -- q59: URL domain extraction + per-domain stats ----------------------
  private def urlExpr(str: String): String =
    "concat('https://', CASE user_id % 4 WHEN 0 THEN 'alpha.example' " +
      "WHEN 1 THEN 'beta.test' WHEN 2 THEN 'gamma.org' ELSE 'delta.net' END, " +
      s"'/p/', CAST(event_id AS $str))"

  private def q59(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "events")
      .withColumn("url", expr(urlExpr("STRING")))
      .select(regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain"),
        col("value"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n"), Norm.n4(avg(col("value"))).as("avg_value"))
      .orderBy("domain")

  private val q59Oracle: String =
    s"""WITH b AS (SELECT ${urlExpr("VARCHAR")} AS url, value FROM events)
       |SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
       |  count(*) AS n, ${n4("avg(value)")} AS avg_value
       |FROM b GROUP BY 1 ORDER BY domain""".stripMargin

  // -- q60: train/eval n-gram contamination -------------------------------
  // Eval set = source 'src0'; train = everything else. An eval doc is
  // contaminated when it shares a token 3-gram with any train doc.
  // Scale shape: distinct shingle hashes explode to (doc, hash) pairs,
  // ONE equi-join on the hash (payload-free), count per doc — the same
  // bucketed shape as the dedup family, no all-pairs comparison.
  private def q60(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val ev = d.where(col("source") === "src0")
      .select(col("doc_id"), DedupOps.shingleHashes(col("text")).as("hs"))
    val evx = ev.select(col("doc_id"), explode(col("hs")).as("h"))
    val train = d.where(col("source") =!= "src0")
      .select(explode(DedupOps.shingleHashes(col("text"))).as("h"))
      .distinct()
    val hits = evx.join(train, Seq("h")).groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
    ev.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  private val q60Oracle: String =
    s"""WITH ev AS (SELECT doc_id, unnest(${DedupOps.shingleHashesSql("text")}) AS h
       |            FROM documents WHERE source = 'src0'),
       |tr AS (SELECT DISTINCT unnest(${DedupOps.shingleHashesSql("text")}) AS h
       |       FROM documents WHERE source <> 'src0'),
       |hits AS (SELECT doc_id, count(*) AS n FROM ev JOIN tr USING (h) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(hits.n, 0) AS BIGINT) AS n_shared,
       |  coalesce(hits.n, 0) > 0 AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
       |LEFT JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin

  // -- q62: HLL approximate distinct, verified against exact --------------
  // The scale path (approx_count_distinct is a mergeable sketch, no
  // Expand, no value shuffle) with a correctness gate the oracle can
  // hash: the sketch must land within 5% of the exact count (rsd=2%,
  // so 2.5 sigma of headroom — deterministic for a fixed input).
  private val distinctCols = Seq("l_orderkey", "l_partkey", "l_suppkey")

  private def q62(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    // TWO lineitem scans total (VERDICT r8: the old per-column subtrees
    // scanned it six times — at 100 TB that is six jobs' worth of I/O).
    //
    // Scan 1 — all three HLL sketches in one Aggregate. No Expand risk:
    // approx_count_distinct is a plain mergeable aggregate, only a
    // DISTINCT aggregate mixed with non-distinct ones triggers Expand.
    // stack() reshapes the 1-row/3-col result to (column_name, approx).
    // rsd=0.02, not 0.01: Spark's HLL++ buffer is ~2,900 long words at
    // rsd=0.01 vs ~180 at 0.02, and the wide buffer tripled the pass's
    // runtime (measured 2.9 s -> 0.9 s at sf0.1). 0.02 keeps 2.5 sigma
    // of headroom on the 5% gate; measured error <= 1% at every fixture
    // SF (rsd=0.05 actually BUSTS the gate at sf0.001 — don't go lower).
    val approx = li.agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("l_orderkey"),
        approx_count_distinct(col("l_partkey"), 0.02).as("l_partkey"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("l_suppkey"))
      .select(expr("stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, " +
        "'l_suppkey', l_suppkey) AS (column_name, approx)"))
    // Scan 2 — all three exact counts from one pass: explode each row
    // into (column_name, value) pairs, two-phase dedup, count per name.
    // The explode triples rows BEFORE the partial aggregate, so the
    // map-side combine dedups locally and the shuffle carries only the
    // union of per-column distincts — same network cost as three
    // separate dedups, a third of the scan I/O.
    val exact = li
      .select(explode(array(distinctCols.map(c =>
        struct(lit(c).as("column_name"), col(c).as("v"))): _*)).as("p"))
      .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
      .distinct()
      .groupBy("column_name").agg(count(lit(1)).as("n_distinct"))
    // 3-row x 3-row join; broadcast keeps it a local hash join.
    exact.join(broadcast(approx), Seq("column_name"))
      .select(col("column_name"), col("n_distinct"),
        (abs(col("approx") - col("n_distinct")) <= lit(0.05) * col("n_distinct"))
          .as("within_5pct"))
      .orderBy("column_name")
  }

  private val q62Oracle: String =
    distinctCols.map { c =>
      s"(SELECT '$c' AS column_name, count(DISTINCT $c) AS n_distinct, TRUE AS within_5pct FROM lineitem)"
    }.mkString("", " UNION ALL ", " ORDER BY column_name")

  // -- q63: quantile binning (grouped ntile) ------------------------------
  // Deterministic quartile assignment per return flag: ntile over a
  // TOTAL order (price, then the row key) so both engines split
  // identically. The sort is bounded per group; for groups too large
  // to sort, swap in percentile-boundary binning (q43 computes the
  // boundaries).
  private def q63(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("price"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy("rf")
      .orderBy(col("price").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.withColumn("bin", ntile(4).over(w))
      .groupBy("rf", "bin")
      .agg(count(lit(1)).as("n"),
        Norm.n4(min(col("price"))).as("lo"), Norm.n4(max(col("price"))).as("hi"))
      .orderBy("rf", "bin")
  }

  private val q63Oracle: String =
    s"""WITH b AS (SELECT l_returnflag AS rf, l_extendedprice AS price,
       |  ntile(4) OVER (PARTITION BY l_returnflag
       |                 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
       |  FROM lineitem)
       |SELECT rf, CAST(bin AS INTEGER) AS bin, count(*) AS n,
       |  ${n4("min(price)")} AS lo, ${n4("max(price)")} AS hi
       |FROM b GROUP BY rf, bin ORDER BY rf, bin""".stripMargin

  // -- q64: approximate percentile, verified against exact ----------------
  // Covers EtlConfig.approxPercentiles' sketch path with an oracle
  // row: the t-digest-style estimate must land within 1% of the exact
  // interpolated median, per group.
  private def q64(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("exact_med"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med"))
      .select(col("rf"), Norm.n4(col("exact_med")).as("med"),
        (abs(col("approx_med") - col("exact_med")) <= lit(0.01) * col("exact_med"))
          .as("within_1pct"))
      .orderBy("rf")

  private val q64Oracle: String =
    s"""SELECT l_returnflag AS rf, ${n4("quantile_cont(l_extendedprice, 0.5)")} AS med,
       |  TRUE AS within_1pct
       |FROM lineitem GROUP BY 1 ORDER BY rf""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q56_pii_redact", q56, Some(q56Oracle)),
    QueryDef("q57_stratified_sample", q57, Some(q57Oracle)),
    QueryDef("q58_canonical_doc", q58, Some(q58Oracle)),
    QueryDef("q59_domain_stats", q59, Some(q59Oracle)),
    QueryDef("q60_contamination", q60, Some(q60Oracle)),
    QueryDef("q62_approx_distinct", q62, Some(q62Oracle)),
    QueryDef("q63_quantile_bins", q63, Some(q63Oracle)),
    QueryDef("q64_approx_percentile", q64, Some(q64Oracle)),
  )
}

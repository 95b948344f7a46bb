package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, MultimodalOps, StatsOps}

/** Round-10 second wave: WAV container metadata (the little-endian
  * sibling of q143's PNG pass), degree-ordered triangle counting and
  * frontier BFS (completing the graph family around q108's PageRank
  * and q51's connected components), t-closeness (completing the
  * privacy ladder of q131/q142), RFM segmentation (the
  * percentile-boundary binning path q63's docstring promises for
  * groups too large to sort), and an offline CUSUM change-point scan
  * (the WHEN-did-it-shift sibling of the KS/PSI drift audits).
  */
object Round10bQueries {

  // -- q145: WAV header metadata roundtrip -----------------------------------
  // Audio-pipeline metadata pass over a real container format: each
  // doc gets a spec-correct 44-byte canonical WAV header (RIFF/WAVE/
  // fmt/data chunks, all multi-byte fields LITTLE-endian — the
  // opposite byte order of q143's PNG, so a parser that shares the
  // PNG reader fails every field), with rate/channels/frames derived
  // algebraically from doc columns; every 5th doc gets the real
  // big-endian "RIFX" container tag, which the little-endian parser
  // must reject as NULL, not crash on. The parser also cross-checks
  // the spec's REDUNDANT derived fields (byte_rate, block_align), so
  // an internally-inconsistent header is rejected too. duration_ms is
  // exact integer floor — no float math anywhere.
  private def q145(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val rate = lit(8000L) * (col("doc_id") % 3 + 1)
    val channels = col("doc_id") % 2 + 1
    val frames = col("n_chars") * 100 + col("doc_id") % 997
    val payload = MultimodalOps.wavHeader(rate, channels, frames,
      col("doc_id") % 5 =!= 0)
    d.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), MultimodalOps.wavDims(col("payload")).as("__w"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        col("__w").getItem(0).as("sample_rate"),
        col("__w").getItem(1).as("channels"),
        col("__w").getItem(2).as("bits_per_sample"),
        col("__w").getItem(3).as("n_frames"),
        col("__w").getItem(4).as("duration_ms"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  private val q145Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 <> 0 THEN 8000 * (doc_id % 3 + 1) END AS sample_rate,
      |  CASE WHEN doc_id % 5 <> 0 THEN doc_id % 2 + 1 END AS channels,
      |  CASE WHEN doc_id % 5 <> 0 THEN CAST(16 AS BIGINT) END AS bits_per_sample,
      |  CASE WHEN doc_id % 5 <> 0 THEN n_chars * 100 + doc_id % 997 END AS n_frames,
      |  CASE WHEN doc_id % 5 <> 0 THEN
      |    ((n_chars * 100 + doc_id % 997) * 1000) // (8000 * (doc_id % 3 + 1))
      |  END AS duration_ms,
      |  CAST(44 AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q146: triangle census over the part co-purchase graph -----------------
  // Market-basket affinity structure: parts are linked when they ship
  // in the same order (high-quantity lines only, which keeps the
  // co-occurrence graph sparse the way a thresholded affinity graph
  // is in practice). The census itself is the scale-critical part:
  // degree-ordered orientation bounds the wedge join by O(m^{3/2})
  // instead of Σdeg² — see [[GraphOps.triangleStats]].
  private val TriMinQty = 40
  private val TriMaxItems = 20

  private def q146(spark: SparkSession, sfDir: String): DataFrame = {
    // pair generation via the capped-basket collect (one reused
    // exchange, map-side expansion) — see [[GraphOps.basketPairs]]
    val edges = GraphOps.basketPairs(
      Tables.read(spark, sfDir, "lineitem")
        .where(col("l_quantity") >= TriMinQty),
      col("l_orderkey"), col("l_partkey"), TriMaxItems)
      .select("a", "b")
    GraphOps.triangleStats(edges)
  }

  private val q146Oracle: String = GraphOps.triangleStatsSql(
    s"""SELECT ia.pk AS a, ib.pk AS b
       |FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |      FROM lineitem WHERE l_quantity >= $TriMinQty) ia
       |JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |      FROM lineitem WHERE l_quantity >= $TriMinQty) ib USING (ok)
       |JOIN (SELECT ok FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |        FROM lineitem WHERE l_quantity >= $TriMinQty)
       |      GROUP BY ok HAVING count(*) <= $TriMaxItems) el USING (ok)
       |WHERE ia.pk < ib.pk""".stripMargin)

  // -- q147: t-closeness audit -----------------------------------------------
  // Completes the privacy ladder over the same quasi-identifier
  // grouping as q131/q142: per (lang, length-bucket) group, the total
  // variation distance between the group's source distribution and
  // the corpus-wide one — skew k-anonymity and l-diversity both miss.
  // Exact-integer numerator, absent-source tail closed algebraically
  // (no group×source spine) — see [[StatsOps.tCloseness]].
  private def q147(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.tCloseness(Tables.read(spark, sfDir, "documents"),
        Seq("lang" -> col("lang"),
          "len_bucket" -> expr("n_chars div 100")),
        col("source"))
      .orderBy("lang", "len_bucket")

  private val q147Oracle: String =
    StatsOps.tClosenessSql("documents",
      Seq("lang" -> "lang", "len_bucket" -> "n_chars // 100"), "source") +
      "\nORDER BY lang, len_bucket"

  // -- q148: RFM segmentation ------------------------------------------------
  // The marketing-analytics classic, built the way q63's docstring
  // says to build it when per-group sorting stops scaling: quartile
  // BOUNDARIES from one exact-percentile pass (a 9-double one-row
  // stats literal, the q43 parity class), then every customer is
  // scored map-side against the broadcast cuts — no ntile, no global
  // sort, no per-customer window. Scores follow the uniform rule
  // `1 + Σ(v > cut)` for all three metrics (so LOW r_q = recent);
  // output is the 4×4×4 segment census with exact monetary sums.
  private def q148(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
    val maxDay = orders.agg(max(to_date(col("o_orderdate"))).as("__mx"))
    // customer-grain frame feeds the cuts pass AND the scoring pass:
    // checkpoint so orders is rolled up once (the q135 convention —
    // the exact-percentile contract forces materializing this frame
    // anyway, since cuts can't be computed without a full pass)
    val rfm = orders.crossJoin(broadcast(maxDay))
      .groupBy(col("o_custkey"))
      .agg(min(datediff(col("__mx"), to_date(col("o_orderdate"))))
          .as("rec_days"),
        count(lit(1)).as("freq"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("mon_u"))
      .localCheckpoint(true)
    val cuts = rfm.agg(
      percentile(col("rec_days"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("__rc"),
      percentile(col("freq"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("__fc"),
      percentile(col("mon_u"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("__mc"))
    def score(v: org.apache.spark.sql.Column, cutsArr: String) =
      lit(1) +
        when(v.cast("double") > element_at(col(cutsArr), 1), 1).otherwise(0) +
        when(v.cast("double") > element_at(col(cutsArr), 2), 1).otherwise(0) +
        when(v.cast("double") > element_at(col(cutsArr), 3), 1).otherwise(0)
    rfm.crossJoin(broadcast(cuts))
      .select(score(col("rec_days"), "__rc").as("r_q"),
        score(col("freq"), "__fc").as("f_q"),
        score(col("mon_u"), "__mc").as("m_q"),
        col("mon_u"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"), sum(col("mon_u")).as("mon_total_u"))
      .orderBy("r_q", "f_q", "m_q")
  }

  private val q148Oracle: String =
    """WITH __mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
      |__rfm AS (SELECT o_custkey,
      |    min(date_diff('day', CAST(o_orderdate AS DATE), mxd)) AS rec_days,
      |    count(*) AS freq,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS mon_u
      |  FROM orders CROSS JOIN __mx GROUP BY o_custkey, mxd),
      |__cuts AS (SELECT
      |    quantile_cont(rec_days, [0.25, 0.5, 0.75]) AS rc,
      |    quantile_cont(freq, [0.25, 0.5, 0.75]) AS fc,
      |    quantile_cont(mon_u, [0.25, 0.5, 0.75]) AS mc
      |  FROM __rfm),
      |__scored AS (SELECT
      |    1 + (CASE WHEN CAST(rec_days AS DOUBLE) > rc[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(rec_days AS DOUBLE) > rc[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(rec_days AS DOUBLE) > rc[3] THEN 1 ELSE 0 END)
      |      AS r_q,
      |    1 + (CASE WHEN CAST(freq AS DOUBLE) > fc[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(freq AS DOUBLE) > fc[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(freq AS DOUBLE) > fc[3] THEN 1 ELSE 0 END)
      |      AS f_q,
      |    1 + (CASE WHEN CAST(mon_u AS DOUBLE) > mc[1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(mon_u AS DOUBLE) > mc[2] THEN 1 ELSE 0 END)
      |      + (CASE WHEN CAST(mon_u AS DOUBLE) > mc[3] THEN 1 ELSE 0 END)
      |      AS m_q,
      |    mon_u
      |  FROM __rfm CROSS JOIN __cuts)
      |SELECT r_q, f_q, m_q, count(*) AS n_customers,
      |  CAST(sum(mon_u) AS BIGINT) AS mon_total_u
      |FROM __scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -- q149: CUSUM change-point scan -----------------------------------------
  // Offline Page-CUSUM over daily order revenue: the full
  // integer-exact trajectory with the |max|-excursion day flagged.
  // TPC-H days are iid by construction, so the flagged day is the
  // calibrated no-change baseline the monitor alarms against (the
  // q141 discipline applied to the time axis).
  private def q149(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.cusumDaily(Tables.read(spark, sfDir, "orders"))

  private val q149Oracle: String = StatsOps.cusumDailySql("orders")

  // -- q150: BFS level census over the trade graph ---------------------------
  // Shortest-path reachability from a seed cohort (every 100th
  // customer) over the undirected customer↔supplier trade graph —
  // the blast-radius question (how much of the marketplace is within
  // k hops of this cohort?) answered with per-hop frontier joins, the
  // Pregel BFS shape — see [[GraphOps.bfsLevels]]. Node ids are
  // namespaced like q108 (customer 2k, supplier 2k+1).
  private val BfsHops = 3

  private def q150(spark: SparkSession, sfDir: String): DataFrame = {
    val trade = Tables.read(spark, sfDir, "orders")
      .join(Tables.read(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = trade.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(trade.select(col("s").as("src"), col("c").as("dst")))
    val seeds = trade.where(col("c") % 200 === 2) // custkey % 100 == 1
      .select(col("c").as("node")).distinct()
    GraphOps.bfsLevels(edges, seeds, BfsHops)
  }

  private val q150Oracle: String = {
    val trade =
      """SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
    GraphOps.bfsLevelsSql(
      s"""SELECT c AS src, s AS dst FROM ($trade)
         |UNION ALL SELECT s AS src, c AS dst FROM ($trade)""".stripMargin,
      s"SELECT DISTINCT c AS node FROM ($trade) WHERE c % 200 = 2",
      BfsHops)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q145_wav_metadata", q145, Some(q145Oracle)),
    QueryDef("q146_triangle_census", q146, Some(q146Oracle)),
    QueryDef("q147_t_closeness", q147, Some(q147Oracle)),
    QueryDef("q148_rfm_segments", q148, Some(q148Oracle)),
    QueryDef("q149_cusum_changepoint", q149, Some(q149Oracle)),
    QueryDef("q150_bfs_levels", q150, Some(q150Oracle)))
}

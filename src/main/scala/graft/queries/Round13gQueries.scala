package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.TextOps

/** Round-13 seventh wave: Welch's unequal-variance t-test over every
  * event-type pair (q331 — gridded variance components so t² and the
  * Welch-Satterthwaite df stay inside DECIMAL/HUGEINT), a model
  * fairness audit (q332 — demographic parity + equalized-odds gaps per
  * customer segment), consistent-hash ring rebalance analysis (q333 —
  * the only keys that move when a node joins are the ones the new
  * node steals), and tokenizer fertility per language (q334 — the
  * cost-per-language census a multilingual pipeline budgets with).
  */
object Round13gQueries {

  // -- q331: Welch's t-test over event-type pairs -----------------------------------
  // The unequal-variance two-sample test (the safe default vs Student):
  // t² = (m̄₁−m̄₂)²/(s₁²/n₁+s₂²/n₂) with df from Welch-Satterthwaite.
  // All five moments (n, Σr, Σr²) are exact cents-grid integers; the
  // mean difference lands on a SIGN-SAFE ppm grid and each variance-
  // of-the-mean component on a 1e12 grid BEFORE combining (the q327
  // discipline: grid, then square, so nothing needs more than 128
  // bits — a direct common-denominator expansion of df would need
  // ~2^150). Only data-sized op is the 5-row type census; the 10
  // pairs ride a tiny self-join.
  private def q331(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "events")
      .select(col("event_type").as("ty"),
        floor(col("value") * lit(100) + lit(0.5)).cast(LongType).as("r"))
      .groupBy("ty").agg(count(lit(1)).as("n"),
        sum(expr("CAST(r AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("q"))
      .localCheckpoint(true) // ≤ 5 rows; feeds both sides of the pairs
    val a = census.select(col("ty").as("ta"), col("n").as("na"),
      col("s").as("sa"), col("q").as("qa"))
    val b = census.select(col("ty").as("tb"), col("n").as("nb"),
      col("s").as("sb"), col("q").as("qb"))
    a.join(b, col("ta") < col("tb"))
      .withColumn("mdnum", expr("sa * nb - sb * na"))
      .withColumn("md_ppm", expr("CASE WHEN mdnum < 0" +
        " THEN -((-mdnum) * 1000000 div (na * nb))" +
        " ELSE mdnum * 1000000 div (na * nb) END"))
      .withColumn("va", expr("(CAST(na AS DECIMAL(38,0)) * qa - sa * sa)" +
        " * 1000000000000 div (CAST(na AS DECIMAL(38,0)) * na * (na - 1))"))
      .withColumn("vb", expr("(CAST(nb AS DECIMAL(38,0)) * qb - sb * sb)" +
        " * 1000000000000 div (CAST(nb AS DECIMAL(38,0)) * nb * (nb - 1))"))
      .withColumn("t2_ppb", expr("CAST(md_ppm AS DECIMAL(38,0)) * md_ppm" +
        " * 1000000000 div nullif(va + vb, 0)"))
      .withColumn("va6", expr("va div 1000000"))
      .withColumn("vb6", expr("vb div 1000000"))
      // common-denominator form with ONE division: the naive
      // v²/(n−1) inner terms land in IntegralDivide's LONG and can
      // exceed 2^63 (observed: 1.9e19 wrapped), so keep every product
      // in DECIMAL and divide once
      .withColumn("df_milli", expr("CAST(va6 + vb6 AS DECIMAL(38,0))" +
        " * (va6 + vb6) * 1000 * (na - 1) * (nb - 1) div nullif(" +
        "CAST(va6 AS DECIMAL(38,0)) * va6 * (nb - 1)" +
        " + CAST(vb6 AS DECIMAL(38,0)) * vb6 * (na - 1), 0)"))
      .select(col("ta"), col("tb"), col("na"), col("nb"), col("md_ppm"),
        col("t2_ppb"), col("df_milli"))
      .orderBy("ta", "tb")
  }

  private val q331Oracle: String =
    """WITH census AS (SELECT event_type AS ty, count(*) AS n,
      |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
      |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
      |      * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS q
      |  FROM events GROUP BY 1),
      |pairs AS (SELECT a.ty AS ta, b.ty AS tb, a.n AS na, b.n AS nb,
      |    a.s AS sa, b.s AS sb, a.q AS qa, b.q AS qb
      |  FROM census a JOIN census b ON a.ty < b.ty),
      |md AS (SELECT *, sa * nb - sb * na AS mdnum FROM pairs),
      |g AS (SELECT *,
      |    CASE WHEN mdnum < 0 THEN -((-mdnum) * 1000000 // (na * nb))
      |      ELSE mdnum * 1000000 // (na * nb) END AS md_ppm,
      |    (CAST(na AS HUGEINT) * qa - sa * sa) * 1000000000000
      |      // (CAST(na AS HUGEINT) * na * (na - 1)) AS va,
      |    (CAST(nb AS HUGEINT) * qb - sb * sb) * 1000000000000
      |      // (CAST(nb AS HUGEINT) * nb * (nb - 1)) AS vb
      |  FROM md),
      |g6 AS (SELECT *, va // 1000000 AS va6, vb // 1000000 AS vb6 FROM g)
      |SELECT ta, tb, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |  CAST(md_ppm AS BIGINT) AS md_ppm,
      |  CAST(CAST(md_ppm AS HUGEINT) * md_ppm * 1000000000
      |    // nullif(va + vb, 0) AS BIGINT) AS t2_ppb,
      |  CAST(CAST(va6 + vb6 AS HUGEINT) * (va6 + vb6) * 1000
      |      * (na - 1) * (nb - 1)
      |    // nullif(CAST(va6 AS HUGEINT) * va6 * (nb - 1)
      |      + CAST(vb6 AS HUGEINT) * vb6 * (na - 1), 0) AS BIGINT)
      |    AS df_milli
      |FROM g6 ORDER BY ta, tb""".stripMargin

  // -- q332: fairness audit (demographic parity + equalized odds) --------------------
  // The pre-deployment audit for a scoring rule: protected groups are
  // customer segments (c_custkey mod 4), the "model" is the balance
  // gate c_acctbal ≥ 5000, the outcome label is "repeat finisher"
  // (≥ 4 'F'-status orders). Per segment: base rate, positive-
  // prediction rate (demographic parity), TPR and FPR (equalized
  // odds), plus each segment's gap against segment 0 as the
  // reference. All rates are exact count ratios on the ppm grid; the
  // label join is one key-census left join.
  private def q332(spark: SparkSession, sfDir: String): DataFrame = {
    val fcnt = Tables.read(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("fc"))
    val seg = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey").as("ck"), (col("c_custkey") % 4).as("seg"),
        (col("c_acctbal") >= 5000.0).as("pred"))
      .join(fcnt, Seq("ck"), "left")
      .withColumn("label", coalesce(col("fc"), lit(0L)) >= 4L)
      .groupBy("seg").agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_lab"),
        sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("n_fp"))
      .select(col("seg"), col("n"),
        expr("n_lab * 1000000 div n").as("base_rate_ppm"),
        expr("n_pred * 1000000 div n").as("pos_rate_ppm"),
        expr("n_tp * 1000000 div nullif(n_lab, 0)").as("tpr_ppm"),
        expr("n_fp * 1000000 div nullif(n - n_lab, 0)").as("fpr_ppm"))
      .localCheckpoint(true) // ≤ 4 rows; feeds rows AND the reference
    val ref = seg.where(col("seg") === 0).select(
      col("pos_rate_ppm").as("ref_pos"), col("tpr_ppm").as("ref_tpr"),
      col("fpr_ppm").as("ref_fpr"))
    seg.crossJoin(broadcast(ref))
      .select(col("seg"), col("n"), col("base_rate_ppm"),
        col("pos_rate_ppm"), col("tpr_ppm"), col("fpr_ppm"),
        abs(col("pos_rate_ppm") - col("ref_pos")).as("dp_gap_ppm"),
        // a NULL rate (degenerate segment: no positives / no negatives)
        // contributes NO gap — coalesce BEFORE greatest, because the
        // engines disagree on greatest-with-NULL (Spark skips NULLs,
        // DuckDB propagates)
        greatest(coalesce(abs(col("tpr_ppm") - col("ref_tpr")), lit(0L)),
          coalesce(abs(col("fpr_ppm") - col("ref_fpr")), lit(0L)))
          .as("eo_gap_ppm"))
      .orderBy("seg")
  }

  private val q332Oracle: String =
    """WITH fcnt AS (SELECT o_custkey AS ck, count(*) AS fc FROM orders
      |  WHERE o_orderstatus = 'F' GROUP BY 1),
      |rows_ AS (SELECT c_custkey % 4 AS seg,
      |    c_acctbal >= 5000.0 AS pred, coalesce(fc, 0) >= 4 AS label
      |  FROM customer LEFT JOIN fcnt ON c_custkey = ck),
      |cells AS (SELECT seg, count(*) AS n,
      |    count(CASE WHEN label THEN 1 END) AS n_lab,
      |    count(CASE WHEN pred THEN 1 END) AS n_pred,
      |    count(CASE WHEN pred AND label THEN 1 END) AS n_tp,
      |    count(CASE WHEN pred AND NOT label THEN 1 END) AS n_fp
      |  FROM rows_ GROUP BY 1),
      |rates AS (SELECT seg, n,
      |    CAST(n_lab * 1000000 // n AS BIGINT) AS base_rate_ppm,
      |    CAST(n_pred * 1000000 // n AS BIGINT) AS pos_rate_ppm,
      |    CAST(n_tp * 1000000 // nullif(n_lab, 0) AS BIGINT) AS tpr_ppm,
      |    CAST(n_fp * 1000000 // nullif(n - n_lab, 0) AS BIGINT) AS fpr_ppm
      |  FROM cells),
      |ref AS (SELECT pos_rate_ppm AS ref_pos, tpr_ppm AS ref_tpr,
      |    fpr_ppm AS ref_fpr FROM rates WHERE seg = 0)
      |SELECT seg, n, base_rate_ppm, pos_rate_ppm, tpr_ppm, fpr_ppm,
      |  abs(pos_rate_ppm - ref_pos) AS dp_gap_ppm,
      |  greatest(coalesce(abs(tpr_ppm - ref_tpr), 0),
      |    coalesce(abs(fpr_ppm - ref_fpr), 0)) AS eo_gap_ppm
      |FROM rates CROSS JOIN ref ORDER BY seg""".stripMargin

  // -- q333: consistent-hash ring rebalance audit ------------------------------------
  // The shard-assignment question behind every stateful service
  // resize: when node 4 joins a 4-node ring (8 vnodes each, two-round
  // LCG positions), which keys move? Consistent hashing's contract —
  // ONLY keys stolen by the new node's vnodes move; no key ever moves
  // between surviving nodes — is surfaced as per-node moved_in counts
  // (0 for nodes 0-3 by construction). Ring positions are
  // COMPILE-TIME literals (the ring is metadata, not data), so
  // assignment is a per-row array-literal probe: successor vnode =
  // min position > key hash, wrapping to the ring minimum. The only
  // shuffle is the ≤ (40·48)-cell (before, after) census.
  private val VnodesPerNode = 8

  private def lcg2(id: Long): Long =
    (((id * 1103515245L + 12345L) % 2147483648L) * 1103515245L + 54321L) %
      2147483648L

  /** (position, node) ring for `nodes` nodes, deduped to the min node
    * per position (LCG collisions are theoretical but the contract is
    * total), sorted by position.
    */
  private def ring(nodes: Int): Seq[(Long, Long)] =
    (0L until nodes.toLong * VnodesPerNode)
      .map(id => (lcg2(id), id / VnodesPerNode))
      .groupBy(_._1).map { case (vh, g) => (vh, g.map(_._2).min) }
      .toSeq.sortBy(_._1)

  private def assignExpr(r: Seq[(Long, Long)]): String = {
    val arr = r.map(_._1 + "L").mkString("array(", ",", ")")
    s"coalesce(array_min(filter($arr, v -> v > kh)), ${r.head._1}L)"
  }

  private def assignSql(r: Seq[(Long, Long)]): String = {
    val arr = r.map(_._1).mkString("[", ",", "]")
    s"coalesce(list_min(list_filter($arr, v -> v > kh)), ${r.head._1})"
  }

  private def q333(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rb = ring(4)
    val ra = ring(5)
    val census = Tables.read(spark, sfDir, "events")
      .select(expr("((((event_id*1103515245 + 12345) % 2147483648)" +
        " * 1103515245 + 54321) % 2147483648)").as("kh"))
      .withColumn("vhb", expr(assignExpr(rb)))
      .withColumn("vha", expr(assignExpr(ra)))
      .groupBy("vhb", "vha").agg(count(lit(1)).as("cnt"))
      .join(broadcast(rb.toDF("vhb", "node_b")), "vhb")
      .join(broadcast(ra.toDF("vha", "node_a")), "vha")
      .localCheckpoint(true) // tiny cell frame; feeds 3 rollups
    val before = census.groupBy(col("node_b").as("node"))
      .agg(sum(col("cnt")).as("n_before"))
    val after = census.groupBy(col("node_a").as("node"))
      .agg(sum(col("cnt")).as("n_after"),
        sum(when(col("node_a") =!= col("node_b"), col("cnt"))
          .otherwise(0L)).as("moved_in"))
    val tot = census.agg(sum(col("cnt")).as("t"))
    after.join(before, Seq("node"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("node"), coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        expr("coalesce(n_after, 0) * 1000000 div t").as("share_after_ppm"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"))
      .orderBy("node")
  }

  private val q333Oracle: String = {
    val rb = ring(4)
    val ra = ring(5)
    def mapVals(r: Seq[(Long, Long)]) =
      r.map { case (vh, n) => s"($vh,$n)" }.mkString(",")
    s"""WITH keys AS (SELECT ((((event_id*1103515245 + 12345) % 2147483648)
       |    * 1103515245 + 54321) % 2147483648) AS kh FROM events),
       |asg AS (SELECT ${assignSql(rb)} AS vhb, ${assignSql(ra)} AS vha
       |  FROM keys),
       |census AS (SELECT vhb, vha, count(*) AS cnt FROM asg GROUP BY 1, 2),
       |mb AS (SELECT * FROM (VALUES ${mapVals(rb)}) m(vh, node)),
       |ma AS (SELECT * FROM (VALUES ${mapVals(ra)}) m(vh, node)),
       |cells AS (SELECT mb.node AS node_b, ma.node AS node_a, cnt
       |  FROM census JOIN mb ON vhb = mb.vh JOIN ma ON vha = ma.vh),
       |bef AS (SELECT node_b AS node, CAST(sum(cnt) AS BIGINT) AS n_before
       |  FROM cells GROUP BY 1),
       |aft AS (SELECT node_a AS node, CAST(sum(cnt) AS BIGINT) AS n_after,
       |    CAST(sum(CASE WHEN node_a <> node_b THEN cnt ELSE 0 END)
       |      AS BIGINT) AS moved_in
       |  FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cells)
       |SELECT CAST(node AS BIGINT) AS node,
       |  coalesce(n_before, 0) AS n_before,
       |  coalesce(n_after, 0) AS n_after,
       |  CAST(coalesce(n_after, 0) * 1000000 // t AS BIGINT)
       |    AS share_after_ppm,
       |  coalesce(moved_in, 0) AS moved_in
       |FROM aft FULL OUTER JOIN bef USING (node) CROSS JOIN tot
       |ORDER BY node""".stripMargin
  }

  // -- q334: tokenizer fertility per language -----------------------------------------
  // The multilingual cost census: tokens per 1000 chars ("fertility"),
  // bytes per char (script weight), and chars per token, per language
  // — the numbers a token-budgeted pipeline uses to price each
  // language's share. Tokenization is the engine-wide bound-once
  // whitespace contract (TextOps.tokens); everything lands on exact
  // milli grids from one language census.
  private def q334(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.read(spark, sfDir, "documents")
      .select(col("lang"), col("text"))
      .groupBy("lang").agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast(LongType)).as("chars"),
        sum(octet_length(col("text")).cast(LongType)).as("bytes"),
        sum(TextOps.nTokens(col("text")).cast(LongType)).as("toks"))
      .select(col("lang"), col("docs"), col("toks"),
        expr("toks * 1000000 div nullif(chars, 0)")
          .as("tokens_per_kchar_milli"),
        expr("bytes * 1000 div nullif(chars, 0)").as("bytes_per_char_milli"),
        expr("chars * 1000 div nullif(toks, 0)").as("chars_per_token_milli"))
      .orderBy("lang")
  }

  private val q334Oracle: String = {
    val ntok = TextOps.nTokensSql("text")
    s"""SELECT lang, count(*) AS docs,
       |  CAST(sum($ntok) AS BIGINT) AS toks,
       |  CAST(sum($ntok) * 1000000 // nullif(sum(length(text)), 0)
       |    AS BIGINT) AS tokens_per_kchar_milli,
       |  CAST(sum(strlen(text)) * 1000
       |    // nullif(sum(length(text)), 0) AS BIGINT) AS bytes_per_char_milli,
       |  CAST(sum(length(text)) * 1000 // nullif(sum($ntok), 0)
       |    AS BIGINT) AS chars_per_token_milli
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q331_welch_ttest", q331, Some(q331Oracle)),
    QueryDef("q332_fairness_audit", q332, Some(q332Oracle)),
    QueryDef("q333_consistent_hashing", q333, Some(q333Oracle)),
    QueryDef("q334_tokenizer_fertility", q334, Some(q334Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, StatsOps, TrainOps}

/** Round-10 fourth wave: differentially-private release, community
  * detection, seasonality probing, and classifier evaluation.
  */
object Round10dQueries {

  // -- q158: differentially-private count release ----------------------------
  // The governance capstone over k-anon/l-div/t-closeness (which only
  // AUDIT): an ε=1 discrete-Laplace count release per source, noise
  // drawn by inverse CDF from driver-materialized threshold literals
  // (the ewmaWeights discipline — zero runtime exp/ln, pure-BIGINT
  // output) and a seeded per-group uniform standing in for the
  // mechanism's randomness so the release is gate-verifiable. See
  // [[StatsOps.dpCounts]].
  private val DpSeed = 1234L

  private def q158(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.dpCounts(Tables.read(spark, sfDir, "documents"), "source", DpSeed)

  private val q158Oracle: String =
    StatsOps.dpCountsSql("documents", "source", DpSeed)

  // -- q159: label-propagation communities -----------------------------------
  // Community structure of the co-purchase graph (q146's sparse
  // part-affinity edges — deliberately NOT the bipartite trade graph,
  // where synchronous LPA degenerates into the two sides oscillating):
  // three LPA rounds, smallest-label tiebreak, top-20 community
  // census — the partition-of-the-catalog view that PageRank
  // (importance) and connected components (reachability) don't give.
  // See [[GraphOps.labelPropagation]].
  private val LpaRounds = 3
  private val LpaTopK = 20
  private val LpaMinQty = 40
  private val LpaMaxItems = 20

  private def q159(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = GraphOps.basketPairs(
      Tables.read(spark, sfDir, "lineitem")
        .where(col("l_quantity") >= LpaMinQty),
      col("l_orderkey"), col("l_partkey"), LpaMaxItems)
      .select("a", "b")
    GraphOps.labelPropagation(edges, LpaRounds, LpaTopK)
  }

  private val q159Oracle: String = GraphOps.labelPropagationSql(
    s"""SELECT ia.pk AS a, ib.pk AS b
       |FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |      FROM lineitem WHERE l_quantity >= $LpaMinQty) ia
       |JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |      FROM lineitem WHERE l_quantity >= $LpaMinQty) ib USING (ok)
       |JOIN (SELECT ok FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |        FROM lineitem WHERE l_quantity >= $LpaMinQty)
       |      GROUP BY ok HAVING count(*) <= $LpaMaxItems) el USING (ok)
       |WHERE ia.pk < ib.pk""".stripMargin, LpaRounds, LpaTopK)

  // -- q160: autocorrelation function ----------------------------------------
  // Which lags carry signal in daily revenue: exact integer-grid ACF
  // at lags 1..7 (scaled centering, HUGEINT/DECIMAL(38) moments) —
  // the seasonality probe behind q118's day-of-week readout. TPC-H
  // days are iid, so the calibrated baseline reads near zero.
  private def q160(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.acfDaily(Tables.read(spark, sfDir, "orders"))

  private val q160Oracle: String = StatsOps.acfDailySql("orders")

  // -- q161: classifier confusion / F1 at the median threshold ---------------
  // The eval q86's in-engine logistic regression owes its users. The
  // raw 0.5 cut is degenerate on this model (three GD steps leave
  // every score below 0.5 → all-negative predictions), so the eval
  // thresholds at the score MEDIAN — the balanced ranking eval: does
  // the top-scoring half of the corpus capture the positive class?
  // Confusion counts plus precision/recall/F1 in exact ppm; strictly-
  // greater comparison against the broadcast median so grid ties land
  // identically on both engines.
  private def q161(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    val scored = TrainOps.logregScore(docs, "doc_id", "text",
      (col("lang") === "en").cast("int"), iters = 3, lr = 0.5)
    val labeled = docs.select(col("doc_id"),
      (col("lang") === "en").cast("int").as("y"))
    val joined = scored.join(labeled, "doc_id").localCheckpoint(true)
    val cut = joined.agg(percentile(col("p4"), lit(0.5)).as("__cut"))
    joined.crossJoin(broadcast(cut))
      .select(col("y"), (col("p4") > col("__cut")).cast("int").as("pred"))
      .agg(
        sum((col("pred") * col("y")).cast("long")).as("tp"),
        sum((col("pred") * (lit(1) - col("y"))).cast("long")).as("fp"),
        sum(((lit(1) - col("pred")) * col("y")).cast("long")).as("fn"),
        sum(((lit(1) - col("pred")) * (lit(1) - col("y"))).cast("long")).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000 div (tp + fn)")).as("recall_ppm"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)")).as("f1_ppm"))
  }

  private val q161Oracle: String = {
    val scored = TrainOps.logregScoreSql("documents", "doc_id", "text",
      "CASE WHEN lang = 'en' THEN 1 ELSE 0 END", iters = 3, lr = 0.5)
    s"""WITH __scored AS ($scored),
       |__j AS (SELECT s.p4, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM __scored s JOIN documents d ON s.doc_id = d.doc_id),
       |__cut AS (SELECT quantile_cont(p4, 0.5) AS cut FROM __j),
       |__p AS (SELECT y, CASE WHEN p4 > cut THEN 1 ELSE 0 END AS pred
       |  FROM __j CROSS JOIN __cut),
       |__c AS (SELECT
       |    CAST(sum(pred * y) AS BIGINT) AS tp,
       |    CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
       |    CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
       |    CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
       |  FROM __p)
       |SELECT tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) END AS precision_ppm,
       |  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) END AS recall_ppm,
       |  CASE WHEN 2 * tp + fp + fn > 0
       |       THEN 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm
       |FROM __c""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q158_dp_counts", q158, Some(q158Oracle)),
    QueryDef("q159_label_prop", q159, Some(q159Oracle)),
    QueryDef("q160_acf_daily", q160, Some(q160Oracle)),
    QueryDef("q161_confusion_f1", q161, Some(q161Oracle)))
}

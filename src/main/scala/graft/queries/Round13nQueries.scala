package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 fourteenth wave: graph modularity of a labeled partition
  * (q359 — the community-quality score over the co-supply graph),
  * revenue recognition scheduling (q360 — billed vs recognized vs
  * deferred balance per month), the rich-club coefficient (q361 —
  * density among the top-degree nodes at rank-based cuts), and a
  * heartbeat-gap audit (q362 — max/mean inter-event gaps per type).
  */
object Round13nQueries {

  // -- q359: modularity of the nation partition ------------------------------------------
  // The community-quality score Q = Σ_c [e_c/m − (d_c/2m)²] over the
  // weighted co-supply graph (suppliers sharing an order; weight =
  // co-occurrence count), with communities = supplier nations. The
  // edge census is one orderkey-keyed self-join of the per-order
  // supplier set; intra weights, degree sums and both Q terms are
  // nation-grain integers (each term trunc-divs on the ppb grid
  // separately, so no signed division ever runs).
  private def q359(spark: SparkSession, sfDir: String): DataFrame = {
    val os = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val sup = Tables.read(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.read(spark, sfDir, "nation")
      .select(col("n_nationkey").as("nk"), col("n_name"))
    val edges = os.join(os.select(col("ok"), col("sk").as("skb")), "ok")
      .where(col("sk") < col("skb"))
      .groupBy("sk", "skb").agg(count(lit(1)).as("w"))
      .join(broadcast(sup.select(col("s_suppkey").as("sk"),
        col("s_nationkey").as("na"))), "sk")
      .join(broadcast(sup.select(col("s_suppkey").as("skb"),
        col("s_nationkey").as("nb"))), "skb")
      .localCheckpoint(true) // feeds m, degrees, intra
    val m = edges.agg(sum(col("w")).as("m"))
    val deg = edges.select(col("na").as("nk"), col("w"))
      .unionAll(edges.select(col("nb").as("nk"), col("w")))
      .groupBy("nk").agg(sum(col("w")).as("d_c"))
    val intra = edges.where(col("na") === col("nb"))
      .groupBy(col("na").as("nk")).agg(sum(col("w")).as("e_c"))
    deg.join(intra, Seq("nk"), "left")
      .crossJoin(broadcast(m))
      .select(col("nk"), col("d_c"),
        coalesce(col("e_c"), lit(0L)).as("e_c"),
        (expr("coalesce(e_c, 0) * 1000000000 div m") -
          expr("CAST(d_c AS DECIMAL(38,0)) * d_c * 1000000000" +
            " div (4 * m * m)")).as("q_contrib_ppb"))
      .join(broadcast(nat), "nk")
      .select(col("n_name").as("nation"), col("e_c").as("intra_w"),
        col("d_c").as("degree_w"), col("q_contrib_ppb"))
      .orderBy("nation")
  }

  private val q359Oracle: String =
    """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |  FROM lineitem),
      |edges AS (SELECT a.sk, b.sk AS skb, count(*) AS w
      |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2),
      |lab AS (SELECT e.sk, e.skb, e.w, sa.s_nationkey AS na,
      |    sb.s_nationkey AS nb
      |  FROM edges e JOIN supplier sa ON e.sk = sa.s_suppkey
      |  JOIN supplier sb ON e.skb = sb.s_suppkey),
      |m AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM lab),
      |deg AS (SELECT nk, CAST(sum(w) AS BIGINT) AS d_c FROM (
      |    SELECT na AS nk, w FROM lab UNION ALL SELECT nb, w FROM lab)
      |  GROUP BY 1),
      |intra AS (SELECT na AS nk, CAST(sum(w) AS BIGINT) AS e_c FROM lab
      |  WHERE na = nb GROUP BY 1)
      |SELECT n_name AS nation, coalesce(e_c, 0) AS intra_w,
      |  d_c AS degree_w,
      |  CAST(coalesce(e_c, 0) * 1000000000 // m
      |    - CAST(d_c AS HUGEINT) * d_c * 1000000000 // (4 * m * m)
      |    AS BIGINT) AS q_contrib_ppb
      |FROM deg LEFT JOIN intra USING (nk) CROSS JOIN m
      |JOIN nation ON nk = n_nationkey
      |ORDER BY nation""".stripMargin

  // -- q360: revenue recognition schedule --------------------------------------------------
  // The finance close: each order's value recognizes evenly over 3
  // months from the order month (integer thirds, remainder on month
  // one — cents never leak), reported against billings with the
  // running deferred-revenue balance. One explode, two month-grain
  // censuses, one calendar-bounded cumulative window.
  private def q360(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .select(expr("CAST((year(o_orderdate) - 1995) * 12" +
        " + month(o_orderdate) - 1 AS BIGINT)").as("ym"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .localCheckpoint(true) // feeds billed AND the recognition explode
    val billed = o.groupBy("ym").agg(sum(col("c")).as("billed_u"))
    val rec = o.select(explode(expr("array(0L, 1L, 2L)")).as("i"),
      col("ym"), col("c"))
      .groupBy((col("ym") + col("i")).as("ym"))
      .agg(sum(expr("c div 3 + CASE WHEN i = 0 THEN c % 3 ELSE 0 END"))
        .as("recognized_u"))
    val w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    billed.join(rec, Seq("ym"), "full_outer")
      .select(col("ym"), coalesce(col("billed_u"), lit(0L)).as("billed_u"),
        coalesce(col("recognized_u"), lit(0L)).as("recognized_u"))
      .withColumn("deferred_end_u",
        sum(col("billed_u") - col("recognized_u")).over(w))
      .orderBy("ym")
  }

  private val q360Oracle: String =
    """WITH o AS (SELECT
      |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
      |      AS BIGINT) AS ym,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |billed AS (SELECT ym, CAST(sum(c) AS BIGINT) AS billed_u FROM o
      |  GROUP BY 1),
      |rec AS (SELECT ym + i AS ym,
      |    CAST(sum(c // 3 + CASE WHEN i = 0 THEN c % 3 ELSE 0 END)
      |      AS BIGINT) AS recognized_u
      |  FROM o CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) GROUP BY 1),
      |j AS (SELECT ym, coalesce(billed_u, 0) AS billed_u,
      |    coalesce(recognized_u, 0) AS recognized_u
      |  FROM billed FULL OUTER JOIN rec USING (ym))
      |SELECT ym, billed_u, recognized_u,
      |  CAST(sum(billed_u - recognized_u) OVER (ORDER BY ym
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS deferred_end_u
      |FROM j ORDER BY ym""".stripMargin

  // -- q361: rich-club coefficient -----------------------------------------------------------
  // Do the best-connected suppliers preferentially co-supply with each
  // other? Members at each cut are the top q% nodes by (degree, id) —
  // RANK-based cuts so the metric is scale-free; φ = realized edges
  // among members over C(n, 2). Node and edge frames are supplier-
  // grain / pair-grain (dimension-bounded).
  private val RichPcts = Seq(25L, 10L, 1L)

  private def q361(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val os = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = os.join(os.select(col("ok"), col("sk").as("skb")), "ok")
      .where(col("sk") < col("skb"))
      .select(col("sk"), col("skb")).distinct()
      .localCheckpoint(true) // feeds degrees AND the member filter
    val deg = edges.select(col("sk").as("node"))
      .unionAll(edges.select(col("skb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("deg").desc, col("node"))))
      .localCheckpoint(true) // node-grain; feeds counts AND both sides
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val cuts = RichPcts.toDF("pct").crossJoin(broadcast(n))
      .select(col("pct"), expr("n_nodes * pct div 100").as("n_members"))
    val members = cuts.join(broadcast(deg), col("rk") <= col("n_members"))
      .select(col("pct"), col("n_members"), col("node"), col("deg"))
    val ein = edges
      .join(members.select(col("pct").as("p1"), col("node").as("sk")),
        "sk")
      .join(members.select(col("pct").as("p2"), col("node").as("skb")),
        "skb")
      .where(col("p1") === col("p2"))
      .groupBy(col("p1").as("pct")).agg(count(lit(1)).as("e_in"))
    members.groupBy("pct", "n_members")
      .agg(min(col("deg")).as("min_deg_in"))
      .join(ein, Seq("pct"), "left")
      .select(col("pct"), col("n_members"), col("min_deg_in"),
        coalesce(col("e_in"), lit(0L)).as("e_in"),
        expr("coalesce(e_in, 0) * 2000000" +
          " div nullif(n_members * (n_members - 1), 0)").as("phi_ppm"))
      .orderBy("pct")
  }

  private val q361Oracle: String = {
    val pcts = RichPcts.map(p => s"($p)").mkString(",")
    s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
       |  FROM lineitem),
       |edges AS (SELECT DISTINCT a.sk, b.sk AS skb
       |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk),
       |deg AS (SELECT node, count(*) AS deg, row_number()
       |    OVER (ORDER BY count(*) DESC, node) AS rk
       |  FROM (SELECT sk AS node FROM edges
       |    UNION ALL SELECT skb FROM edges) GROUP BY node),
       |n AS (SELECT count(*) AS n_nodes FROM deg),
       |cuts AS (SELECT CAST(pct AS BIGINT) AS pct,
       |    n_nodes * pct // 100 AS n_members
       |  FROM (SELECT * FROM (VALUES $pcts) p(pct)) CROSS JOIN n),
       |members AS (SELECT pct, n_members, node, deg
       |  FROM cuts JOIN deg ON rk <= n_members),
       |ein AS (SELECT m1.pct, count(*) AS e_in
       |  FROM edges JOIN members m1 ON edges.sk = m1.node
       |  JOIN members m2 ON edges.skb = m2.node AND m1.pct = m2.pct
       |  GROUP BY 1),
       |base AS (SELECT pct, n_members, min(deg) AS min_deg_in
       |  FROM members GROUP BY 1, 2)
       |SELECT pct, CAST(n_members AS BIGINT) AS n_members,
       |  CAST(min_deg_in AS BIGINT) AS min_deg_in,
       |  coalesce(e_in, 0) AS e_in,
       |  CAST(coalesce(e_in, 0) * 2000000
       |    // nullif(n_members * (n_members - 1), 0) AS BIGINT) AS phi_ppm
       |FROM base LEFT JOIN ein USING (pct) ORDER BY pct""".stripMargin
  }

  // -- q362: heartbeat-gap audit ---------------------------------------------------------------
  // The pipeline-freshness SLA: per event type, the distribution of
  // inter-event gaps — max, mean, and the over-a-minute count —
  // computed within (type, day) window partitions so the scan
  // parallelizes by calendar (day-boundary gaps are out of scope by
  // construction, stated not hidden). Timestamps compare as exact
  // epoch microseconds.
  private def q362(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("ty", "day").orderBy("us", "event_id")
    Tables.read(spark, sfDir, "events")
      .select(col("event_type").as("ty"), to_date(col("ts")).as("day"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy("ty").agg(count(lit(1)).as("n_gaps"),
        expr("max(gap) div 1000").as("max_gap_ms"),
        expr("sum(gap) div (count(*) * 1000)").as("avg_gap_ms"),
        sum(when(col("gap") > 60000000L, 1L).otherwise(0L))
          .as("gaps_over_1m"))
      .orderBy("ty")
  }

  private val q362Oracle: String =
    """WITH g AS (SELECT event_type AS ty,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT ty, count(*) AS n_gaps,
      |  CAST(max(gap) // 1000 AS BIGINT) AS max_gap_ms,
      |  CAST(sum(gap) // (count(*) * 1000) AS BIGINT) AS avg_gap_ms,
      |  CAST(count(CASE WHEN gap > 60000000 THEN 1 END) AS BIGINT)
      |    AS gaps_over_1m
      |FROM g WHERE gap IS NOT NULL GROUP BY ty ORDER BY ty""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q359_modularity", q359, Some(q359Oracle)),
    QueryDef("q360_rev_recognition", q360, Some(q360Oracle)),
    QueryDef("q361_rich_club", q361, Some(q361Oracle)),
    QueryDef("q362_heartbeat_gaps", q362, Some(q362Oracle)),
  )
}

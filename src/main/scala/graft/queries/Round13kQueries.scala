package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-13 eleventh wave: DBSCAN core/border/noise census (q347 —
  * density classification on the q323 grid-blocked neighbor machinery,
  * no all-pairs), SPRT sequential-test monitoring (q348 — Wald
  * boundaries on an integer LLR with compile-time log literals),
  * cohort LTV triangle (q349 — the growth-analytics revenue triangle),
  * and two-way ANOVA (q350 — main effects + interaction from one
  * ≤6-cell census on exact integer grids).
  */
object Round13kQueries {

  // -- q347: DBSCAN core/border/noise census -------------------------------------------
  // Density-based clustering's point classification, distributed: the
  // 9-cell grid join (q323) yields every ordered neighbor pair exactly
  // once, so neighbor counts are one cell-keyed census; core = ≥
  // minPts neighbors, border = non-core adjacent to a core (the pair
  // frame re-read with the a-side's core flag joined back), noise =
  // the rest. Points with zero neighbors enter via a left join. No
  // distance is ever computed outside a 3×3 neighborhood.
  private val DbR = 4000L
  private val DbMinPts = 4L

  private def q347(spark: SparkSession, sfDir: String): DataFrame = {
    val r2 = DbR * DbR
    val pts = Tables.read(spark, sfDir, "customer")
      .selectExpr("c_custkey AS id",
        "((((c_custkey*1103515245 + 12345) % 2147483648) * 1103515245" +
          " + 54321) % 2147483648) % 100000 AS x",
        "((((c_custkey*69069 + 1) % 2147483648) * 69069 + 777)" +
          " % 2147483648) % 100000 AS y")
      .withColumn("cx", expr(s"x div $DbR"))
      .withColumn("cy", expr(s"y div $DbR"))
      .localCheckpoint(true)
    // DEFAULT dispatch = the density probe (round 15, VERDICT r14 #1):
    // adaptiveSide returns a cell side < R exactly when density makes
    // the legacy 3x3 pair join quadratic-expensive AND the ring
    // machinery pays — route those to the adaptive census
    // (bit-identical, same oracle, q378's unconditional path). A probe
    // result of R means density is too low to matter and the legacy
    // join stays. graft.spatial.legacy=true opts OUT (round 14's
    // opt-IN graft.spatial.adaptive knob is retired) — checked BEFORE
    // the probe (ADVICE r15) so the opt-out also bypasses adaptiveSide's
    // coordinate require and its extra scalar scan.
    val p3 = pts.select("id", "x", "y")
    if (!sys.props.get("graft.spatial.legacy").contains("true")) {
      val side = graft.ops.SpatialOps.adaptiveSide(p3, DbR)
      if (side < DbR)
        return graft.ops.SpatialOps.dbscanCensus(p3, DbR, DbMinPts, side)
    }
    val home = pts.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), (col("cx") * lit(1024L) + col("cy")).as("cell"))
    val offs = array(lit(-1L), lit(0L), lit(1L))
    val ex = pts
      .withColumn("dx", explode(offs))
      .withColumn("dy", explode(offs))
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        ((col("cx") + col("dx")) * lit(1024L) + col("cy") + col("dy"))
          .as("cell"))
    val pairs = ex.join(home, "cell")
      .where(col("ida") =!= col("idb") &&
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(r2))
      .select(col("ida"), col("idb"))
      .localCheckpoint(true) // feeds the count census AND the core hop
    val nbrs = pts.select(col("id"))
      .join(pairs.groupBy("idb").agg(count(lit(1)).as("nbrs")),
        col("id") === col("idb"), "left")
      .select(col("id"), coalesce(col("nbrs"), lit(0L)).as("nbrs"))
      .withColumn("is_core", col("nbrs") >= DbMinPts)
      .localCheckpoint(true) // feeds the hop join AND the census
    val coreAdj = pairs
      .join(nbrs.select(col("id").as("ida"), col("is_core").as("a_core")),
        "ida")
      .groupBy("idb").agg(max(when(col("a_core"), 1L).otherwise(0L))
        .as("has_core_nbr"))
    nbrs.join(coreAdj, col("id") === col("idb"), "left")
      .withColumn("cls", when(col("is_core"), "core")
        .when(coalesce(col("has_core_nbr"), lit(0L)) === 1L, "border")
        .otherwise("noise"))
      .groupBy("cls").agg(count(lit(1)).as("n_points"),
        expr("sum(nbrs) * 1000 div count(*)").as("avg_nbrs_milli"))
      .orderBy("cls")
  }

  private[queries] val q347Oracle: String = {
    val r2 = DbR * DbR
    s"""WITH h AS (SELECT c_custkey AS id,
       |    (c_custkey*1103515245 + 12345) % 2147483648 AS h1,
       |    (c_custkey*69069 + 1) % 2147483648 AS g1 FROM customer),
       |pts AS (SELECT id,
       |    ((h1*1103515245 + 54321) % 2147483648) % 100000 AS x,
       |    ((g1*69069 + 777) % 2147483648) % 100000 AS y FROM h),
       |p2 AS (SELECT id, x, y, x // $DbR AS cx, y // $DbR AS cy FROM pts),
       |off AS (SELECT * FROM (VALUES (-1),(0),(1)) o(d)),
       |ex AS (SELECT id AS ida, x AS xa, y AS ya,
       |    (cx+ox.d)*1024 + (cy+oy.d) AS cell FROM p2, off ox, off oy),
       |hm AS (SELECT id AS idb, x AS xb, y AS yb, cx*1024 + cy AS cell
       |  FROM p2),
       |pairs AS (SELECT ida, idb FROM ex JOIN hm USING (cell)
       |  WHERE ida <> idb
       |    AND (xa-xb)*(xa-xb)+(ya-yb)*(ya-yb) <= $r2),
       |nbrs AS (SELECT p2.id, coalesce(c.nbrs, 0) AS nbrs,
       |    coalesce(c.nbrs, 0) >= $DbMinPts AS is_core
       |  FROM p2 LEFT JOIN (SELECT idb, count(*) AS nbrs FROM pairs
       |    GROUP BY 1) c ON p2.id = c.idb),
       |adj AS (SELECT idb, max(CASE WHEN n.is_core THEN 1 ELSE 0 END)
       |    AS has_core_nbr
       |  FROM pairs JOIN nbrs n ON pairs.ida = n.id GROUP BY 1),
       |cls AS (SELECT nbrs.nbrs,
       |    CASE WHEN is_core THEN 'core'
       |      WHEN coalesce(has_core_nbr, 0) = 1 THEN 'border'
       |      ELSE 'noise' END AS cls
       |  FROM nbrs LEFT JOIN adj ON nbrs.id = adj.idb)
       |SELECT cls, count(*) AS n_points,
       |  CAST(sum(nbrs) * 1000 // count(*) AS BIGINT) AS avg_nbrs_milli
       |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -- q348: SPRT sequential-test monitor -----------------------------------------------
  // Wald's sequential probability-ratio test over a running
  // experiment: H0 p=0.04 vs H1 p=0.06 on the purchase rate, per arm
  // (user-key parity). The log-likelihood ratio is INTEGER by
  // construction — k·L1 + (n−k)·L0 with L1/L0 the per-outcome log
  // terms as COMPILE-TIME micro-nat literals (the q289/q158
  // discipline: no runtime transcendental ever runs in either
  // engine), compared against the ±ln(19) boundaries for
  // α = β = 0.05. Output per arm: the full-horizon LLR, the first
  // boundary-crossing day, and the decision that crossing implies.
  private val SprtP0 = 0.04
  private val SprtP1 = 0.06
  private val SprtL1 = // ln(p1/p0) in micro-nats: +405465
    math.floor(math.log(SprtP1 / SprtP0) * 1e6 + 0.5).toLong
  private val SprtL0 = // ln((1-p1)/(1-p0)) in micro-nats: -21053
    math.floor(math.log((1 - SprtP1) / (1 - SprtP0)) * 1e6 + 0.5).toLong
  private val SprtBound = // ln(19) in micro-nats: 2944439
    math.floor(math.log(19.0) * 1e6 + 0.5).toLong

  private def q348(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "events")
      .select((col("user_id") % 2).as("arm"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast(LongType).as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
      .where(col("day") >= 0)
      .groupBy("arm", "day")
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val w = Window.partitionBy("arm").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = daily
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("ck", sum(col("k")).over(w))
      .withColumn("llr",
        expr(s"ck * $SprtL1 + (cn - ck) * ($SprtL0)"))
      .withColumn("out", abs(col("llr")) >= SprtBound)
      .localCheckpoint(true) // day-grain; feeds final row AND crossing
    val fin = cum.groupBy("arm").agg(max(col("day")).as("last_day"),
      max(col("cn")).as("total_n"), max(col("ck")).as("total_k"),
      min(when(col("out"), col("day"))).as("first_cross_day"))
    val crossSign = cum.select(col("arm").as("arm2"),
      col("day").as("day2"), col("llr").as("llr2"))
    fin.join(crossSign, col("arm") === col("arm2") &&
      col("first_cross_day") === col("day2"), "left")
      .select(col("arm"), col("total_n"), col("total_k"),
        col("first_cross_day"),
        when(col("llr2") >= SprtBound, "accept_h1")
          .when(col("llr2") <= -SprtBound, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy("arm")
  }

  private val q348Oracle: String =
    s"""WITH daily AS (SELECT user_id % 2 AS arm,
       |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
       |    count(*) AS n,
       |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS k
       |  FROM events
       |  WHERE CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) >= 0
       |  GROUP BY 1, 2),
       |cum AS (SELECT arm, day,
       |    sum(n) OVER w AS cn, sum(k) OVER w AS ck
       |  FROM daily WINDOW w AS (PARTITION BY arm ORDER BY day
       |    ROWS UNBOUNDED PRECEDING)),
       |llr AS (SELECT arm, day, cn, ck,
       |    ck * $SprtL1 + (cn - ck) * ($SprtL0) AS llr,
       |    abs(ck * $SprtL1 + (cn - ck) * ($SprtL0)) >= $SprtBound AS out
       |  FROM cum),
       |fin AS (SELECT arm, max(cn) AS total_n, max(ck) AS total_k,
       |    min(CASE WHEN out THEN day END) AS first_cross_day
       |  FROM llr GROUP BY 1)
       |SELECT fin.arm AS arm, CAST(total_n AS BIGINT) AS total_n,
       |  CAST(total_k AS BIGINT) AS total_k, first_cross_day,
       |  CASE WHEN l.llr >= $SprtBound THEN 'accept_h1'
       |    WHEN l.llr <= -$SprtBound THEN 'accept_h0'
       |    ELSE 'continue' END AS decision
       |FROM fin LEFT JOIN llr l
       |  ON fin.arm = l.arm AND fin.first_cross_day = l.day
       |ORDER BY arm""".stripMargin

  // -- q349: cohort LTV triangle ----------------------------------------------------------
  // The growth-analytics revenue triangle: cohort = the month of a
  // customer's FIRST order, age = months since, cell = that cohort's
  // revenue at that age, plus the cumulative-per-customer LTV the
  // cell implies. Two censuses (first-order month per customer, then
  // (cohort, age) revenue) and one calendar-bounded cumulative
  // window.
  private def q349(spark: SparkSession, sfDir: String): DataFrame = {
    val ym = "CAST((year(o_orderdate) - 1995) * 12" +
      " + month(o_orderdate) - 1 AS BIGINT)"
    val orders = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey").as("ck"), expr(ym).as("ym"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("rev_u"))
      .localCheckpoint(true) // feeds the cohort census AND the cells
    val cohort = orders.groupBy("ck").agg(min(col("ym")).as("cohort"))
    val sizes = cohort.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
    val cells = orders.join(cohort, "ck")
      .groupBy(col("cohort"), (col("ym") - col("cohort")).as("age"))
      .agg(sum(col("rev_u")).as("rev_u"))
    val w = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(sizes), "cohort")
      .withColumn("cum_rev_u", sum(col("rev_u")).over(w))
      .select(col("cohort"), col("age"), col("n_customers"), col("rev_u"),
        col("cum_rev_u"),
        expr("cum_rev_u div n_customers").as("ltv_per_customer_u"))
      .orderBy("cohort", "age")
  }

  private val q349Oracle: String =
    """WITH o AS (SELECT o_custkey AS ck,
      |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
      |      AS BIGINT) AS ym,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS rev_u
      |  FROM orders),
      |cohort AS (SELECT ck, min(ym) AS cohort FROM o GROUP BY 1),
      |sizes AS (SELECT cohort, count(*) AS n_customers FROM cohort
      |  GROUP BY 1),
      |cells AS (SELECT cohort, ym - cohort AS age,
      |    CAST(sum(rev_u) AS BIGINT) AS rev_u
      |  FROM o JOIN cohort USING (ck) GROUP BY 1, 2),
      |cum AS (SELECT cohort, age, rev_u,
      |    CAST(sum(rev_u) OVER (PARTITION BY cohort ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_u
      |  FROM cells)
      |SELECT cohort, age, n_customers, rev_u, cum_rev_u,
      |  CAST(cum_rev_u // n_customers AS BIGINT) AS ltv_per_customer_u
      |FROM cum JOIN sizes USING (cohort) ORDER BY cohort, age""".stripMargin

  // -- q350: two-way ANOVA ------------------------------------------------------------------
  // Main effects + interaction for returnflag × linestatus on the
  // order-value DOLLAR grid (cents would push Σ S_g²/n_g past 2^63 at
  // sf0.1 — group sums reach ~1e12 cents, whose squared-over-n terms
  // sum to ~1.5e19; dollars keep every IntegralDivide result and its
  // sums inside BIGINT through 1000× with no semantic change to the
  // F ratios), via the computational sums-of-squares identity
  // SS = Σ S_g²/n_g − S²/N evaluated with per-term trunc-div on
  // DECIMAL/HUGEINT (q271's one-way discipline, factored twice);
  // SS_AB = SS_cells − SS_A − SS_B, SS_err = SS_tot − SS_cells, and
  // each F statistic lands on a ppm grid from the gridded mean
  // squares. Everything reads one ≤6-cell census.
  private def q350(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("a"), col("l_linestatus").as("b"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 100")
          .as("y"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("q"))
      .localCheckpoint(true) // ≤ 6 rows; feeds every rollup below
    def ssOver(group: Seq[String]): DataFrame = {
      val g = cells.groupBy(group.map(col): _*)
        .agg(sum(col("n")).as("gn"), sum(col("s")).as("gs"))
      g.agg(sum(expr("gs * gs div gn")).as("term"),
        count(lit(1)).as("levels"))
    }
    val sa = ssOver(Seq("a")).select(col("term").as("ta"),
      col("levels").as("la"))
    val sb = ssOver(Seq("b")).select(col("term").as("tb"),
      col("levels").as("lb"))
    val sab = ssOver(Seq("a", "b")).select(col("term").as("tab"),
      col("levels").as("lab"))
    val tot = cells.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
      sum(col("q")).as("qq"))
    val base = tot.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .crossJoin(broadcast(sab))
      .withColumn("corr", expr("ss * ss div nn"))
      // each SS is a difference of per-term-truncated quantities, so
      // tiny negatives are possible on adversarial data; clamp at 0 on
      // BOTH sides so the later trunc-div never sees a sign Spark and
      // DuckDB divide differently (ADVICE r13)
      .withColumn("ss_a", expr("greatest(ta - corr, 0)"))
      .withColumn("ss_b", expr("greatest(tb - corr, 0)"))
      .withColumn("ss_cells", expr("greatest(tab - corr, 0)"))
      .withColumn("ss_ab", expr("greatest(ss_cells - ss_a - ss_b, 0)"))
      .withColumn("ss_tot", expr("greatest(qq - corr, 0)"))
      .withColumn("ss_err", expr("greatest(ss_tot - ss_cells, 0)"))
      .withColumn("df_a", expr("la - 1"))
      .withColumn("df_b", expr("lb - 1"))
      .withColumn("df_ab", expr("(la - 1) * (lb - 1)"))
      .withColumn("df_err", expr("nn - lab"))
      .withColumn("mse", expr("ss_err div df_err"))
      .localCheckpoint(true) // one row; melted into the report below
    def row(name: String, ss: String, df: String) = base.select(
      lit(name).as("component"), col(df).cast(LongType).as("df"),
      expr(s"CAST($ss AS BIGINT)").as("ss_dollars2"),
      // mean square can reach ~1e16: route the ×1e6 through DECIMAL
      // (a LONG product would overflow)
      expr(s"CAST(CAST($ss div $df AS DECIMAL(38,0)) * 1000000" +
        " div nullif(mse, 0) AS BIGINT)").as("f_ppm"))
    row("a_returnflag", "ss_a", "df_a")
      .unionAll(row("b_linestatus", "ss_b", "df_b"))
      .unionAll(row("interaction", "ss_ab", "df_ab"))
      .unionAll(base.select(lit("error").as("component"),
        col("df_err").cast(LongType).as("df"),
        expr("CAST(ss_err AS BIGINT)").as("ss_dollars2"),
        lit(null).cast(LongType).as("f_ppm")))
      .orderBy("component")
  }

  private val q350Oracle: String =
    """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
      |    count(*) AS n,
      |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100
      |      AS HUGEINT)) AS s,
      |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100
      |      AS HUGEINT) * (CAST(floor(l_extendedprice * 100 + 0.5)
      |      AS BIGINT) // 100)) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |ga AS (SELECT sum(gs * gs // gn) AS ta, count(*) AS la FROM
      |  (SELECT a, sum(n) AS gn, sum(s) AS gs FROM cells GROUP BY 1)),
      |gb AS (SELECT sum(gs * gs // gn) AS tb, count(*) AS lb FROM
      |  (SELECT b, sum(n) AS gn, sum(s) AS gs FROM cells GROUP BY 1)),
      |gab AS (SELECT sum(gs * gs // gn) AS tab, count(*) AS lab FROM
      |  (SELECT a, b, sum(n) AS gn, sum(s) AS gs FROM cells GROUP BY 1, 2)),
      |tot AS (SELECT sum(n) AS nn, sum(s) AS ss, sum(q) AS qq FROM cells),
      |base AS (SELECT *,
      |    ss * ss // nn AS corr FROM tot, ga, gb, gab),
      |d AS (SELECT greatest(ta - corr, 0) AS ss_a,
      |    greatest(tb - corr, 0) AS ss_b,
      |    greatest(tab - corr, 0) AS ss_cells,
      |    greatest(greatest(tab - corr, 0) - greatest(ta - corr, 0)
      |      - greatest(tb - corr, 0), 0) AS ss_ab,
      |    greatest(qq - corr, 0) AS ss_tot,
      |    greatest(greatest(qq - corr, 0) - greatest(tab - corr, 0), 0)
      |      AS ss_err,
      |    la - 1 AS df_a, lb - 1 AS df_b,
      |    (la - 1) * (lb - 1) AS df_ab, nn - lab AS df_err
      |  FROM base),
      |m AS (SELECT *, ss_err // df_err AS mse FROM d)
      |SELECT 'a_returnflag' AS component, CAST(df_a AS BIGINT) AS df,
      |  CAST(ss_a AS BIGINT) AS ss_dollars2,
      |  CAST((ss_a // df_a) * 1000000 // nullif(mse, 0) AS BIGINT) AS f_ppm
      |FROM m
      |UNION ALL SELECT 'b_linestatus', CAST(df_b AS BIGINT),
      |  CAST(ss_b AS BIGINT),
      |  CAST((ss_b // df_b) * 1000000 // nullif(mse, 0) AS BIGINT) FROM m
      |UNION ALL SELECT 'error', CAST(df_err AS BIGINT),
      |  CAST(ss_err AS BIGINT), NULL FROM m
      |UNION ALL SELECT 'interaction', CAST(df_ab AS BIGINT),
      |  CAST(ss_ab AS BIGINT),
      |  CAST((ss_ab // df_ab) * 1000000 // nullif(mse, 0) AS BIGINT) FROM m
      |ORDER BY component""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q347_dbscan_census", q347, Some(q347Oracle)),
    QueryDef("q348_sprt_monitor", q348, Some(q348Oracle)),
    QueryDef("q349_ltv_triangle", q349, Some(q349Oracle)),
    QueryDef("q350_twoway_anova", q350, Some(q350Oracle)),
  )
}

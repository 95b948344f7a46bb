package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.ops.{MixOps, StatsOps, TextOps}

/** Round-12 sixteenth wave: causal inference (difference-in-
  * differences with a placebo audit, q301), the Nelson–Aalen
  * cumulative-hazard counterpart to q124's Kaplan–Meier (q302), RAKE
  * keyphrase extraction — the stopword-delimited phrase miner TF-IDF
  * and PMI don't cover (q303), and Neyman-optimal stratified
  * allocation with exact largest-remainder apportionment (q304).
  */
object Round12pQueries {

  private val dec = DecimalType(38, 0)

  // -- q301: difference-in-differences + placebo ---------------------------------
  // The two-group/two-period causal workhorse: customers hash-split
  // into treat/ctrl arms, periods cut at 1999-01-01, outcome = mean
  // order value on the 1e-4 cents grid (trunc-div over exact DECIMAL
  // sums). did_u = (post_t − pre_t) − (post_c − pre_c); the placebo
  // audit re-runs the estimator entirely inside the pre period (cut
  // 1997-01-01) where the true effect is zero by construction —
  // shipping the estimate WITHOUT its placebo is how DiD lies. One
  // conditional aggregate computes all six cells; everything after
  // rides a one-row frame.
  private val DidSeed = 424242L
  private val DidCut = "1999-01-01"
  private val DidPlaceboCut = "1997-01-01"

  private def q301(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType)
          .as("v_c"))
      .withColumn("grp",
        when(MixOps.portableHash2(col("o_custkey"), DidSeed) % 2 === 0,
          "treat").otherwise("ctrl"))
      .withColumn("period",
        when(to_date(col("o_orderdate")) < lit(DidPlaceboCut).cast("date"),
          "pre0")
          .when(to_date(col("o_orderdate")) < lit(DidCut).cast("date"),
            "pre1")
          .otherwise("post"))
    def cell(g: String, p: String, agg: String): Column = {
      val c = when(col("grp") === g && col("period") === p,
        if (agg == "n") lit(1L) else col("v_c")).otherwise(0L)
      sum(c.cast(dec)).cast(LongType)
    }
    val cells = o.agg(
      cell("treat", "pre0", "s").as("s_t0"), cell("treat", "pre0", "n").as("n_t0"),
      cell("treat", "pre1", "s").as("s_t1"), cell("treat", "pre1", "n").as("n_t1"),
      cell("treat", "post", "s").as("s_tp"), cell("treat", "post", "n").as("n_tp"),
      cell("ctrl", "pre0", "s").as("s_c0"), cell("ctrl", "pre0", "n").as("n_c0"),
      cell("ctrl", "pre1", "s").as("s_c1"), cell("ctrl", "pre1", "n").as("n_c1"),
      cell("ctrl", "post", "s").as("s_cp"), cell("ctrl", "post", "n").as("n_cp"))
    val stats = cells.select(
      expr("""(s_tp * 10000 div n_tp
             | - (s_t0 + s_t1) * 10000 div (n_t0 + n_t1))
             | - (s_cp * 10000 div n_cp
             |    - (s_c0 + s_c1) * 10000 div (n_c0 + n_c1))"""
        .stripMargin.replace("\n", " ")).as("did_u"),
      expr("""(s_t1 * 10000 div n_t1 - s_t0 * 10000 div n_t0)
             | - (s_c1 * 10000 div n_c1 - s_c0 * 10000 div n_c0)"""
        .stripMargin.replace("\n", " ")).as("placebo_did_u"))
    o.groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n_orders"),
        expr("sum(CAST(v_c AS DECIMAL(38,0))) * 10000 div count(1)")
          .as("mean_u"))
      .crossJoin(broadcast(stats))
      .orderBy(col("grp"), col("period"))
  }

  private val q301Oracle: String = {
    val p = MixOps.P
    val h = s"(((o_custkey % $p + $DidSeed) * 48271) % $p + 1) * 69621 % $p"
    s"""WITH o AS (SELECT
       |    CASE WHEN $h % 2 = 0 THEN 'treat' ELSE 'ctrl' END AS grp,
       |    CASE WHEN CAST(o_orderdate AS DATE) < DATE '$DidPlaceboCut'
       |        THEN 'pre0'
       |      WHEN CAST(o_orderdate AS DATE) < DATE '$DidCut' THEN 'pre1'
       |      ELSE 'post' END AS period,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c
       |  FROM orders),
       |cells AS (SELECT
       |    sum(CASE WHEN grp='treat' AND period='pre0' THEN v_c ELSE 0 END) AS s_t0,
       |    sum(CASE WHEN grp='treat' AND period='pre0' THEN 1 ELSE 0 END) AS n_t0,
       |    sum(CASE WHEN grp='treat' AND period='pre1' THEN v_c ELSE 0 END) AS s_t1,
       |    sum(CASE WHEN grp='treat' AND period='pre1' THEN 1 ELSE 0 END) AS n_t1,
       |    sum(CASE WHEN grp='treat' AND period='post' THEN v_c ELSE 0 END) AS s_tp,
       |    sum(CASE WHEN grp='treat' AND period='post' THEN 1 ELSE 0 END) AS n_tp,
       |    sum(CASE WHEN grp='ctrl' AND period='pre0' THEN v_c ELSE 0 END) AS s_c0,
       |    sum(CASE WHEN grp='ctrl' AND period='pre0' THEN 1 ELSE 0 END) AS n_c0,
       |    sum(CASE WHEN grp='ctrl' AND period='pre1' THEN v_c ELSE 0 END) AS s_c1,
       |    sum(CASE WHEN grp='ctrl' AND period='pre1' THEN 1 ELSE 0 END) AS n_c1,
       |    sum(CASE WHEN grp='ctrl' AND period='post' THEN v_c ELSE 0 END) AS s_cp,
       |    sum(CASE WHEN grp='ctrl' AND period='post' THEN 1 ELSE 0 END) AS n_cp
       |  FROM o),
       |stats AS (SELECT
       |    CAST((s_tp * 10000 // n_tp
       |        - (s_t0 + s_t1) * 10000 // (n_t0 + n_t1))
       |      - (s_cp * 10000 // n_cp
       |        - (s_c0 + s_c1) * 10000 // (n_c0 + n_c1)) AS BIGINT)
       |      AS did_u,
       |    CAST((s_t1 * 10000 // n_t1 - s_t0 * 10000 // n_t0)
       |      - (s_c1 * 10000 // n_c1 - s_c0 * 10000 // n_c0) AS BIGINT)
       |      AS placebo_did_u
       |  FROM cells)
       |SELECT grp, period, count(*) AS n_orders,
       |  CAST(sum(v_c) * 10000 // count(*) AS BIGINT) AS mean_u,
       |  did_u, placebo_did_u
       |FROM o, stats GROUP BY 1, 2, did_u, placebo_did_u
       |ORDER BY grp, period""".stripMargin
  }

  // -- q302: Nelson–Aalen cumulative hazard --------------------------------------
  // The estimator-level cross-check of q124's Kaplan–Meier (same
  // duration/censoring contract: first-ship latency, every fifth
  // order censored at day 30): H(t) = Σ_{s≤t} d_s/n_s accumulated as
  // EXACT ppb trunc-div terms — unlike KM's log-product, the hazard
  // sum needs no transcendental at all, so this curve is float-free
  // end to end. Variance (Σ d/n²) rides a 1e-12 grid the same way.
  // Both distinct-duration prefixes ride LayoutOps.censusCum (round
  // 17, closing the round-16 survival-family sweep): on a continuous
  // duration column the distinct-time census approaches the subject
  // count, so an unpartitioned Window.orderBy(t) would sort it on one
  // task — StatsOps.kaplanMeier (q124) is the model.
  private def q302(spark: SparkSession, sfDir: String): DataFrame = {
    val firstShip = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship"))
    val obs = Tables.read(spark, sfDir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(datediff(to_date(col("ship")), to_date(col("o_orderdate")))
        .cast(LongType).as("dur"),
        (col("o_orderkey") % 5 =!= 0).as("evt"))
      .select(when(col("evt"), col("dur"))
        .otherwise(least(col("dur"), lit(30L))).as("t"), col("evt"))
    val g = obs.groupBy(col("t")).agg(
      sum(when(col("evt"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("evt"), 1L).otherwise(0L)).as("c"))
      .withColumn("dc", col("d") + col("c"))
    // exclusive risk-set prefix = inclusive minus the row's own mass
    val cum1 = graft.ops.LayoutOps.censusCum(g, "t", Seq("dc"),
      inclusive = true)
    val nTot = cum1.agg(sum(col("dc")).as("n_tot"))
    val withRisk = cum1.crossJoin(broadcast(nTot))
      .withColumn("n_risk", col("n_tot") - (col("__cum_dc") - col("dc")))
      .withColumn("hterm", expr("d * 1000000000 div n_risk"))
      .withColumn("vterm", expr("d * 1000000000000 div (n_risk * n_risk)"))
    val cum2 = graft.ops.LayoutOps.censusCum(withRisk, "t",
      Seq("hterm", "vterm"), inclusive = true)
    cum2.select(col("t"), col("n_risk"), col("d"), col("c"),
      col("__cum_hterm").as("haz_u"), col("__cum_vterm").as("var_u"))
      .orderBy(col("t"))
  }

  private val q302Oracle: String =
    """WITH obs AS (SELECT CASE WHEN o_orderkey % 5 <> 0 THEN dur
      |      ELSE least(dur, 30) END AS t,
      |    o_orderkey % 5 <> 0 AS evt
      |  FROM (SELECT o.o_orderkey,
      |      CAST(datediff('day', CAST(o.o_orderdate AS DATE),
      |        CAST(s.ship AS DATE)) AS BIGINT) AS dur
      |    FROM orders o JOIN (SELECT l_orderkey, min(l_shipdate) AS ship
      |        FROM lineitem GROUP BY 1) s
      |      ON o.o_orderkey = s.l_orderkey)),
      |g AS (SELECT t,
      |    CAST(sum(CASE WHEN evt THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN NOT evt THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_tot FROM g),
      |risk AS (SELECT t, d, c,
      |    n_tot - CAST(coalesce(sum(d + c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS n_risk
      |  FROM g, tot)
      |SELECT t, n_risk, d, c,
      |  CAST(sum(d * 1000000000 // n_risk) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS haz_u,
      |  CAST(sum(d * 1000000000000 // (n_risk * n_risk)) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS var_u
      |FROM risk ORDER BY t""".stripMargin

  // -- q303: RAKE keyphrase extraction -------------------------------------------
  // Rapid Automatic Keyword Extraction: candidate phrases = maximal
  // stopword-free token runs (gaps-and-islands per document), word
  // score = degree/frequency over phrase membership as an exact ppm
  // pick, phrase score = Σ member word scores (order-free integer
  // sum), distinct phrases ranked top-20. The per-doc position
  // windows partition on doc_id (fact-parallel); the word-stats join
  // is token-keyed; the result is a 20-row TakeOrdered. Phrases of
  // one token are noise by the RAKE definition and dropped.
  private val RakeStops: Seq[String] = TextOps.langStopwords.toMap
    .apply("en")
  private val RakeK = 20

  private def q303(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .where(!col("tok").isin(RakeStops: _*))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = toks
      .withColumn("run", col("pos") - row_number().over(wDoc))
    val phrases = runs.groupBy(col("doc_id"), col("run"))
      .agg(count(lit(1)).as("plen"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("phrase"),
        collect_list(col("tok")).as("members"))
      .where(col("plen") >= 2)
      .localCheckpoint(true) // word stats + phrase scoring
    val words = phrases.select(col("plen"), explode(col("members")).as("w"))
    val wstats = words.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"), expr("deg * 1000000 div freq").as("wscore_u"))
    val perInstance = phrases
      .select(col("doc_id"), col("run"), col("phrase"),
        explode(col("members")).as("w"))
      .join(wstats, Seq("w"))
      .groupBy(col("doc_id"), col("run"), col("phrase"))
      .agg(sum(col("wscore_u")).as("score_u"))
    // every occurrence of a phrase string scores identically (same
    // members, same global word stats) — min() is just the
    // deterministic pick
    perInstance.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("score_u")).as("score_u"))
      .orderBy(col("score_u").desc, col("phrase"))
      .limit(RakeK)
  }

  private val q303Oracle: String = {
    val stops = RakeStops.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, pos, tok
       |  FROM (SELECT doc_id,
       |      generate_subscripts(${TextOps.tokensSql("text")}, 1) AS pos,
       |      unnest(${TextOps.tokensSql("text")}) AS tok
       |    FROM documents)
       |  WHERE tok NOT IN ($stops)),
       |runs AS (SELECT doc_id, pos, tok,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS run
       |  FROM toks),
       |phrases AS (SELECT doc_id, run, count(*) AS plen,
       |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
       |    list(tok) AS members
       |  FROM runs GROUP BY 1, 2 HAVING count(*) >= 2),
       |words AS (SELECT plen, unnest(members) AS w FROM phrases),
       |wstats AS (SELECT w, CAST(sum(plen) * 1000000 // count(*)
       |      AS BIGINT) AS wscore_u
       |  FROM words GROUP BY 1),
       |inst AS (SELECT doc_id, run, phrase,
       |    CAST(sum(wscore_u) AS BIGINT) AS score_u
       |  FROM (SELECT doc_id, run, phrase, unnest(members) AS w
       |        FROM phrases) p
       |  JOIN wstats USING (w)
       |  GROUP BY 1, 2, 3)
       |SELECT phrase, count(*) AS n_occurrences,
       |  CAST(min(score_u) AS BIGINT) AS score_u
       |FROM inst GROUP BY 1
       |ORDER BY score_u DESC, phrase LIMIT $RakeK""".stripMargin
  }

  // -- q304: Neyman allocation (largest-remainder apportionment) -----------------
  // Optimal stratified-sampling allocation: budget 10000 split across
  // (returnflag, linestatus) strata proportional to N_h·S_h. Each
  // stratum weight is ONE fixed IEEE sqrt over exact DECIMAL sums
  // landed on the unit grid; the apportionment is the exact
  // largest-remainder (Hamilton) method — floor shares, then the
  // leftover seats go to the largest remainders with a stratum-name
  // tiebreak — so Σ alloc = budget EXACTLY, deterministically. The
  // stratum frame is ≤ a few rows; the only fact work is one
  // sums aggregate.
  private val NeymanBudget = 10000L

  private def q304(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
          .as("x"))
      .groupBy(col("rf"), col("ls"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("x").cast(dec)).as("sx"),
        sum((col("x").cast(dec) * col("x"))).as("sxx"))
      .select(col("rf"), col("ls"), col("n_h"),
        floor(col("n_h").cast(DoubleType) *
          sqrt((col("n_h").cast(DoubleType) * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) /
            (col("n_h").cast(DoubleType) *
              (col("n_h").cast(DoubleType) - 1))) + lit(0.5))
          .cast(LongType).as("w_u"))
      .localCheckpoint(true) // total + floor shares + remainder ranks
    val w = st.agg(sum(col("w_u")).as("__w"))
    val shares = st.crossJoin(broadcast(w))
      .withColumn("floor_a", expr(s"(w_u * $NeymanBudget) div __w"))
      .withColumn("rem", expr(s"(w_u * $NeymanBudget) % __w"))
      .localCheckpoint(true)
    val used = shares.agg(sum(col("floor_a")).as("__used"))
    val ranked = shares.crossJoin(broadcast(used))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("rf"), col("ls"))))
      .withColumn("alloc",
        col("floor_a") +
          when(col("rk") <= lit(NeymanBudget) - col("__used"), 1L)
            .otherwise(0L))
    ranked.select(col("rf"), col("ls"), col("n_h"), col("w_u"),
        col("alloc"))
      .orderBy(col("rf"), col("ls"))
  }

  private val q304Oracle: String =
    s"""WITH st AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
       |    count(*) AS n_h,
       |    CAST(floor(CAST(count(*) AS DOUBLE) * sqrt(
       |      (CAST(count(*) AS DOUBLE) * CAST(sum(xx) AS DOUBLE)
       |        - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
       |      / (CAST(count(*) AS DOUBLE)
       |        * (CAST(count(*) AS DOUBLE) - 1))) + 0.5) AS BIGINT)
       |      AS w_u
       |  FROM (SELECT l_returnflag, l_linestatus,
       |      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
       |      CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
       |        * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xx
       |    FROM lineitem) t
       |  GROUP BY 1, 2),
       |w AS (SELECT CAST(sum(w_u) AS BIGINT) AS tw FROM st),
       |shares AS (SELECT rf, ls, n_h, w_u,
       |    CAST(w_u * $NeymanBudget // tw AS BIGINT) AS floor_a,
       |    CAST(w_u * $NeymanBudget % tw AS BIGINT) AS rem
       |  FROM st, w),
       |used AS (SELECT CAST(sum(floor_a) AS BIGINT) AS used FROM shares),
       |ranked AS (SELECT *, row_number() OVER
       |    (ORDER BY rem DESC, rf, ls) AS rk
       |  FROM shares)
       |SELECT rf, ls, n_h, w_u,
       |  CAST(floor_a + CASE WHEN rk <= $NeymanBudget - used
       |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM ranked, used ORDER BY rf, ls""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q301_did_estimator", q301, Some(q301Oracle)),
    QueryDef("q302_nelson_aalen", q302, Some(q302Oracle)),
    QueryDef("q303_rake_keyphrases", q303, Some(q303Oracle)),
    QueryDef("q304_neyman_alloc", q304, Some(q304Oracle)))
}

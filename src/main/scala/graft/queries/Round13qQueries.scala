package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 seventeenth wave: permutation-test FDR (q371 — exact
  * hash-permutation p-values under Benjamini-Hochberg, no CDF ever
  * evaluated), James-Stein shrinkage (q372 — empirical-Bayes partial
  * pooling of group means), the Sn robust scale (q373 — pairwise
  * median-of-medians on the calendar-bounded day frame). (A fourth op —
  * full DBSCAN clustering via label propagation over the core graph —
  * was built and REMOVED: on the dense fixture the pointer-doubling
  * lineage sent Catalyst's size-estimation visitor into exponential
  * BigInt products before the lazy checkpoints could truncate it;
  * q347's core/border/noise census remains the DBSCAN surface.)
  */
object Round13qQueries {

  // -- q371: permutation-test FDR ---------------------------------------------------------
  // Multiple testing done exactly: per nation, the deviation of its
  // mean balance from the grand mean; the null is 99 HASH
  // permutations of the labels (deterministic LCG rebinning — totals
  // are preserved exactly), the p-value is the permutation rank in
  // 100ths, and Benjamini-Hochberg at α = 0.05 over m = 25 reduces to
  // the INTEGER condition p100·5 ≤ rank. No distributional CDF is
  // ever evaluated. The only data-sized work is one real census and
  // one ×99 permutation census.
  private val FdrPerms = 99

  private def q371(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey").as("ck"),
        col("c_nationkey").cast("long").as("nk"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      .localCheckpoint(true) // feeds the real census AND 99 permuted
    val g = cust.agg(count(lit(1)).as("nn"), sum(col("v")).as("gg"))
    // the cross-multiplication rides DECIMAL(38,0) from the first
    // product (ADVICE r14, with q391/q396): BIGINT s * nn sits within
    // a small factor of Long.MAX at ~sf100+, where Spark wraps
    // silently while DuckDB raises
    val statMilli = "abs(CAST(s AS DECIMAL(38,0)) * nn" +
      " - CAST(gg AS DECIMAL(38,0)) * n)" +
      " * 1000 div (CAST(n AS DECIMAL(38,0)) * nn)"
    val obs = cust.groupBy("nk")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .crossJoin(broadcast(g))
      .select(col("nk"), col("n"), expr(statMilli).as("stat_milli"))
    val perms = (1 to FdrPerms).map(_.toLong).toDF("p")
    val permStats = cust.crossJoin(broadcast(perms))
      .select(col("p"), expr("((((ck + p * 1000003) * 1103515245" +
        " + 12345) % 2147483648) * 1103515245 + 54321) % 2147483648 % 25")
        .as("nk"), col("v"))
      .groupBy("p", "nk").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .crossJoin(broadcast(g))
      .select(col("nk"), expr(statMilli).as("perm_stat"))
    val pvals = obs.join(permStats, Seq("nk"), "left")
      .groupBy("nk", "n", "stat_milli")
      .agg((lit(1L) + sum(when(col("perm_stat") >= col("stat_milli"), 1L)
        .otherwise(0L))).as("p100"))
    val ranked = pvals.withColumn("bh_rank",
      row_number().over(Window.orderBy(col("p100"), col("nk")))
        .cast("long"))
    val kmax = ranked.agg(coalesce(max(when(
      col("p100") * 5L <= col("bh_rank"), col("bh_rank"))), lit(0L))
      .as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("nk"), col("n"), col("stat_milli"), col("p100"),
        col("bh_rank"), (col("bh_rank") <= col("kmax")).as("rejected"))
      .orderBy("nk")
  }

  private val q371Oracle: String = {
    val statMilli = "abs(CAST(s AS HUGEINT) * nn" +
      " - CAST(gg AS HUGEINT) * n)" +
      " * 1000 // (CAST(n AS HUGEINT) * nn)"
    s"""WITH cust AS (SELECT c_custkey AS ck,
       |    CAST(c_nationkey AS BIGINT) AS nk,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
       |  FROM customer),
       |g AS (SELECT count(*) AS nn, CAST(sum(v) AS BIGINT) AS gg
       |  FROM cust),
       |obs AS (SELECT nk, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
       |  FROM cust GROUP BY 1),
       |obs2 AS (SELECT nk, n, $statMilli AS stat_milli
       |  FROM obs CROSS JOIN g),
       |ps AS (SELECT CAST(p AS BIGINT) AS p
       |  FROM range(1, ${FdrPerms + 1}) t(p)),
       |perm AS (SELECT p,
       |    ((((ck + p * 1000003) * 1103515245 + 12345) % 2147483648)
       |      * 1103515245 + 54321) % 2147483648 % 25 AS nk, v
       |  FROM cust CROSS JOIN ps),
       |pc AS (SELECT p, nk, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
       |  FROM perm GROUP BY 1, 2),
       |pstat AS (SELECT nk, $statMilli AS perm_stat
       |  FROM pc CROSS JOIN g),
       |pv AS (SELECT o.nk, o.n, o.stat_milli,
       |    1 + count(CASE WHEN perm_stat >= stat_milli THEN 1 END) AS p100
       |  FROM obs2 o LEFT JOIN pstat s ON o.nk = s.nk
       |  GROUP BY 1, 2, 3),
       |rk AS (SELECT *, row_number() OVER (ORDER BY p100, nk) AS bh_rank
       |  FROM pv),
       |km AS (SELECT coalesce(max(CASE WHEN p100 * 5 <= bh_rank
       |    THEN bh_rank END), 0) AS kmax FROM rk)
       |SELECT nk, n, CAST(stat_milli AS BIGINT) AS stat_milli,
       |  CAST(p100 AS BIGINT) AS p100, CAST(bh_rank AS BIGINT) AS bh_rank,
       |  bh_rank <= kmax AS rejected
       |FROM rk CROSS JOIN km ORDER BY nk""".stripMargin
  }

  // -- q372: James-Stein shrinkage -----------------------------------------------------------
  // Empirical-Bayes partial pooling of the per-nation mean balances:
  // method-of-moments between-group variance τ² = max(0, Var(x̄_i) −
  // σ̂²·mean(1/n_i)) with σ̂² the pooled within variance, then each
  // group shrinks by B_i = τ²/(τ² + σ̂²/n_i) — small groups pool
  // harder, exactly the behavior a per-segment rate table needs.
  // Every component is a per-term trunc-div integer on cents²/milli
  // grids; the one signed quantity (raw − grand) rides sign-safe.
  private def q372(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "customer")
      .select(col("c_nationkey").cast("long").as("nk"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      .groupBy("nk").agg(count(lit(1)).as("n"),
        sum(expr("CAST(v AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("q"))
      .withColumn("raw_milli", expr("CASE WHEN s < 0" +
        " THEN -((-s) * 1000 div n) ELSE s * 1000 div n END"))
      .localCheckpoint(true) // ≤ 25 rows; feeds pooled stats AND rows
    val pooled = cells.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s")).as("ss"),
      // pooled within variance: Σ(q − s²/n) / (N − k), cents²
      sum(expr("q - s * s div n")).as("wnum"),
      sum(expr("1000000000 div n")).as("hsum"),
      // between variance of the means: Σ n·(mean − grand)² needs the
      // grand mean — assembled below from ss/nn
      sum(expr("CAST(CASE WHEN s < 0 THEN -((-s) * 1000 div n)" +
        " ELSE s * 1000 div n END AS DECIMAL(38,0))" +
        " * (CASE WHEN s < 0 THEN -((-s) * 1000 div n)" +
        " ELSE s * 1000 div n END)")).as("m2sum"),
      sum(expr("CAST(CASE WHEN s < 0 THEN -((-s) * 1000 div n)" +
        " ELSE s * 1000 div n END AS DECIMAL(38,0))")).as("msum"))
      .select(col("k"), col("nn"), col("ss"),
        expr("CAST(wnum div (nn - k) AS BIGINT)").as("sigma2"),
        expr("hsum div k").as("hmean_ppb"),
        // Var of the group means on the milli grid:
        // (Σm² − (Σm)²/k) / (k−1), milli²-cents²
        expr("CAST((m2sum - msum * msum div k) div (k - 1) AS BIGINT)")
          .as("varmeans_milli2"),
        expr("CASE WHEN ss < 0 THEN -((-ss) * 1000 div nn)" +
          " ELSE ss * 1000 div nn END").as("grand_milli"))
      // tau² must STAY DECIMAL: a long τ²·1e6 overflows 2^63 as soon
      // as the between-variance is real (observed on the planted
      // fixture)
      .withColumn("tau2_milli2", expr("greatest(CAST(0 AS DECIMAL(38,0))," +
        " varmeans_milli2 - CAST(sigma2 AS DECIMAL(38,0)) * 1000000" +
        " * hmean_ppb div 1000000000)"))
    cells.crossJoin(broadcast(pooled))
      .withColumn("b_ppm", expr("CAST(tau2_milli2 AS DECIMAL(38,0))" +
        " * 1000000 div nullif(CAST(tau2_milli2 AS DECIMAL(38,0))" +
        " + CAST(sigma2 AS DECIMAL(38,0)) * 1000000 div n, 0)"))
      .withColumn("shrunk_milli", expr("grand_milli +" +
        " CASE WHEN raw_milli < grand_milli" +
        " THEN -((grand_milli - raw_milli) * b_ppm div 1000000)" +
        " ELSE (raw_milli - grand_milli) * b_ppm div 1000000 END"))
      .select(col("nk"), col("n"), col("raw_milli"), col("b_ppm"),
        col("shrunk_milli"))
      .orderBy("nk")
  }

  private val q372Oracle: String =
    """WITH cells AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
      |    count(*) AS n,
      |    sum(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
      |      AS HUGEINT)) AS s,
      |    sum(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
      |      AS HUGEINT) * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
      |      AS q
      |  FROM customer GROUP BY 1),
      |cm AS (SELECT *, CASE WHEN s < 0 THEN -((-s) * 1000 // n)
      |    ELSE s * 1000 // n END AS raw_milli FROM cells),
      |pooled AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |    sum(s) AS ss, sum(q - s * s // n) AS wnum,
      |    CAST(sum(1000000000 // n) AS BIGINT) AS hsum,
      |    sum(CAST(raw_milli AS HUGEINT) * raw_milli) AS m2sum,
      |    sum(CAST(raw_milli AS HUGEINT)) AS msum
      |  FROM cm),
      |p2 AS (SELECT k, nn,
      |    CAST(wnum // (nn - k) AS HUGEINT) AS sigma2,
      |    hsum // k AS hmean_ppb,
      |    CAST((m2sum - msum * msum // k) // (k - 1) AS HUGEINT)
      |      AS varmeans_milli2,
      |    CASE WHEN ss < 0 THEN -((-ss) * 1000 // nn)
      |      ELSE ss * 1000 // nn END AS grand_milli
      |  FROM pooled),
      |p3 AS (SELECT *, greatest(CAST(0 AS HUGEINT), varmeans_milli2
      |    - sigma2 * 1000000 * hmean_ppb // 1000000000) AS tau2_milli2
      |  FROM p2)
      |SELECT nk, n, CAST(raw_milli AS BIGINT) AS raw_milli,
      |  CAST(tau2_milli2 * 1000000 // nullif(tau2_milli2
      |    + sigma2 * 1000000 // n, 0) AS BIGINT) AS b_ppm,
      |  CAST(grand_milli + CASE WHEN raw_milli < grand_milli
      |    THEN -((grand_milli - raw_milli) * (tau2_milli2 * 1000000
      |      // nullif(tau2_milli2 + sigma2 * 1000000 // n, 0)) // 1000000)
      |    ELSE (raw_milli - grand_milli) * (tau2_milli2 * 1000000
      |      // nullif(tau2_milli2 + sigma2 * 1000000 // n, 0)) // 1000000
      |    END AS BIGINT) AS shrunk_milli
      |FROM cm CROSS JOIN p3 ORDER BY nk""".stripMargin

  // -- q373: Sn robust scale --------------------------------------------------------------------
  // Rousseeuw-Croux Sn on the daily revenue series: for each day the
  // median of its absolute differences to every other day, then the
  // median of those medians, scaled by the 1.1926 consistency
  // constant. The pairwise frame is day² — calendar-bounded (the q251
  // argument), never data². Medians are the exact interpolating
  // percentile; the one float product lands on a milli grid. MAD
  // reported alongside: Sn needs no center, MAD does.
  //
  // The per-day inner medians materialize NO pair-sized state (round
  // 17, the stretched-calendar stress: `percentile(abs(y−yb), 0.5)`
  // buffers all D−1 distances PER GROUP — day² longs in agg buffers,
  // spilled at 24k days). Instead the q228 3-pass pair-stream
  // selection, per-group: one probe pass fixes GLOBAL approx distance
  // cuts (any contiguous placement is rank-exact per day), one pass
  // takes exact per-(day, bucket) counts — every day's rank targets
  // are known for free (its distance count is exactly D−1) — and the
  // last pass ranks only each day's 1-2 median buckets (~1/32 of the
  // mass), windowed per (day, bucket).
  private val SnBuckets = 32

  private def q373(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily0 = Tables.read(spark, sfDir, "orders")
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))" +
        " div 100").as("y"))
      .localCheckpoint(true) // day count + the repartitioned pair base
    val nDays = daily0.count()
    // day² pair enumeration below is quadratic in these rows while
    // the census is byte-tiny: AQE's byte-based coalescing would
    // hand the whole pair stream to ONE task (measured +2 s at
    // sf0.1, worse at 25k days). Round 18: spread over an INPUT-SIZED
    // task count (pairs/2¹⁸, slot-capped) instead of raw slots —
    // the round-17 slots pin paid 32 scheduling quanta per ~90k-pair
    // stage at sf0.1 (the q201 lesson, VERDICT r17 #2).
    val daily = daily0
      .repartition(graft.ops.StatsOps.densePin(spark, nDays * (nDays - 1L)))
      .localCheckpoint(true) // feeds the pair frame AND the MAD side
    val b = broadcast(daily.select(col("day").as("dayb"), col("y").as("yb")))
    def pairs: DataFrame = daily.crossJoin(b)
      .where(col("day") =!= col("dayb"))
      .select(col("day"), abs(col("y") - col("yb")).as("dist"))
    val fracs = (1 until SnBuckets).map(_.toDouble / SnBuckets)
    // cut placement is rank-exact per day for ANY contiguous
    // bucketing, so the cuts probe rides a deterministic ≤2048-day
    // stride sample of BOTH sides; nper = D − 1 is exact arithmetic.
    // Cuts and nper are CONFIG-bounded scalars: they ride as literals
    // (round 18 — the one-row probe frame cost a checkpoint plus one
    // broadcast-build job per consuming pass).
    val stride = math.max(1L, (nDays + 2047L) / 2048L)
    val sL = daily.where(pmod(unix_date(col("day")), lit(stride)) === 0)
    val sR = broadcast(sL.select(col("day").as("dayb"), col("y").as("yb")))
    val cutsRow = sL.crossJoin(sR).where(col("day") =!= col("dayb"))
      .agg(percentile_approx(abs(col("y") - col("yb")),
        array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
      .head()
    val cuts: Seq[Long] =
      if (cutsRow.isNullAt(0)) Nil else cutsRow.getSeq[Long](0)
    val (r1, r2) = ((nDays - 2L) / 2L, (nDays - 1L) / 2L) // 0-based, per day
    def bucketed: DataFrame = pairs
      .withColumn("__bkt", cuts.foldLeft(lit(1)) {
        case (acc, c) => acc + when(col("dist") > lit(c), 1).otherwise(0)
      })
    val offs = bucketed.groupBy("day", "__bkt")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n"))
        .over(Window.partitionBy("day").orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // 0-based median ranks over each day's D-1 distances
    val targets = offs
      .where(lit(r2) >= col("__off") && lit(r1) < col("__off") + col("__n"))
      .select(col("day"), col("__bkt"), col("__off"))
    val w = Window.partitionBy("day", "__bkt").orderBy("dist")
      .rowsBetween(Window.unboundedPreceding, 0)
    // a day whose two median ranks straddle a bucket boundary keeps
    // BOTH buckets: the window stays per (day, bucket) so each row's
    // prefix adds only its own bucket's mass to that bucket's offset
    val inner = bucketed.join(broadcast(targets), Seq("day", "__bkt"))
      .groupBy(col("day"), col("__bkt"), col("__off"), col("dist"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum0",
        col("__off") + sum(col("__c")).over(w) - col("__c"))
      .groupBy("day").agg(
        ((max(when(lit(r1) >= col("__cum0") &&
            lit(r1) < col("__cum0") + col("__c"), col("dist"))) +
          max(when(lit(r2) >= col("__cum0") &&
            lit(r2) < col("__cum0") + col("__c"), col("dist"))))
          .cast("double") / lit(2.0)).as("medabs"))
    val sn = inner.agg(count(lit(1)).as("n_days"),
      expr("CAST(floor(percentile(medabs, 0.5) * 1.1926 * 1000 + 0.5)" +
        " AS BIGINT)").as("sn_milli"))
    // the MAD side's center and scale are day-grain scalars: literals,
    // not one-row broadcast frames (round 18)
    val m: Double = daily.agg(expr("percentile(y, 0.5)")).head().getDouble(0)
    val madMilli: Long = daily
      .agg(floor(percentile(abs(col("y") - lit(m)), lit(0.5)) * lit(1.4826)
        * lit(1000) + lit(0.5)).cast("long"))
      .head().getLong(0)
    sn.withColumn("mad_milli", lit(madMilli))
  }

  private val q373Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
      |      AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |inner_ AS (SELECT a.day, quantile_cont(abs(a.y - b.y), 0.5)
      |    AS medabs
      |  FROM daily a JOIN daily b ON a.day <> b.day GROUP BY 1),
      |sn AS (SELECT count(*) AS n_days,
      |    CAST(floor(quantile_cont(medabs, 0.5) * 1.1926 * 1000 + 0.5)
      |      AS BIGINT) AS sn_milli FROM inner_),
      |med AS (SELECT quantile_cont(y, 0.5) AS m FROM daily),
      |mad AS (SELECT CAST(floor(quantile_cont(abs(y - m), 0.5) * 1.4826
      |    * 1000 + 0.5) AS BIGINT) AS mad_milli
      |  FROM daily CROSS JOIN med)
      |SELECT n_days, sn_milli, mad_milli FROM sn CROSS JOIN mad""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q371_permutation_fdr", q371, Some(q371Oracle)),
    QueryDef("q372_james_stein", q372, Some(q372Oracle)),
    QueryDef("q373_sn_scale", q373, Some(q373Oracle)),
  )
}

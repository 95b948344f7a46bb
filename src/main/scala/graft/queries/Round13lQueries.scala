package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-13 twelfth wave: ridge-regression hyperparameter sweep from
  * sufficient statistics (q351 — moments once, sweep many), the Hill
  * tail-index estimator (q352 — heavy-tail diagnosis from the top
  * order statistics), an experiment power calculator (q353 — sample
  * sizes from compile-time z literals), and Pareto ABC classification
  * (q354 — the 80/15/5 inventory census).
  */
object Round13lQueries {

  // -- q351: ridge sweep from sufficient statistics -------------------------------------
  // The distributed-ML hyperparameter pattern: the expensive pass
  // computes the five regression moments ONCE (train split, day-grain
  // revenue-vs-time), then every λ in the grid is pure algebra —
  // slope_λ = Sxy_c·1000 div (Sxx_c + n·λ), intercept from the means —
  // and each candidate's validation MSE is one small joined scan.
  // Signed numerators ride the sign-safe div pattern; squares ride
  // DECIMAL/HUGEINT. Best λ = min validation MSE, ties to smaller λ.
  private val RidgeLambdas = Seq(0L, 100000000L, 1000000000L)

  private def q351(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(expr("CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01'" +
        " AS BIGINT)").as("x"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))" +
        " div 100").as("y"))
      .localCheckpoint(true) // feeds the train moments AND the val scan
    val train = daily.where(col("x") % 5 =!= 0)
    val va = daily.where(col("x") % 5 === 0)
    val mom = train.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
    val lam = RidgeLambdas.toDF("lambda")
    val fits = lam.crossJoin(broadcast(mom))
      .withColumn("bn", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("bd", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx" +
        " + CAST(lambda AS DECIMAL(38,0)) * n"))
      .withColumn("b_milli", expr("CASE WHEN bn < 0" +
        " THEN -((-bn) * 1000 div bd) ELSE bn * 1000 div bd END"))
      .withColumn("an", expr("sy * 1000 - b_milli * sx"))
      .withColumn("a_milli", expr("CASE WHEN an < 0" +
        " THEN -((-an) div n) ELSE an div n END"))
      .select(col("lambda"), col("b_milli"), col("a_milli"))
    val scored = va.crossJoin(broadcast(fits))
      .withColumn("e", expr("y * 1000 - (a_milli + b_milli * x)"))
      .groupBy("lambda", "b_milli", "a_milli")
      .agg(expr("CAST(sum(CAST(e AS DECIMAL(38,0)) * e)" +
        " div (count(*) * 1000000) AS BIGINT)").as("val_mse"))
    scored
      .withColumn("rk", row_number().over(
        Window.orderBy(col("val_mse"), col("lambda"))))
      .select(col("lambda"), col("b_milli"), col("a_milli"),
        col("val_mse"), (col("rk") === 1).as("is_best"))
      .orderBy("lambda")
  }

  private val q351Oracle: String = {
    val lams = RidgeLambdas.map(l => s"($l)").mkString(",")
    s"""WITH daily AS (SELECT
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
       |      AS x,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |mom AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM daily WHERE x % 5 <> 0),
       |fits AS (SELECT lambda,
       |    CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy < 0
       |      THEN -((-(n * sxy - CAST(sx AS HUGEINT) * sy)) * 1000
       |        // (n * sxx - CAST(sx AS HUGEINT) * sx
       |          + CAST(lambda AS HUGEINT) * n))
       |      ELSE (n * sxy - CAST(sx AS HUGEINT) * sy) * 1000
       |        // (n * sxx - CAST(sx AS HUGEINT) * sx
       |          + CAST(lambda AS HUGEINT) * n) END AS b_milli,
       |    n, sx, sy
       |  FROM (SELECT * FROM (VALUES $lams) l(lambda)) CROSS JOIN mom),
       |fits2 AS (SELECT lambda, b_milli,
       |    CASE WHEN sy * 1000 - b_milli * sx < 0
       |      THEN -((-(sy * 1000 - b_milli * sx)) // n)
       |      ELSE (sy * 1000 - b_milli * sx) // n END AS a_milli
       |  FROM fits),
       |scored AS (SELECT lambda, b_milli, a_milli,
       |    CAST(sum(CAST(y * 1000 - (a_milli + b_milli * x) AS HUGEINT)
       |        * (y * 1000 - (a_milli + b_milli * x)))
       |      // (count(*) * 1000000) AS BIGINT) AS val_mse
       |  FROM daily CROSS JOIN fits2 WHERE x % 5 = 0
       |  GROUP BY 1, 2, 3),
       |rk AS (SELECT *, row_number() OVER (ORDER BY val_mse, lambda) AS rk
       |  FROM scored)
       |SELECT CAST(lambda AS BIGINT) AS lambda,
       |  CAST(b_milli AS BIGINT) AS b_milli,
       |  CAST(a_milli AS BIGINT) AS a_milli, val_mse, rk = 1 AS is_best
       |FROM rk ORDER BY lambda""".stripMargin
  }

  // -- q352: Hill tail-index estimator ----------------------------------------------------
  // Heavy-tail diagnosis from the top order statistics: α̂(k) =
  // k / Σ_{i≤k} ln(x_i / x_{k+1}). The only distributed work is ONE
  // top-(K+1) TakeOrdered; the log terms land on the micro-nat grid
  // BEFORE any arithmetic (the q214 discipline — a gridded float is a
  // defined value, not last-ulp noise), so the estimator is an exact
  // integer function of the gridded terms.
  private val HillKs = Seq(50L, 100L, 200L)

  private def q352(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val top = Tables.read(spark, sfDir, "orders")
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .as("v"), col("o_orderkey").as("ok"))
      .orderBy(col("v").desc, col("ok")).limit(HillKs.max.toInt + 1)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("v").desc, col("ok"))))
      .withColumn("lnv", expr("CAST(floor(ln(v) * 1000000 + 0.5)" +
        " AS BIGINT)"))
      .localCheckpoint(true) // ≤ 201 rows; feeds every k branch
    val ks = HillKs.toDF("k")
    val sums = ks.join(broadcast(top), col("rank") <= col("k"))
      .groupBy("k").agg(sum(col("lnv")).as("sum_ln"))
    val refs = ks.join(broadcast(top), col("rank") === col("k") + 1)
      .select(col("k").as("k2"), col("v").as("x_ref"),
        col("lnv").as("ln_ref"))
    sums.join(refs, col("k") === col("k2"))
      .select(col("k"), col("x_ref"),
        (col("sum_ln") - col("k") * col("ln_ref")).as("sum_lnratio_micro"),
        expr("k * 1000000000 div nullif(sum_ln - k * ln_ref, 0)")
          .as("hill_alpha_milli"))
      .orderBy("k")
  }

  private val q352Oracle: String = {
    val ks = HillKs.map(k => s"($k)").mkString(",")
    val kmax = HillKs.max + 1
    s"""WITH top AS (SELECT v, row_number() OVER (ORDER BY v DESC, ok)
       |    AS rank,
       |    CAST(floor(ln(v) * 1000000 + 0.5) AS BIGINT) AS lnv
       |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
       |      o_orderkey AS ok FROM orders
       |    ORDER BY v DESC, ok LIMIT $kmax)),
       |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES $ks) k(k)),
       |sums AS (SELECT k, CAST(sum(lnv) AS BIGINT) AS sum_ln
       |  FROM ks JOIN top ON rank <= k GROUP BY 1),
       |refs AS (SELECT k AS k2, v AS x_ref, lnv AS ln_ref
       |  FROM ks JOIN top ON rank = k + 1)
       |SELECT CAST(k AS BIGINT) AS k, x_ref,
       |  CAST(sum_ln - k * ln_ref AS BIGINT) AS sum_lnratio_micro,
       |  CAST(k * 1000000000 // nullif(sum_ln - k * ln_ref, 0) AS BIGINT)
       |    AS hill_alpha_milli
       |FROM sums JOIN refs ON k = k2 ORDER BY k""".stripMargin
  }

  // -- q353: experiment power calculator ---------------------------------------------------
  // The design-time what-if before an A/B test: per event type, the
  // baseline engagement rate p (value ≥ 150, the q326 gate) and the
  // per-arm sample size for relative MDEs of 1/2/5% at α = 0.05
  // (two-sided), power 80%. With δ = p·rel, the classic formula
  // collapses to n = C·2·(n−k)·relden² div (k·relnum²) where C =
  // (z_{α/2}+z_β)² is a COMPILE-TIME micro literal — the entire
  // calculator is integer algebra over a 5-row census.
  private val PowerC: Long = // (1.959964 + 0.841621)² in micro units
    math.floor(math.pow(1.959964 + 0.841621, 2) * 1e6 + 0.5).toLong
  private val PowerRels = Seq(1L, 2L, 5L) // relative MDE in percent

  private def q353(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val census = Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type").as("ty"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 150, 1L).otherwise(0L)).as("k"))
      .localCheckpoint(true) // 5 rows; feeds the MDE grid
    census.crossJoin(broadcast(PowerRels.toDF("rel_pct")))
      .select(col("ty"), col("rel_pct"), col("n"), col("k"),
        expr("k * 1000000 div n").as("p_ppm"),
        expr(s"CAST(CAST($PowerC AS DECIMAL(38,0)) * 2 * (n - k) * 10000" +
          " div nullif(k * rel_pct * rel_pct * 1000000, 0) AS BIGINT)")
          .as("n_per_arm"))
      .orderBy("ty", "rel_pct")
  }

  private val q353Oracle: String = {
    val rels = PowerRels.map(r => s"($r)").mkString(",")
    s"""WITH census AS (SELECT event_type AS ty, count(*) AS n,
       |    count(CASE WHEN value >= 150 THEN 1 END) AS k
       |  FROM events GROUP BY 1)
       |SELECT ty, CAST(rel_pct AS BIGINT) AS rel_pct,
       |  CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       |  CAST(k * 1000000 // n AS BIGINT) AS p_ppm,
       |  CAST(CAST($PowerC AS HUGEINT) * 2 * (n - k) * 10000
       |    // nullif(k * rel_pct * rel_pct * 1000000, 0) AS BIGINT)
       |    AS n_per_arm
       |FROM census CROSS JOIN (SELECT * FROM (VALUES $rels) r(rel_pct))
       |ORDER BY ty, rel_pct""".stripMargin
  }

  // -- q354: Pareto ABC classification -----------------------------------------------------
  // The inventory 80/15/5 census: parts ranked by revenue, classified
  // by the cumulative share BEFORE each part (so the part crossing a
  // boundary still belongs to the class it completes), rolled up per
  // class. The cumulative ranking rides LayoutOps.censusCum (round 16
  // — the part domain GROWS with data scale, so the former global
  // `Window.orderBy(rev desc)` was a single-task sort waiting to
  // happen; bucketed prefixes are exact for any cut placement).
  private def q354(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .as("rev_u"))
    val cum = graft.ops.LayoutOps.censusCum(parts, "rev_u", Seq("rev_u"),
      inclusive = true, desc = true, tieCol = Some("pk"))
    val tot = cum.agg(sum(col("rev_u")).as("t"))
    cum
      .withColumn("cum", col("__cum_rev_u"))
      .crossJoin(broadcast(tot))
      // DECIMAL: cum·1e6 passes 2^63 one order of magnitude above sf0.1
      // (caught by the round-13 10× overflow stress)
      .withColumn("before_ppm",
        expr("CAST(cum - rev_u AS DECIMAL(38,0)) * 1000000 div t"))
      .withColumn("cls", when(col("before_ppm") < 800000L, "A")
        .when(col("before_ppm") < 950000L, "B").otherwise("C"))
      .groupBy("cls").agg(count(lit(1)).as("n_parts"),
        sum(col("rev_u")).as("rev_u"))
      .crossJoin(broadcast(tot))
      .select(col("cls"), col("n_parts"), col("rev_u"),
        expr("CAST(rev_u AS DECIMAL(38,0)) * 1000000 div t")
          .as("rev_share_ppm"))
      .orderBy("cls")
  }

  private val q354Oracle: String =
    """WITH parts AS (SELECT l_partkey AS pk,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_u
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev_u) AS BIGINT) AS t FROM parts),
      |cum AS (SELECT pk, rev_u,
      |    CAST(sum(rev_u) OVER (ORDER BY rev_u DESC, pk
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM parts),
      |cls AS (SELECT rev_u,
      |    CASE WHEN CAST(cum - rev_u AS HUGEINT) * 1000000 // t < 800000
      |      THEN 'A'
      |      WHEN CAST(cum - rev_u AS HUGEINT) * 1000000 // t < 950000
      |      THEN 'B'
      |      ELSE 'C' END AS cls
      |  FROM cum CROSS JOIN tot)
      |SELECT cls, count(*) AS n_parts,
      |  CAST(sum(rev_u) AS BIGINT) AS rev_u,
      |  CAST(sum(CAST(rev_u AS HUGEINT)) * 1000000 // t AS BIGINT)
      |    AS rev_share_ppm
      |FROM cls CROSS JOIN tot GROUP BY cls, t ORDER BY cls""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q351_ridge_sweep", q351, Some(q351Oracle)),
    QueryDef("q352_hill_tail", q352, Some(q352Oracle)),
    QueryDef("q353_power_calc", q353, Some(q353Oracle)),
    QueryDef("q354_abc_classes", q354, Some(q354Oracle)),
  )
}

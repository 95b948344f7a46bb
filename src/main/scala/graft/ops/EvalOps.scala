package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ranking-quality evaluation for curation signals: does a cheap
  * score (length, quality heuristic, classifier margin) actually
  * separate the class you care about? The standard answer is ROC AUC,
  * computed here exactly via the Mann-Whitney rank-sum.
  */
object EvalOps {

  /** Exact cumulative sums over a value-keyed census with every
    * window bucket-partitioned — on a real model-score or continuous-
    * value column the distinct domain approaches the row count, and an
    * unpartitioned `Window.orderBy` would sort it on one task. The
    * machinery lives in [[LayoutOps.censusCum]] (shared with the
    * q354/q356 ranking reworks); this shim only fixes the asc/no-tie
    * shape both EvalOps callers use.
    */
  private def bucketedCum(census: DataFrame, valueCol: String,
      sumCols: Seq[String], inclusive: Boolean): DataFrame =
    LayoutOps.censusCum(census, valueCol, sumCols, inclusive)

  /** Exact ROC AUC of `scoreCol` as a predictor of `labelCol`
    * (boolean), ties handled by average ranks — computed ENTIRELY in
    * integer arithmetic on doubled ranks:
    * `r2(s) = 2·(#rows below s) + cnt(s) + 1` (twice the average
    * rank of score-group s), `U2 = Σ np(s)·r2(s) − NP·(NP+1)`,
    * `AUC = U2 / (2·NP·NN)` — one final division of exact BIGINTs.
    * Returns one row (np, nn, auc); degenerate label splits (NP or
    * NN = 0) yield NULL, DuckDB's x/0 convention.
    *
    * Scale shape: one partial-aggregable score-group count, the
    * [[bucketedCum]] prefix over the distinct-score census (bucket-
    * partitioned windows — safe even when the score domain approaches
    * the row count), and a 1-row fold. `np·r2 ≤ N·2N` caps the exact
    * path at ~3e9 rows per evaluation slice — beyond that, pre-bucket
    * scores.
    */
  def aucRankSum(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val g = df.select(labelCol.as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("cnt"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
    bucketedCum(g, "s", Seq("cnt"), inclusive = false)
      .withColumn("r2", lit(2L) * col("__cum_cnt") + col("cnt") + lit(1L))
      .agg(sum(col("np")).as("np"),
        sum(col("cnt") - col("np")).as("nn"),
        sum(col("np") * col("r2")).as("s2"))
      .select(col("np"), col("nn"),
        try_divide((col("s2") - col("np") * (col("np") + 1)).cast(DoubleType),
          (lit(2L) * col("np") * col("nn")).cast(DoubleType)).as("auc"))
  }

  // ---- two-proportion A/B z-statistic ------------------------------------

  /** Pooled two-proportion z-test between variants A and B:
    * `z = (p_A − p_B) / √(p̂(1−p̂)(1/n_A + 1/n_B))` with
    * p̂ = (x_A+x_B)/(n_A+n_B) — the standard experiment readout. All
    * counts are exact; the z expression is one fixed double formula,
    * n4-normalized. Returns one row
    * (n_a, x_a, n_b, x_b, rate_a, rate_b, z).
    *
    * Scale shape: ONE partial-aggregable conditional-count scan; the
    * statistic is a projection of the 1-row count frame.
    */
  def abTestZ(df: DataFrame, variantA: Column, converted: Column): DataFrame = {
    val m = df.select(variantA.as("a"), converted.as("c"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a") && col("c"), 1L).otherwise(0L)).as("x_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("a") && col("c"), 1L).otherwise(0L)).as("x_b"))
    m.select(zReadout: _*)
  }

  /** The z readout projected off a (n_a, x_a, n_b, x_b) count frame.
    * try_divide throughout: a degenerate split (empty variant, or a
    * zero-variance pool) must yield NULL like the DuckDB oracle's
    * NULL-on-zero division, not an ANSI error — the aucRankSum /
    * corrMatrix / olsByGroup convention.
    */
  private def zReadout: Seq[Column] = {
    val na = col("n_a").cast(DoubleType); val xa = col("x_a").cast(DoubleType)
    val nb = col("n_b").cast(DoubleType); val xb = col("x_b").cast(DoubleType)
    val rateA = try_divide(xa, na)
    val rateB = try_divide(xb, nb)
    val p = try_divide(xa + xb, na + nb)
    val z = try_divide(rateA - rateB,
      sqrt(p * (lit(1.0) - p) * (try_divide(lit(1.0), na) + try_divide(lit(1.0), nb))))
    Seq(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      graft.queries.Norm.n4(rateA).as("rate_a"),
      graft.queries.Norm.n4(rateB).as("rate_b"),
      graft.queries.Norm.n4(z).as("z"))
  }

  /** A GRID of A/B readouts in one pass: every scenario's four
    * conditional counts fold into a single partial-aggregable
    * aggregate over ONE scan, then a width-|scenarios| generator
    * emits one readout row per scenario — N experiments cost exactly
    * one 100 TB scan, not N. Returns (scenario, n_a, x_a, n_b, x_b,
    * rate_a, rate_b, z) ordered by scenario.
    */
  def abTestZMulti(df: DataFrame,
      scenarios: Seq[(String, Column, Column)]): DataFrame = {
    require(scenarios.nonEmpty, "abTestZMulti needs at least one scenario")
    val aggs = scenarios.zipWithIndex.flatMap { case ((_, a, c), i) =>
      Seq(sum(when(a, 1L).otherwise(0L)).as(s"__na_$i"),
        sum(when(a && c, 1L).otherwise(0L)).as(s"__xa_$i"),
        sum(when(!a, 1L).otherwise(0L)).as(s"__nb_$i"),
        sum(when(!a && c, 1L).otherwise(0L)).as(s"__xb_$i"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = scenarios.zipWithIndex.map { case ((name, _, _), i) =>
      struct(lit(name).as("scenario"), col(s"__na_$i").as("n_a"),
        col(s"__xa_$i").as("x_a"), col(s"__nb_$i").as("n_b"),
        col(s"__xb_$i").as("x_b"))
    }
    m.select(explode(array(rows: _*)).as("r")).select("r.*")
      .select(col("scenario") +: zReadout: _*)
      .orderBy("scenario")
  }

  /** [[abTestZ]] oracle rendering. */
  def abTestZSql(table: String, variantASql: String, convertedSql: String): String = {
    val n4 = graft.etl.OracleSql.n4 _
    val p = "((xa + xb) / (na + nb))"
    val z = s"(((xa / na) - (xb / nb)) / sqrt($p * (1.0 - $p) * (1.0 / na + 1.0 / nb)))"
    s"""WITH m AS (SELECT
       |    CAST(sum(CASE WHEN ($variantASql) THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN ($variantASql) AND ($convertedSql) THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
       |    CAST(sum(CASE WHEN NOT ($variantASql) THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN NOT ($variantASql) AND ($convertedSql) THEN 1 ELSE 0 END) AS BIGINT) AS x_b
       |  FROM $table),
       |d AS (SELECT n_a, x_a, n_b, x_b,
       |    CAST(n_a AS DOUBLE) AS na, CAST(x_a AS DOUBLE) AS xa,
       |    CAST(n_b AS DOUBLE) AS nb, CAST(x_b AS DOUBLE) AS xb
       |  FROM m)
       |SELECT n_a, x_a, n_b, x_b,
       |  ${n4("(xa / na)")} AS rate_a, ${n4("(xb / nb)")} AS rate_b,
       |  ${n4(z)} AS z
       |FROM d""".stripMargin
  }

  // ---- two-sample Kolmogorov-Smirnov drift --------------------------------

  /** Two-sample KS statistic between slices A and B of `valueCol`:
    * `KS = max_v |F_A(v) − F_B(v)|` over the pooled value domain,
    * with the arg-max value (ties → smallest value) — the standard
    * corpus-drift detector between snapshots/sources. Cumulative
    * counts are exact integer window sums; each CDF step is two
    * divisions of exact integers — identical doubles on both engines,
    * so the max and its arg-max are deterministic. Returns one row
    * (n_a, n_b, ks, at_value).
    *
    * Scale shape: one value-keyed conditional count (the shuffle is
    * the VALUE DOMAIN, not the row count), the [[bucketedCum]] prefix
    * over the distinct-value census (bucket-partitioned windows —
    * safe even when the value domain approaches the row count), a
    * 1-row TakeOrdered.
    */
  def ksDrift(df: DataFrame, inA: Column, valueCol: Column): DataFrame = {
    val g = df.select(inA.as("a"), valueCol.as("v"))
      .groupBy("v").agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
    val cum = bucketedCum(g, "v", Seq("ca", "cb"), inclusive = true)
    val tot = cum.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cum.select(col("v"), col("__cum_ca").as("cua"),
        col("__cum_cb").as("cub"))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("cua").cast(DoubleType) / col("n_a").cast(DoubleType) -
          col("cub").cast(DoubleType) / col("n_b").cast(DoubleType)).as("d"),
        col("v"))
      .orderBy(col("d").desc, col("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"),
        graft.queries.Norm.n4(col("d")).as("ks"), col("v").as("at_value"))
  }

  /** [[ksDrift]] oracle rendering. */
  def ksDriftSql(table: String, inASql: String, valueSql: String): String =
    s"""WITH g AS (SELECT $valueSql AS v,
       |    CAST(sum(CASE WHEN ($inASql) THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN NOT ($inASql) THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |    CAST(sum(cb) AS BIGINT) AS n_b FROM g),
       |cdf AS (SELECT v,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cua,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cub
       |  FROM g)
       |SELECT n_a, n_b,
       |  ${graft.etl.OracleSql.n4(
            "abs(CAST(cua AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(cub AS DOUBLE) / CAST(n_b AS DOUBLE))")} AS ks,
       |  v AS at_value
       |FROM cdf CROSS JOIN tot
       |ORDER BY abs(CAST(cua AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(cub AS DOUBLE) / CAST(n_b AS DOUBLE)) DESC, v
       |LIMIT 1""".stripMargin

  /** [[aucRankSum]] oracle rendering; `labelSql`/`scoreSql` are
    * expressions over the table's columns.
    */
  def aucRankSumSql(table: String, labelSql: String, scoreSql: String): String =
    s"""WITH g AS (SELECT $scoreSql AS s, count(*) AS cnt,
       |    CAST(sum(CASE WHEN $labelSql THEN 1 ELSE 0 END) AS BIGINT) AS np
       |  FROM $table GROUP BY 1),
       |r AS (SELECT np, cnt,
       |    2 * CAST(coalesce(sum(cnt) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      + cnt + 1 AS r2
       |  FROM g)
       |SELECT CAST(sum(np) AS BIGINT) AS np,
       |  CAST(sum(cnt - np) AS BIGINT) AS nn,
       |  CAST(sum(np * r2) - sum(np) * (sum(np) + 1) AS DOUBLE)
       |    / CAST(2 * sum(np) * sum(cnt - np) AS DOUBLE) AS auc
       |FROM r""".stripMargin
}

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

  /** Exact ROC AUC of `scoreCol` as a predictor of `labelCol`
    * (boolean), ties handled by average ranks — computed ENTIRELY in
    * integer arithmetic on doubled ranks:
    * `r2(s) = 2·(#rows below s) + cnt(s) + 1` (twice the average
    * rank of score-group s), `U2 = Σ np(s)·r2(s) − NP·(NP+1)`,
    * `AUC = U2 / (2·NP·NN)` — one final division of exact BIGINTs.
    * Returns one row (np, nn, auc); degenerate label splits (NP or
    * NN = 0) yield NULL, DuckDB's x/0 convention.
    *
    * Scale shape: one partial-aggregable score-group count, a
    * cumulative window over DISTINCT scores ordered by score (the
    * score domain, not the row count; for continuous scores bucket
    * first), and a 1-row fold. `np·r2 ≤ N·2N` caps the exact path at
    * ~3e9 rows per evaluation slice — beyond that, pre-bucket scores.
    */
  def aucRankSum(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val g = df.select(labelCol.as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("cnt"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
    val ord = Window.orderBy("s")
    val withR2 = g.withColumn("below",
        coalesce(sum(col("cnt")).over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("r2", lit(2L) * col("below") + col("cnt") + lit(1L))
    withR2.agg(sum(col("np")).as("np"),
        sum(col("cnt") - col("np")).as("nn"),
        sum(col("np") * col("r2")).as("s2"))
      .select(col("np"), col("nn"),
        try_divide((col("s2") - col("np") * (col("np") + 1)).cast(DoubleType),
          (lit(2L) * col("np") * col("nn")).cast(DoubleType)).as("auc"))
  }

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

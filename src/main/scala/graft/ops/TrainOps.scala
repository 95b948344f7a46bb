package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** In-engine model training for data-curation pipelines: the cheap
  * quality classifier (logistic regression by full-batch gradient
  * descent) that scores documents for filtering — trained ON the
  * corpus, BY the engine, like [[SimilarityOps.kmeansAssign]] trains
  * the IVF quantizer.
  *
  * Determinism contract (the kmeans/q76 recipe, hardened): each
  * gradient step is one map-side aggregate whose per-row contributions
  * are floored onto a 1e-6 grid as INTEGER micro-values — the
  * cross-partition sum is then an order-independent integer sum, exact
  * on any engine and any cluster layout (no float-reduction drift at
  * all, stronger than q76's n4-rounded `avg`). Weights are n4-rounded
  * after every update, so both engines carry identical literals into
  * the next step; the dot product uses ONE fixed left-associated
  * parenthesization. The only cross-engine risk left is a 1-ulp
  * `exp` divergence landing exactly on a grid boundary — the same
  * accepted class as q74/q76.
  *
  * Scale shape: the feature frame is persisted once (MEMORY_AND_DISK);
  * each iteration is ONE aggregate job with map-side partial sums and
  * a 5-long result row to the driver — no shuffle of the corpus, no
  * vocabulary state, O(iters) jobs total. Exactly how you train a
  * 5-weight model on 100 TB: the data never moves, the gradient does.
  */
object TrainOps {

  /** Feature vector (shared Spark/SQL definition): bias plus the four
    * q16 quality components — length score, English-stopword ratio,
    * word-length score, distinct-token ratio. All are exact IEEE
    * results of integer-derived divisions (identical cross-engine, no
    * rounding needed). Docs with zero tokens are excluded (their
    * ratios are undefined).
    */
  private def features(c: Column): Seq[Column] = {
    val n = TextOps.nTokens(c).cast(DoubleType)
    Seq(
      lit(1.0),
      least(lit(1.0), n / lit(100.0)),
      TextOps.stopHits(c, TextOps.langStopwords.toMap.apply("en"))
        .cast(DoubleType) / n,
      least(lit(1.0), TextOps.avgTokenLen(c) / lit(8.0)),
      TextOps.nDistinctTokens(c).cast(DoubleType) / n)
  }

  private def featuresSql(toks: String): Seq[String] = {
    val en = TextOps.langStopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString(", ")
    val n = s"CAST(len($toks) AS DOUBLE)"
    Seq(
      "CAST(1.0 AS DOUBLE)",
      s"least(CAST(1.0 AS DOUBLE), $n / 100.0)",
      s"CAST(len(list_filter($toks, t -> t IN ($en))) AS DOUBLE) / $n",
      s"least(CAST(1.0 AS DOUBLE), (CAST(list_sum(list_transform($toks, t -> length(t))) AS DOUBLE) / len($toks)) / 8.0)",
      s"CAST(len(list_distinct($toks)) AS DOUBLE) / $n")
  }

  val NumFeatures: Int = 5

  private def n4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Sigmoid of the FIXED left-associated dot product w·x. */
  private def prob(w: Seq[Double], xs: Seq[Column]): Column = {
    val z = w.zip(xs).map { case (wj, xj) => lit(wj) * xj }
      .reduceLeft(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train `iters` full-batch GD steps from w = 0, then score every
    * document: returns (idCol, p4, pred) with p4 the n4-rounded final
    * probability and pred the 0.5-threshold decision (compared on the
    * rounded grid, so the threshold can't straddle an engine ulp).
    */
  def logregScore(df: DataFrame, idCol: String, textCol: String,
      label: Column, iters: Int = 3, lr: Double = 0.5): DataFrame = {
    require(iters > 0, s"iters must be positive: $iters")
    val xs = (0 until NumFeatures).map(j => col(s"x$j"))
    val feats = df
      .where(TextOps.nTokens(col(textCol)) > 0)
      .select(Seq(col(idCol), label.cast(DoubleType).as("y")) ++
        features(col(textCol)).zipWithIndex.map { case (x, j) => x.as(s"x$j") }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count() // also materializes the persist
    var w = Seq.fill(NumFeatures)(0.0)
    for (_ <- 1 to iters) {
      val p = prob(w, xs)
      val g = feats.agg(
        sum(floor((p - col("y")) * xs.head * lit(1000000.0) + lit(0.5))
          .cast("long")).as("g0"),
        xs.tail.zipWithIndex.map { case (x, j) =>
          sum(floor((p - col("y")) * x * lit(1000000.0) + lit(0.5))
            .cast("long")).as(s"g${j + 1}")
        }: _*).head()
      w = w.zipWithIndex.map { case (wj, j) =>
        n4d(wj - lr * (g.getLong(j) / 1000000.0) / n)
      }
    }
    val p4 = floor(prob(w, xs) * lit(10000d) + lit(0.5d))
      .cast(DoubleType) / lit(10000d)
    val out = feats.select(col(idCol), p4.as("p4"),
      (p4 >= lit(0.5)).cast("int").as("pred"))
    val materialized = out.localCheckpoint(true)
    feats.unpersist()
    materialized
  }

  /** [[logregScore]] oracle rendering: the gradient trajectory unrolled
    * as one CTE pair (gradient sums, weight update) per iteration —
    * integer micro-gradients and n4 weights make every intermediate
    * bit-identical to the Spark run.
    */
  def logregScoreSql(table: String, idCol: String, textCol: String,
      labelSql: String, iters: Int = 3, lr: Double = 0.5): String = {
    def n4(e: String) = s"(floor(($e) * 10000 + 0.5) / 10000.0)"
    val toksE = TextOps.tokensSql(textCol)
    val fs = featuresSql("toks")
    val featCols = fs.zipWithIndex
      .map { case (f, j) => s"$f AS x$j" }.mkString(",\n    ")
    def z(wRef: Int => String) =
      (0 until NumFeatures).map(j => s"${wRef(j)} * x$j").mkString(" + ")
    val w0 = (0 until NumFeatures).map(_ => "CAST(0.0 AS DOUBLE)")
    def probE(wRef: Int => String) = s"(1.0 / (1.0 + exp(-(${z(wRef)}))))"
    val steps = (1 to iters).flatMap { i =>
      val wRef: Int => String =
        if (i == 1) j => w0(j) else j => s"w${i - 1}.w$j"
      val from = if (i == 1) "f" else s"f CROSS JOIN w${i - 1}"
      val gsums = (0 until NumFeatures).map(j =>
        s"CAST(sum(CAST(floor((${probE(wRef)} - y) * x$j * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g$j")
        .mkString(",\n    ")
      val wupd = (0 until NumFeatures).map(j =>
        s"${n4(s"${wRef(j)} - $lr * (g$j / 1000000.0) / n")} AS w$j")
        .mkString(",\n    ")
      val wFrom = if (i == 1) s"g$i CROSS JOIN tot"
        else s"g$i CROSS JOIN tot CROSS JOIN w${i - 1}"
      Seq(s"g$i AS (SELECT\n    $gsums\n  FROM $from)",
        s"w$i AS (SELECT\n    $wupd\n  FROM $wFrom)")
    }
    val pFinal = probE(j => s"w$iters.w$j")
    s"""WITH f AS (SELECT $idCol, CAST(__y AS DOUBLE) AS y,
       |    $featCols
       |  FROM (SELECT $idCol, ($labelSql) AS __y, $toksE AS toks FROM $table)
       |  WHERE len(toks) > 0),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
       |${steps.mkString(",\n")}
       |SELECT $idCol, ${n4(pFinal)} AS p4,
       |  CAST(${n4(pFinal)} >= 0.5 AS INTEGER) AS pred
       |FROM f CROSS JOIN w$iters""".stripMargin
  }
}

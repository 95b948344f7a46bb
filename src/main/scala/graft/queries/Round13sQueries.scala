package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 nineteenth wave: one Dawid-Skene weak-supervision step
  * (q377) — the programmatic-labeling primitive: majority-vote
  * pseudo-labels, per-annotator accuracy against them, log-odds
  * annotator weights, and the weighted re-vote that beats raw
  * majority when annotator quality is uneven.
  */
object Round13sQueries {

  // -- q377: one Dawid-Skene step -----------------------------------------------------------
  // Three synthetic annotators label the embedding corpus with hash-
  // seeded noise (10% / 30% / 50% corruption — deterministic LCG, so
  // the oracle replays the exact same votes). Step 1: majority vote
  // (3 votes: any equal pair is the unique mode; all-distinct ties to
  // the smallest label). Step 2: per-annotator accuracy vs majority.
  // Step 3: log-odds weights w = ln(acc·(K−1)/(1−acc)) on the
  // micro-nat grid (accuracy clamped into (0,1) first). Step 4:
  // weighted re-vote, ties to the smaller label. Output: the three
  // annotator rows plus both pseudo-label qualities against truth —
  // the weighted vote must not lose to majority. Every frame after
  // the vote scan is item- or annotator-grain.
  private val DsNoise = Seq((1L, 10L), (2L, 30L), (3L, 50L))

  private def q377(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ann = DsNoise.toDF("j", "nz")
    val votes = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("truth"))
      .crossJoin(broadcast(ann))
      .withColumn("h", expr("((((vec_id * 31 + j * 1000003)" +
        " * 1103515245 + 12345) % 2147483648) * 1103515245 + 54321)" +
        " % 2147483648"))
      .withColumn("vote", expr("CASE WHEN h % 100 < nz" +
        " THEN (truth + 1 + (h div 100) % 9) % 10 ELSE truth END"))
      .localCheckpoint(true) // feeds the pivot AND the re-vote explode
    val pivot = votes.groupBy("vec_id", "truth").agg(
      max(when(col("j") === 1, col("vote"))).as("v1"),
      max(when(col("j") === 2, col("vote"))).as("v2"),
      max(when(col("j") === 3, col("vote"))).as("v3"))
      .withColumn("maj", expr("CASE WHEN v1 = v2 OR v1 = v3 THEN v1" +
        " WHEN v2 = v3 THEN v2 ELSE least(v1, least(v2, v3)) END"))
      .localCheckpoint(true) // item-grain; feeds accs AND the re-vote
    val n = pivot.agg(count(lit(1)).as("n_items"))
    val accs = pivot.select(
      expr("CASE WHEN v1 = maj THEN 1L ELSE 0L END").as("a1"),
      expr("CASE WHEN v2 = maj THEN 1L ELSE 0L END").as("a2"),
      expr("CASE WHEN v3 = maj THEN 1L ELSE 0L END").as("a3"))
      .agg(sum(col("a1")).as("c1"), sum(col("a2")).as("c2"),
        sum(col("a3")).as("c3"))
      .crossJoin(broadcast(n))
      .select(explode(expr("array(struct(1L AS j, c1 AS c)," +
        " struct(2L AS j, c2 AS c), struct(3L AS j, c3 AS c))")).as("s"),
        col("n_items"))
      .select(col("s.j").as("j"), col("n_items"),
        expr("greatest(least(s.c * 1000000 div n_items, 999999L), 1L)")
          .as("acc_ppm"))
      .withColumn("w_micro", expr("CAST(floor(ln(CAST(acc_ppm AS DOUBLE)" +
        " * 9 / (1000000 - acc_ppm)) * 1000000 + 0.5) AS BIGINT)"))
      .localCheckpoint(true) // 3 rows; feeds the re-vote AND the output
    val revote = votes.join(broadcast(accs.select(col("j"),
      col("w_micro"))), "j")
      .groupBy("vec_id", "truth", "vote")
      .agg(sum(col("w_micro")).as("wsum"))
      .withColumn("rk", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("wsum").desc, col("vote"))))
      .where(col("rk") === 1)
    val quality = pivot.agg(
      sum(when(col("maj") === col("truth"), 1L).otherwise(0L)).as("mok"))
      .crossJoin(revote.agg(count(lit(1)).as("nn"),
        sum(when(col("vote") === col("truth"), 1L).otherwise(0L))
          .as("wok")))
      .select(expr("mok * 1000000 div nn").as("maj_acc_truth_ppm"),
        expr("wok * 1000000 div nn").as("weighted_acc_truth_ppm"))
    accs.crossJoin(broadcast(quality))
      .select(col("j").as("annotator"), col("n_items"), col("acc_ppm"),
        col("w_micro"), col("maj_acc_truth_ppm"),
        col("weighted_acc_truth_ppm"))
      .orderBy("annotator")
  }

  private val q377Oracle: String = {
    val anns = DsNoise.map { case (j, nz) => s"($j,$nz)" }.mkString(",")
    s"""WITH ann AS (SELECT CAST(j AS BIGINT) AS j, CAST(nz AS BIGINT)
       |    AS nz FROM (VALUES $anns) a(j, nz)),
       |votes AS (SELECT vec_id, CAST(label AS BIGINT) AS truth, j,
       |    CASE WHEN h % 100 < nz
       |      THEN (truth + 1 + (h // 100) % 9) % 10 ELSE truth END AS vote
       |  FROM (SELECT vec_id, label, j, nz,
       |      ((((vec_id * 31 + j * 1000003) * 1103515245 + 12345)
       |        % 2147483648) * 1103515245 + 54321) % 2147483648 AS h
       |    FROM embeddings CROSS JOIN ann)),
       |pv0 AS (SELECT vec_id, truth,
       |    max(CASE WHEN j = 1 THEN vote END) AS v1,
       |    max(CASE WHEN j = 2 THEN vote END) AS v2,
       |    max(CASE WHEN j = 3 THEN vote END) AS v3
       |  FROM votes GROUP BY 1, 2),
       |pm AS (SELECT *, CASE WHEN v1 = v2 OR v1 = v3 THEN v1
       |    WHEN v2 = v3 THEN v2 ELSE least(v1, least(v2, v3)) END AS maj
       |  FROM pv0),
       |n AS (SELECT count(*) AS n_items FROM pm),
       |cs AS (SELECT
       |    count(CASE WHEN v1 = maj THEN 1 END) AS c1,
       |    count(CASE WHEN v2 = maj THEN 1 END) AS c2,
       |    count(CASE WHEN v3 = maj THEN 1 END) AS c3 FROM pm),
       |accs AS (SELECT j, n_items,
       |    greatest(least(c * 1000000 // n_items, 999999), 1) AS acc_ppm
       |  FROM (SELECT CAST(1 AS BIGINT) AS j, c1 AS c FROM cs
       |    UNION ALL SELECT 2, c2 FROM cs
       |    UNION ALL SELECT 3, c3 FROM cs) CROSS JOIN n),
       |aw AS (SELECT *, CAST(floor(ln(CAST(acc_ppm AS DOUBLE) * 9
       |      / (1000000 - acc_ppm)) * 1000000 + 0.5) AS BIGINT)
       |    AS w_micro FROM accs),
       |rv AS (SELECT vec_id, truth, vote,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sum(w_micro) DESC, vote) AS rk
       |  FROM votes JOIN aw USING (j) GROUP BY vec_id, truth, vote),
       |qual AS (SELECT
       |    (SELECT count(CASE WHEN maj = truth THEN 1 END) FROM pm)
       |      * 1000000 // count(*) AS maj_acc_truth_ppm,
       |    count(CASE WHEN vote = truth THEN 1 END) * 1000000 // count(*)
       |      AS weighted_acc_truth_ppm
       |  FROM rv WHERE rk = 1)
       |SELECT j AS annotator, CAST(n_items AS BIGINT) AS n_items,
       |  CAST(acc_ppm AS BIGINT) AS acc_ppm, w_micro,
       |  CAST(maj_acc_truth_ppm AS BIGINT) AS maj_acc_truth_ppm,
       |  CAST(weighted_acc_truth_ppm AS BIGINT) AS weighted_acc_truth_ppm
       |FROM aw CROSS JOIN qual ORDER BY annotator""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q377_dawid_skene", q377, Some(q377Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{LayoutOps, LmOps, MixOps, TextOps}

/** Round-10 sixth wave: distributed global ranking, leakage-free
  * held-out LM eval, Zipf-law fit, and multi-touch attribution.
  */
object Round10fQueries {

  private def gridU(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)).cast(LongType)

  // -- q166: global dense rank without a global window -----------------------
  // Assign a global ordinal to every order by (price, key) — the
  // two-level bucketed ranking that replaces the single-task
  // `row_number() OVER (ORDER BY ...)` anti-pattern at scale: exact
  // percentile cuts bucket map-side, bucket counts prefix-sum into
  // offsets, and every window is partitioned. The oracle IS the
  // naive global window (fine on DuckDB's single node), so any
  // bucket-boundary or offset bug breaks 150k hashes at once.
  private def q166(spark: SparkSession, sfDir: String): DataFrame =
    LayoutOps.globalRank(
        Tables.read(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", "o_orderkey", nBuckets = 32)
      .orderBy("rank")

  private val q166Oracle: String =
    """SELECT o_orderkey, o_totalprice,
      |  row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rank
      |FROM orders ORDER BY rank""".stripMargin

  // -- q167: held-out bigram surprisal (leakage-free perplexity eval) --------
  // q106 scores the corpus under its own statistics; this fits the
  // add-one bigram model on the deterministic 80% train split (q80's
  // hash split, seed 42) and scores ONLY the held-out 20% — unseen
  // bigrams hit the add-one floor exactly as at inference time. The
  // train/eval gap is the eval-hygiene contract every data pipeline
  // report needs. See [[LmOps.bigramSurprisalHeldout]].
  private val SplitSeed = 42L
  private val SplitFracs = Seq("train" -> 0.8, "val" -> 0.2)

  private def q167(spark: SparkSession, sfDir: String): DataFrame = {
    val withSplit = MixOps.assignSplit(
      Tables.read(spark, sfDir, "documents"), "doc_id", SplitSeed, SplitFracs)
    LmOps.bigramSurprisalHeldout(withSplit, "doc_id", "text",
        col("split") === "train")
      .orderBy("doc_id")
  }

  private val q167Oracle: String =
    LmOps.bigramSurprisalHeldoutSql("documents", "doc_id", "text",
      s"(${MixOps.assignSplitSql("doc_id", SplitSeed, SplitFracs)}) = 'train'") +
      "\nORDER BY doc_id"

  // -- q168: Zipf-law fit ----------------------------------------------------
  // How Zipfian is the corpus: OLS slope of ln(freq) on ln(rank) over
  // the top-200 tokens. Ranking runs on the k-row TakeOrdered frame
  // (window bounded by the CONFIG constant, not the data); the log
  // terms land on the 1e-6 micro-grid and the OLS moments are exact
  // integer sums (DECIMAL/HUGEINT products), so the fitted slope is
  // bit-identical. A natural corpus reads near -1.
  private val ZipfK = 200

  private def q168(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(ZipfK)
      .localCheckpoint(true) // k-row frame: rank pass + moment pass
    val ranked = census
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col("token").asc)))
      .select(gridU(log(col("rank").cast("double"))).as("x_u"),
        gridU(log(col("n").cast("double"))).as("y_u"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    ranked.agg(count(lit(1)).as("k"),
        sum(col("x_u")).as("sx"), sum(col("y_u")).as("sy"),
        sum(col("x_u").cast(dec) * col("y_u").cast(dec)).as("sxy"),
        sum(col("x_u").cast(dec) * col("x_u").cast(dec)).as("sxx"))
      .select(col("k").as("n_points"),
        Norm.n4((col("k").cast(dec) * col("sxy") -
            col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          (col("k").cast(dec) * col("sxx") -
            col("sx").cast(dec) * col("sx").cast(dec)).cast("double"))
          .as("slope_n4"))
  }

  private val q168Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH census AS (SELECT token, count(*) AS n FROM (
       |    SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM documents)
       |  GROUP BY 1 ORDER BY n DESC, token LIMIT $ZipfK),
       |ranked AS (SELECT
       |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) AS x_u,
       |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y_u
       |  FROM census),
       |m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
       |    CAST(sum(x_u) AS HUGEINT) AS sx, CAST(sum(y_u) AS HUGEINT) AS sy,
       |    sum(CAST(x_u AS HUGEINT) * y_u) AS sxy,
       |    sum(CAST(x_u AS HUGEINT) * x_u) AS sxx
       |  FROM ranked)
       |SELECT CAST(k AS BIGINT) AS n_points,
       |  ${n4("CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE)")}
       |    AS slope_n4
       |FROM m""".stripMargin
  }

  // -- q169: position-based multi-touch attribution --------------------------
  // Marketing's classic 40/20/40 credit model: for each converting
  // user (first purchase), credit the view/click touches that
  // preceded conversion — 40% to first touch, 40% to last, 20%
  // split across the middle, all in exact integer ppm (k=1 → full
  // credit, k=2 → an even 50/50). Windows are per-user; output is
  // the per-channel credit rollup a budget allocator reads.
  private def q169(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.read(spark, sfDir, "events")
    val conv = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("__cts"))
    val touches = ev
      .where(col("event_type").isin("view", "click"))
      .join(conv, "user_id")
      .where(col("ts") < col("__cts"))
    val w = Window.partitionBy("user_id")
    val ord = w.orderBy(col("ts").asc, col("event_id").asc)
    val credited = touches
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("credit_ppm",
        when(col("__k") === 1, lit(1000000L))
          .when(col("__k") === 2, lit(500000L))
          .when(col("__rn") === 1 || col("__rn") === col("__k"), lit(400000L))
          .otherwise(expr("200000 div (__k - 2)")))
    credited.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit_ppm")).as("credit_u"))
      .orderBy("event_type")
  }

  private val q169Oracle: String =
    """WITH conv AS (SELECT user_id, min(ts) AS cts FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |touches AS (SELECT e.user_id, e.event_id, e.event_type, e.ts
      |  FROM events e JOIN conv USING (user_id)
      |  WHERE e.event_type IN ('view', 'click') AND e.ts < cts),
      |credited AS (SELECT event_type,
      |    count(*) OVER (PARTITION BY user_id) AS k,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM touches)
      |SELECT event_type, count(*) AS n_touches,
      |  CAST(sum(CASE WHEN k = 1 THEN 1000000
      |    WHEN k = 2 THEN 500000
      |    WHEN rn = 1 OR rn = k THEN 400000
      |    ELSE 200000 // (k - 2) END) AS BIGINT) AS credit_u
      |FROM credited GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q166_global_rank", q166, Some(q166Oracle)),
    QueryDef("q167_heldout_surprisal", q167, Some(q167Oracle)),
    QueryDef("q168_zipf_slope", q168, Some(q168Oracle)),
    QueryDef("q169_position_attribution", q169, Some(q169Oracle)))
}

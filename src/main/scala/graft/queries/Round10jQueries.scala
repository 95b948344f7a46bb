package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-10 tenth wave: the tabular feature-engineering family — lag
  * features, smoothed target encoding, and the hashing trick.
  */
object Round10jQueries {

  // -- q181: lag-feature matrix ----------------------------------------------
  // The ML-ready table a demand forecaster trains on: per day, the
  // revenue target next to its lag-1/lag-7/lag-28 values and the
  // trailing-7-day mean — every feature exact BIGINT (means floor-
  // divided), NULL where history is short (the honest encoding —
  // imputing zeros would teach the model a fake cold-start signal).
  // Day-grain windows, calendar-bounded (the q104 argument).
  private def q181(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("rev_u"))
    val ord = Window.orderBy("day")
    val trail7 = ord.rowsBetween(-7, -1)
    daily
      .withColumn("lag1_u", lag(col("rev_u"), 1).over(ord))
      .withColumn("lag7_u", lag(col("rev_u"), 7).over(ord))
      .withColumn("lag28_u", lag(col("rev_u"), 28).over(ord))
      .withColumn("trail7_mean_u",
        when(count(col("rev_u")).over(trail7) === 7,
          expr("sum(rev_u) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) div 7")))
      .orderBy("day")
  }

  private val q181Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev_u
      |  FROM orders GROUP BY 1)
      |SELECT day, rev_u,
      |  lag(rev_u, 1) OVER w AS lag1_u,
      |  lag(rev_u, 7) OVER w AS lag7_u,
      |  lag(rev_u, 28) OVER w AS lag28_u,
      |  CASE WHEN count(rev_u) OVER t7 = 7
      |       THEN CAST(sum(rev_u) OVER t7 // 7 AS BIGINT) END AS trail7_mean_u
      |FROM daily
      |WINDOW w AS (ORDER BY day),
      |  t7 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |ORDER BY day""".stripMargin

  // -- q182: smoothed target encoding ----------------------------------------
  // The categorical encoder gradient-boosting pipelines lean on:
  // replace each category with its smoothed target mean
  // `(Σy_cat + m·ȳ_global) / (n_cat + m)` — the m-estimate that keeps
  // rare categories from memorizing their few labels. Exact integer
  // numerators (cents + m·global-mean cents), one n4 division;
  // encoding per (priority, clerk-segment) pair so both common and
  // rare categories exercise the smoothing.
  private val TeM = 20L

  private def q182(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .select(concat(col("o_orderpriority"), lit("|"),
          (col("o_custkey") % 7).cast("string")).as("cat"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("y_u"))
    val glob = o.agg(expr("sum(y_u) div count(1)").as("__gmean_u"))
    o.groupBy("cat")
      .agg(count(lit(1)).as("n"), sum(col("y_u")).as("__sy"))
      .crossJoin(broadcast(glob))
      .select(col("cat"), col("n"),
        Norm.n4((col("__sy") + lit(TeM) * col("__gmean_u")).cast("double") /
          (col("n") + lit(TeM)).cast("double")).as("enc_n4"))
      .orderBy("cat")
  }

  private val q182Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH o AS (SELECT o_orderpriority || '|' ||
       |    CAST(o_custkey % 7 AS VARCHAR) AS cat,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y_u
       |  FROM orders),
       |g AS (SELECT CAST(sum(y_u) // count(*) AS BIGINT) AS gmean_u FROM o)
       |SELECT cat, count(*) AS n,
       |  ${n4("CAST(CAST(sum(y_u) AS BIGINT) + $TM * gmean_u AS DOUBLE) / " +
         "CAST(count(*) + $TM AS DOUBLE)")} AS enc_n4
       |FROM o CROSS JOIN g
       |GROUP BY cat, gmean_u ORDER BY cat""".stripMargin
      .replace("$TM", TeM.toString)
  }

  // -- q183: feature hashing (the hashing trick) -----------------------------
  // Fixed-width sparse features without a vocabulary: every token
  // hashes into one of D slots, and the corpus-level audit reports
  // per-slot load for the hottest slots plus the occupancy/collision
  // headline — the dimensioning check run before committing to a
  // hash width. Slot assignment is a pure map-side projection of the
  // exact kernel hash; one partial-aggregable slot census.
  private val HashD = 1024
  private val HashTopK = 15

  private def q183(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.read(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("tok"), (TextOps.tokenHash(col("tok")) % HashD).as("slot"))
      .localCheckpoint(true) // slot census AND distinct-token census
    val slots = toks.groupBy("slot")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_terms"))
    val head = slots.agg(count(lit(1)).as("__occupied"),
      sum((col("n_terms") > 1).cast("long")).as("__colliding"))
    slots.crossJoin(broadcast(head))
      .select(col("slot"), col("n_tok"), col("n_terms"),
        col("__occupied").as("occupied_slots"),
        col("__colliding").as("colliding_slots"))
      .orderBy(col("n_tok").desc, col("slot"))
      .limit(HashTopK)
  }

  private val q183Oracle: String =
    s"""WITH toks AS (SELECT tok, ${TextOps.tokenHashSql("tok")} % $HashD AS slot
       |  FROM (SELECT unnest(${TextOps.tokensSql("text")}) AS tok
       |        FROM documents)),
       |slots AS (SELECT slot, count(*) AS n_tok,
       |    CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
       |  FROM toks GROUP BY 1),
       |h AS (SELECT count(*) AS occupied_slots,
       |    CAST(sum(CASE WHEN n_terms > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS colliding_slots
       |  FROM slots)
       |SELECT slot, n_tok, n_terms, occupied_slots, colliding_slots
       |FROM slots CROSS JOIN h
       |ORDER BY n_tok DESC, slot LIMIT $HashTopK""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q181_lag_features", q181, Some(q181Oracle)),
    QueryDef("q182_target_encoding", q182, Some(q182Oracle)),
    QueryDef("q183_feature_hashing", q183, Some(q183Oracle)))
}

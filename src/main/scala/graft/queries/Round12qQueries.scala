package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.MultimodalOps

/** Round-12 seventeenth wave: bitmap-index day-activity intersections
  * (the roaring-bitmap layout shape, q305), the GIF container parser
  * — sixth format, first packed bit-field decode (q306), and
  * second-order Markov sequence lift — does the event BEFORE the
  * previous one still carry signal? (q307).
  */
object Round12qQueries {

  // -- q305: bitmap-index day intersections --------------------------------------
  // The bitmap-index layout shape: per event type, the set of active
  // days packs into 62-bit words (word = day div 62, bit = day mod 62
  // — 62 not 64, so the oracle's HUGEINT-free BIGINT shift can never
  // hit the sign bit and DuckDB's checked arithmetic never overflows),
  // built by a map-side-combinable bit_or aggregate. Pairwise type
  // intersections then ride bit_count(a AND b) over the word-keyed
  // equi join of two tiny mask censuses — the roaring-bitmap trick:
  // set algebra on packed words, never row-level joins. Jaccard is an
  // integer ppm pick.
  private val BmEpoch = "2024-01-01"
  private val BmBits = 62

  private def q305(spark: SparkSession, sfDir: String): DataFrame = {
    val masks = Tables.read(spark, sfDir, "events")
      .select(col("event_type").as("ty"),
        datediff(to_date(col("ts")), lit(BmEpoch).cast("date"))
          .cast(LongType).as("day"))
      // pre-epoch guard (mirrored in the oracle): a negative day would
      // hit BOTH cross-engine negative-division classes at once —
      // Spark `div` truncates where DuckDB `//` floors, and Spark
      // shiftleft masks the count mod 64 where DuckDB `<<` is
      // overflow-checked. Current fixtures start 2024-01-01, so this
      // drops nothing; it pins the contract rather than the fixture.
      .where(col("day") >= 0)
      .select(col("ty"), expr(s"day div $BmBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(day % $BmBits AS INT))")
          .as("bit"))
      .groupBy(col("ty"), col("word"))
      .agg(expr("bit_or(bit)").as("mask"))
      .localCheckpoint(true) // per-type totals + the pair join
    val totals = masks.groupBy(col("ty"))
      .agg(sum(bit_count(col("mask")).cast(LongType)).as("n_days"))
    val b = masks.select(col("ty").as("tyb"), col("word").as("wordb"),
      col("mask").as("maskb"))
    val pairs = masks
      .join(b, col("word") === col("wordb") && col("ty") < col("tyb"))
      .groupBy(col("ty").as("ta"), col("tyb").as("tb"))
      .agg(sum(bit_count(expr("mask & maskb")).cast(LongType))
        .as("inter_days"))
    pairs
      .join(broadcast(totals.select(col("ty").as("ta"),
        col("n_days").as("days_a"))), Seq("ta"))
      .join(broadcast(totals.select(col("ty").as("tb"),
        col("n_days").as("days_b"))), Seq("tb"))
      .select(col("ta"), col("tb"), col("days_a"), col("days_b"),
        col("inter_days"),
        (col("days_a") + col("days_b") - col("inter_days"))
          .as("union_days"))
      .withColumn("jaccard_ppm",
        expr("inter_days * 1000000 div union_days"))
      .orderBy(col("ta"), col("tb"))
  }

  private val q305Oracle: String =
    s"""WITH masks AS (SELECT event_type AS ty,
       |    CAST(CAST(ts AS DATE) - DATE '$BmEpoch' AS BIGINT)
       |      // $BmBits AS word,
       |    bit_or(CAST(1 AS BIGINT) <<
       |      CAST(CAST(CAST(ts AS DATE) - DATE '$BmEpoch' AS BIGINT)
       |        % $BmBits AS INTEGER)) AS mask
       |  FROM events
       |  WHERE CAST(CAST(ts AS DATE) - DATE '$BmEpoch' AS BIGINT) >= 0
       |  GROUP BY 1, 2),
       |totals AS (SELECT ty, CAST(sum(bit_count(mask)) AS BIGINT)
       |    AS n_days FROM masks GROUP BY 1),
       |pairs AS (SELECT a.ty AS ta, b.ty AS tb,
       |    CAST(sum(bit_count(a.mask & b.mask)) AS BIGINT) AS inter_days
       |  FROM masks a JOIN masks b ON a.word = b.word AND a.ty < b.ty
       |  GROUP BY 1, 2)
       |SELECT ta, tb, x.n_days AS days_a, y.n_days AS days_b,
       |  inter_days,
       |  x.n_days + y.n_days - inter_days AS union_days,
       |  CAST(inter_days * 1000000
       |    // (x.n_days + y.n_days - inter_days) AS BIGINT)
       |    AS jaccard_ppm
       |FROM pairs JOIN totals x ON ta = x.ty JOIN totals y ON tb = y.ty
       |ORDER BY ta, tb""".stripMargin

  // -- q306: GIF metadata roundtrip -----------------------------------------------
  // The sixth container format; what's NEW vs PNG/WAV/JPEG/MP4/BMP is
  // the packed bit-field octet — the GCT presence flag and the 3-bit
  // size exponent share one byte, so gct_colors = 2^(exp+1) only
  // exists behind a mask-and-shift decode. Every 7th payload carries
  // a corrupted magic and must come back NULL; the oracle recomputes
  // the fields algebraically from the same doc columns.
  private def q306(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val payload = MultimodalOps.gifHeader(
      col("n_chars") % 60000 + 1, col("doc_id") % 40000 + 1,
      col("doc_id") % 2 === 0, (col("doc_id") % 8).cast("int"),
      col("doc_id") % 7 =!= 0)
    val meta = MultimodalOps.gifMeta(col("payload"))
    d.select(col("doc_id"), col("n_chars"), payload.as("payload"))
      .select(col("doc_id"), meta.as("__m"))
      .select(col("doc_id"),
        col("__m").getItem(0).as("width"),
        col("__m").getItem(1).as("height"),
        col("__m").getItem(2).as("has_gct"),
        col("__m").getItem(3).as("gct_colors"),
        col("__m").getItem(4).as("is_89a"))
      .orderBy(col("doc_id"))
  }

  private val q306Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 60000 + 1 END AS width,
      |  CASE WHEN doc_id % 7 <> 0 THEN doc_id % 40000 + 1 END AS height,
      |  CASE WHEN doc_id % 7 <> 0 THEN
      |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    END AS has_gct,
      |  CASE WHEN doc_id % 7 <> 0 THEN
      |    CAST(CASE WHEN doc_id % 2 = 0
      |      THEN 1 << CAST(doc_id % 8 + 1 AS INTEGER) ELSE 0 END
      |      AS BIGINT) END AS gct_colors,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(1 AS BIGINT) END AS is_89a
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q307: second-order Markov sequence lift -------------------------------------
  // Does the event BEFORE the previous one still predict the next?
  // Consecutive event-type triples (a, b, c) per user (double lead
  // over the user window) feed one triple census; P(c | a,b) and
  // P(c | b) both derive from THAT census (consistent denominators),
  // each a ppm trunc-div pick, and the lift is the integer
  // cross-ratio p2·1e6 div p1. Support-gated, top-20 by lift with
  // full-triple tiebreaks. First-order-sufficient sequences show
  // lift ≈ 1e6; the planted unit builds a sequence where b alone
  // misleads.
  private val M2MinSupport = 5L
  private val M2K = 20

  private def q307(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val triples = Tables.read(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .withColumn("c", lead(col("a"), 2).over(w))
      .where(col("b").isNotNull && col("c").isNotNull)
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n_abc"))
      .localCheckpoint(true) // three marginal rollups + the scan
    val ab = triples.groupBy(col("a").as("a2"), col("b").as("b2"))
      .agg(sum(col("n_abc")).as("n_ab"))
    val bc = triples.groupBy(col("b").as("b3"), col("c").as("c3"))
      .agg(sum(col("n_abc")).as("n_bc"))
    val bOnly = triples.groupBy(col("b").as("b4"))
      .agg(sum(col("n_abc")).as("n_b"))
    triples.where(col("n_abc") >= M2MinSupport)
      .join(ab, col("a") === col("a2") && col("b") === col("b2"))
      .join(bc, col("b") === col("b3") && col("c") === col("c3"))
      .join(broadcast(bOnly), col("b") === col("b4"))
      .select(col("a"), col("b"), col("c"), col("n_abc"),
        expr("n_abc * 1000000 div n_ab").as("p2_ppm"),
        expr("n_bc * 1000000 div n_b").as("p1_ppm"))
      .withColumn("lift_ppm", expr("p2_ppm * 1000000 div p1_ppm"))
      .orderBy(col("lift_ppm").desc, col("a"), col("b"), col("c"))
      .limit(M2K)
  }

  private val q307Oracle: String =
    s"""WITH seq AS (SELECT user_id, event_type AS a,
       |    lead(event_type, 1) OVER w AS b,
       |    lead(event_type, 2) OVER w AS c
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |triples AS (SELECT a, b, c, count(*) AS n_abc FROM seq
       |  WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
       |ab AS (SELECT a, b, CAST(sum(n_abc) AS BIGINT) AS n_ab
       |  FROM triples GROUP BY 1, 2),
       |bc AS (SELECT b, c, CAST(sum(n_abc) AS BIGINT) AS n_bc
       |  FROM triples GROUP BY 1, 2),
       |bo AS (SELECT b, CAST(sum(n_abc) AS BIGINT) AS n_b
       |  FROM triples GROUP BY 1),
       |scored AS (SELECT t.a, t.b, t.c, t.n_abc,
       |    CAST(t.n_abc * 1000000 // ab.n_ab AS BIGINT) AS p2_ppm,
       |    CAST(bc.n_bc * 1000000 // bo.n_b AS BIGINT) AS p1_ppm
       |  FROM triples t
       |  JOIN ab ON t.a = ab.a AND t.b = ab.b
       |  JOIN bc ON t.b = bc.b AND t.c = bc.c
       |  JOIN bo ON t.b = bo.b
       |  WHERE t.n_abc >= $M2MinSupport)
       |SELECT a, b, c, n_abc, p2_ppm, p1_ppm,
       |  CAST(p2_ppm * 1000000 // p1_ppm AS BIGINT) AS lift_ppm
       |FROM scored
       |ORDER BY lift_ppm DESC, a, b, c LIMIT $M2K""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q305_bitmap_days", q305, Some(q305Oracle)),
    QueryDef("q306_gif_metadata", q306, Some(q306Oracle)),
    QueryDef("q307_markov2_lift", q307, Some(q307Oracle)))
}

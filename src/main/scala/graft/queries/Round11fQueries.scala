package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ProfileOps
import graft.ops.ProfileOps.FdCandidate

/** Round-11 sixth wave: functional-dependency profiling, seasonal
  * decomposition, and the encoding-quality (mojibake) census.
  */
object Round11fQueries {

  // -- q206: functional-dependency profile -----------------------------------
  // Schema archaeology over a raw feed: which candidate FDs hold, and
  // how badly do the broken ones leak? Three candidates over ONE
  // lineitem scan each — a true key (orderkey+linenumber → partkey,
  // g3 = 0), a plausible-but-false business rule (partkey →
  // suppkey: parts have multiple suppliers), and a denormalization
  // probe (orderkey → returnflag: lines of one order return
  // independently). See [[ProfileOps.fdProfile]] for the exact g2/g3
  // metrics and the aggregate-only scale shape.
  private val FdCandidates = Seq(
    FdCandidate("lpart->lsupp", Seq("l_partkey"), "l_suppkey"),
    FdCandidate("okey->retflag", Seq("l_orderkey"), "l_returnflag"),
    FdCandidate("okey,line->lpart", Seq("l_orderkey", "l_linenumber"),
      "l_partkey"))

  private def q206(spark: SparkSession, sfDir: String): DataFrame =
    ProfileOps.fdProfile(Tables.read(spark, sfDir, "lineitem"), FdCandidates)

  private val q206Oracle: String =
    ProfileOps.fdProfileSql("lineitem", FdCandidates)

  // -- q207: additive seasonal decomposition ---------------------------------
  // Classical decompose of daily order revenue: trend = centered
  // 7-day moving average (exact integer div; edge days with a
  // partial window are EXCLUDED, the STL convention), seasonal =
  // per-ISO-weekday mean deviation from trend, residual = deviation −
  // seasonal. Output per weekday: the seasonal index and the mean
  // absolute residual — how much weekday structure the series has
  // and how much is left once it's removed (q118 reports raw dow
  // means; this is the detrended version that survives growth).
  // The 7-day window rides the DAY-GRAIN frame (calendar-bounded,
  // the q149 argument), never the row-grain data; the 7-row seasonal
  // frame broadcasts back for the residual pass. `div` truncation on
  // negative deviations matches the oracle's `//` (both
  // round-toward-zero; verified).
  private def q207(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice"))).as("rev_u"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val dev = daily
      .withColumn("__n7", count(lit(1)).over(w7))
      .withColumn("__s7", sum(col("rev_u")).over(w7))
      .where(col("__n7") === 7)
      .select((weekday(col("day")) + 1).cast("long").as("dow"),
        (col("rev_u") - expr("__s7 div 7")).as("dev_u"))
      .localCheckpoint(true) // feeds the seasonal fit AND the residual pass
    val sea = dev.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("dev_u")).as("__sd"))
      .withColumn("sea_u", expr("__sd div n_days"))
      .select(col("dow"), col("n_days"), col("sea_u"))
    dev.join(broadcast(sea), "dow")
      .groupBy("dow")
      .agg(max(col("n_days")).as("n_days"), max(col("sea_u")).as("sea_u"),
        sum(abs(col("dev_u") - col("sea_u"))).as("__sar"))
      .select(col("dow"), col("n_days"), col("sea_u"),
        expr("__sar div n_days").as("mar_u"))
      .orderBy("dow")
  }

  private val q207Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS rev_u
      |  FROM orders GROUP BY 1),
      |t AS (SELECT day, rev_u, count(*) OVER w AS n7,
      |    CAST(sum(rev_u) OVER w AS BIGINT) AS s7
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |d AS (SELECT isodow(day) AS dow, rev_u - (s7 // 7) AS dev_u
      |  FROM t WHERE n7 = 7),
      |sea AS (SELECT dow, count(*) AS n_days,
      |    CAST(sum(dev_u) // count(*) AS BIGINT) AS sea_u
      |  FROM d GROUP BY 1)
      |SELECT s.dow, s.n_days, s.sea_u,
      |  CAST(sum(abs(d.dev_u - s.sea_u)) // s.n_days AS BIGINT) AS mar_u
      |FROM d JOIN sea s USING (dow)
      |GROUP BY s.dow, s.n_days, s.sea_u
      |ORDER BY s.dow""".stripMargin

  // -- q208: encoding-quality (mojibake) census ------------------------------
  // The CCNet/RefinedWeb cleanup gate: per source, how many documents
  // carry UTF-8 double-encoding signatures ('Ã...'), replacement
  // chars (U+FFFD), raw control bytes, or CRLF line endings? The
  // fixture corpus is verified-clean ASCII, so — the q125/q191
  // planted-dirt discipline — the derivation stamps deterministic
  // dirt onto a known residue-class of docs (both engines derive the
  // identical feed) and the census must find EXACTLY those. Pure
  // map-side projection + one census aggregate; flags are substring/
  // regex probes that would run unchanged on a dirty real corpus.
  private def q208(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(col("text"),
      when(col("doc_id") % 7 === 3, lit("\u00c3\u00a9")).otherwise(lit("")),
      when(col("doc_id") % 7 === 5, lit("\ufffd")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("\u0007")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit("\r\n")).otherwise(lit("")))
    val flags = Tables.read(spark, sfDir, "documents")
      .select(col("source"), dirty.as("t"))
      .select(col("source"),
        when(col("t").contains("\u00c3"), 1L).otherwise(0L).as("moji"),
        when(col("t").contains("\ufffd"), 1L).otherwise(0L).as("fffd"),
        when(col("t").rlike("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1L)
          .otherwise(0L).as("ctrl"),
        when(col("t").contains("\r\n"), 1L).otherwise(0L).as("crlf"))
    flags.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("moji")).as("n_mojibake"),
        sum(col("fffd")).as("n_fffd"),
        sum(col("ctrl")).as("n_ctrl"),
        sum(col("crlf")).as("n_crlf"),
        sum(when(col("moji") + col("fffd") + col("ctrl") + col("crlf") === 0,
          1L).otherwise(0L)).as("__clean"))
      .select(col("source"), col("n_docs"), col("n_mojibake"),
        col("n_fffd"), col("n_ctrl"), col("n_crlf"),
        expr("__clean * 1000000 div n_docs").as("clean_ppm"))
      .orderBy("source")
  }

  private val q208Oracle: String =
    """WITH m AS (SELECT source, text
      |    || CASE WHEN doc_id % 7 = 3 THEN chr(195) || chr(169) ELSE '' END
      |    || CASE WHEN doc_id % 7 = 5 THEN chr(65533) ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0 THEN chr(7) ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0 THEN chr(13) || chr(10) ELSE '' END
      |      AS t
      |  FROM documents),
      |f AS (SELECT source,
      |    CASE WHEN contains(t, chr(195)) THEN 1 ELSE 0 END AS moji,
      |    CASE WHEN contains(t, chr(65533)) THEN 1 ELSE 0 END AS fffd,
      |    CASE WHEN regexp_matches(t, '[\x01-\x08\x0B\x0C\x0E-\x1F]')
      |      THEN 1 ELSE 0 END AS ctrl,
      |    CASE WHEN contains(t, chr(13) || chr(10)) THEN 1 ELSE 0 END AS crlf
      |  FROM m)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(moji) AS BIGINT) AS n_mojibake,
      |  CAST(sum(fffd) AS BIGINT) AS n_fffd,
      |  CAST(sum(ctrl) AS BIGINT) AS n_ctrl,
      |  CAST(sum(crlf) AS BIGINT) AS n_crlf,
      |  CAST(sum(CASE WHEN moji + fffd + ctrl + crlf = 0 THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS clean_ppm
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q206_fd_profile", q206, Some(q206Oracle)),
    QueryDef("q207_seasonal_decompose", q207, Some(q207Oracle)),
    QueryDef("q208_mojibake_census", q208, Some(q208Oracle)))
}

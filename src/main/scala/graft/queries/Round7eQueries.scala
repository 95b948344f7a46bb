package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Round-7 sixth wave: regression/inequality/seasonality analytics
  * (per-group OLS, Gini concentration, rolling P95, day-of-week
  * index) and PMI collocation mining. Same exactness discipline as
  * waves 4-5: exact DECIMAL/HUGEINT moments, one final division (the
  * rolling P95 interpolation is the q43 parity class, n4-normalized).
  */
object Round7eQueries {

  // -- q115: per-group OLS regression --------------------------------------
  private def q115(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.olsByGroup(Tables.read(spark, sfDir, "lineitem"),
      "l_returnflag", "l_quantity", "l_extendedprice")

  private val q115Oracle: String =
    StatsOps.olsByGroupSql("lineitem", "l_returnflag", "l_quantity",
      "l_extendedprice")

  // -- q116: PMI collocations ----------------------------------------------
  private def q116(spark: SparkSession, sfDir: String): DataFrame =
    CorpusOps.pmiTopK(Tables.read(spark, sfDir, "documents"), "text")

  private val q116Oracle: String = CorpusOps.pmiTopKSql("documents", "text")

  // -- q117: rolling 7-day P95 revenue band --------------------------------
  private def q117(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.rollingP95Daily(Tables.read(spark, sfDir, "lineitem"))

  private val q117Oracle: String = StatsOps.rollingP95DailySql("lineitem")

  // -- q118: day-of-week seasonality index ---------------------------------
  private def q118(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.dowSeasonality(Tables.read(spark, sfDir, "lineitem"))

  private val q118Oracle: String = StatsOps.dowSeasonalitySql("lineitem")

  // -- q119: Gini revenue concentration ------------------------------------
  private def q119(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.gini(Tables.read(spark, sfDir, "orders"),
      "o_custkey", "o_totalprice")

  private val q119Oracle: String =
    StatsOps.giniSql("orders", "o_custkey", "o_totalprice")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q115_ols_regression", q115, Some(q115Oracle)),
    QueryDef("q116_pmi_collocations", q116, Some(q116Oracle)),
    QueryDef("q117_rolling_p95", q117, Some(q117Oracle)),
    QueryDef("q118_dow_seasonality", q118, Some(q118Oracle)),
    QueryDef("q119_gini_revenue", q119, Some(q119Oracle)),
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.AutoEtl
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md gates. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    EtlQueries.defs ++ ExtQueries.defs ++ Round3Queries.defs ++ Round5Queries.defs ++
      Round6Queries.defs ++ Round7Queries.defs ++ Round7bQueries.defs ++
      Round7cQueries.defs ++ Round7dQueries.defs ++ Round7eQueries.defs ++
      Round7fQueries.defs ++ Round9Queries.defs ++ Round10Queries.defs ++
      Round10bQueries.defs ++ Round10cQueries.defs ++ Round10dQueries.defs ++
      Round10eQueries.defs ++ Round10fQueries.defs ++ Round10gQueries.defs ++
      Round10hQueries.defs ++ Round10iQueries.defs ++ Round10jQueries.defs ++
      Round10kQueries.defs ++ Round10lQueries.defs ++ Round11Queries.defs ++
      Round11bQueries.defs ++ Round11cQueries.defs ++ Round11dQueries.defs ++
      Round11eQueries.defs ++ Round11fQueries.defs ++ Round11gQueries.defs ++
      Round11hQueries.defs ++ Round11iQueries.defs ++ Round11jQueries.defs ++
      Round11kQueries.defs ++ Round11lQueries.defs ++ Round11mQueries.defs ++
      Round11nQueries.defs ++ Round11oQueries.defs ++ Round11pQueries.defs ++
      Round12Queries.defs ++ Round12bQueries.defs ++ Round12cQueries.defs ++
      Round12dQueries.defs ++ Round12eQueries.defs ++ Round12fQueries.defs ++
      Round12gQueries.defs ++ Round12hQueries.defs ++ Round12iQueries.defs ++
      Round12jQueries.defs ++ Round12kQueries.defs ++ Round12lQueries.defs ++
      Round12mQueries.defs ++ Round12nQueries.defs ++ Round12oQueries.defs ++
      Round12pQueries.defs ++ Round12qQueries.defs ++ Round13Queries.defs ++
      Round13bQueries.defs ++ Round13cQueries.defs ++ Round13dQueries.defs ++
      Round13eQueries.defs ++ Round13fQueries.defs ++ Round13gQueries.defs ++
      Round13hQueries.defs ++ Round13iQueries.defs ++ Round13jQueries.defs ++
      Round13kQueries.defs ++ Round13lQueries.defs ++ Round13mQueries.defs ++
      Round13nQueries.defs ++ Round13oQueries.defs ++ Round13pQueries.defs ++
      Round13qQueries.defs ++ Round13rQueries.defs ++ Round13sQueries.defs ++
      Round14Queries.defs ++ Round14bQueries.defs ++ Round14cQueries.defs ++
      Round14dQueries.defs ++ Round14eQueries.defs ++
      Round14fQueries.defs ++ Round15Queries.defs

  /** Flagship: full auto-cleaning ETL of the sf0.001 events table
    * (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val r = AutoEtl.transform(Tables.read(spark, "/root/testdata/sf0.001", "events"))
    val out = r.data.localCheckpoint(true)
    r.unpersist()
    out
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** Equivalent DuckDB SQL per query (t2 oracle). Queries without an
    * entry get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One driver-contract query: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL for the oracle compare. `oracle = None` means
  * the driver records a weaker rows-only check (reserved for ops whose
  * semantics aren't SQL-expressible, e.g. probabilistic ANN recall).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a driver fixture table.
    *
    * `events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; with `nanosAsLong` it arrives as a long we convert
    * with integer division (`div 1000` — double division would round in
    * the last microsecond and diverge from DuckDB, which truncates ns
    * parquet to its native µs timestamps on read).
    */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ => spark.read.parquet(s"$sfDir/$name.parquet")
  }
}

/** Float normalizer shared with the oracle (see OracleSql.n4). */
object Norm {
  def n4(c: Column): Column =
    floor(c * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
  def n2(c: Column): Column =
    floor(c * lit(100d) + lit(0.5d)).cast(DoubleType) / lit(100d)
}

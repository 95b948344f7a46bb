package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources and sinks (reference extract/load, ETL_PROJECT.py:203-226,
  * 304-324), dispatched on file suffix like the reference.
  *
  * Deliberate mappings (see README):
  *  - CSV is read with inferSchema=false — every column arrives as a
  *    string so OUR detector (TypeDetector) owns typing, one detection
  *    path for all sources (SURVEY.md trap P7);
  *  - Excel (reference: ETL_PROJECT.py:214-215) is out of scope — no
  *    Spark-native reader; raises UnsupportedFormatException exactly
  *    like the reference does for unknown suffixes;
  *  - JSON ".json" is read multiLine (array-of-records, like
  *    pd.read_json); ".jsonl"/".ndjson" as JSON Lines;
  *  - Parquet added (not in the reference) — it is the scale format.
  */
object Io {

  class UnsupportedFormatException(suffix: String)
    extends IllegalArgumentException(s"unsupported file format: $suffix")

  private def suffixOf(path: String): String = {
    val name = path.split('/').last
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot).toLowerCase
  }

  def read(spark: SparkSession, path: String): DataFrame = suffixOf(path) match {
    case ".csv" =>
      spark.read.option("header", "true").option("inferSchema", "false").csv(path)
    case ".json" =>
      spark.read.option("multiLine", "true").json(path)
    case ".jsonl" | ".ndjson" =>
      spark.read.json(path)
    case ".parquet" =>
      spark.read.parquet(path)
    case ".orc" =>
      spark.read.orc(path)
    case other =>
      throw new UnsupportedFormatException(other)
  }

  def write(df: DataFrame, path: String): Unit = suffixOf(path) match {
    case ".csv" =>
      df.write.mode("overwrite").option("header", "true").csv(path)
    case ".json" | ".jsonl" | ".ndjson" =>
      df.write.mode("overwrite").json(path)
    case ".parquet" =>
      df.write.mode("overwrite").parquet(path)
    case ".orc" =>
      df.write.mode("overwrite").orc(path)
    case other =>
      throw new UnsupportedFormatException(other)
  }

  /** Bucketed-table sink: co-locates future joins on `key` (PlanSpec
    * proves the subsequent SortMergeJoin plans with no shuffle
    * Exchange). The 100 TB recipe for fact tables joined repeatedly on
    * the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  // Derby (the embedded JDBC database shipped in /opt/spark/jars)
  // writes its derby.log relative to derby.system.home, which defaults
  // to the process cwd — point it at tmp before the first connection.
  private lazy val derbyHome: Unit =
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))

  /** K4 — JDBC sink standing in for the reference's SQLite
    * `to_sql("cleaned_data", if_exists="replace")` (ETL_PROJECT.py:318-322);
    * `mode("overwrite")` is the `if_exists="replace"` semantics. Executed
    * for real against embedded Derby (jars ship with Spark) in q65 and
    * IoSpec; any server-side JDBC url works the same way at scale.
    */
  def writeJdbc(df: DataFrame, url: String, table: String = "cleaned_data",
      properties: java.util.Properties = new java.util.Properties): Unit = {
    derbyHome
    df.write.mode("overwrite").jdbc(url, table, properties)
  }

  /** JDBC source — the warehouse-ingest shape. `partitionColumn =
    * Some((col, lower, upper, n))` issues n range-predicate queries in
    * parallel (one per task) instead of one single-connection scan; at
    * 100 TB an unpartitioned JDBC read is a one-task bottleneck, so the
    * partitioned form is the default recommendation.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      properties: java.util.Properties = new java.util.Properties): DataFrame = {
    derbyHome
    partitionColumn match {
      case Some((c, lo, hi, n)) => spark.read.jdbc(url, table, c, lo, hi, n, properties)
      case None                 => spark.read.jdbc(url, table, properties)
    }
  }

  /** Recursively delete a LOCAL staging path (round-trip queries write
    * per-session files under java.io.tmpdir; without cleanup repeated
    * sessions accumulate directories). Safety: refuses anything outside
    * the system tmp directory — this is a staging-file janitor, not a
    * general delete.
    */
  def deleteLocalTmp(path: String): Unit = {
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      .toAbsolutePath.normalize
    val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    require(p.startsWith(tmpRoot) && p != tmpRoot, s"refusing to delete $p")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator.asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Release an in-memory Derby database. Derby signals a successful
    * drop by THROWING 08006 (non-transient connection exception) — the
    * one expected outcome; anything else propagates.
    */
  def dropDerbyInMemory(db: String): Unit =
    try {
      java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      ()
    } catch { case _: java.sql.SQLNonTransientConnectionException => () }
}

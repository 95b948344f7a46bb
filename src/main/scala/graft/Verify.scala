package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Adaptive execution ON by default since round 17 (it is the
    // bench/driver posture now — see Bench.scala); the round-17 gate
    // proved the full 400-query sweep bit-identical under both modes.
    // SPARK_GRAFT_AQE=0 opts back into static plans: AQE changes plan
    // SHAPES (coalesced shuffles, demoted broadcasts, split skewed
    // partitions), so any query whose answer depended on a partition
    // count or layout would diverge between the two sweeps first.
    val aqe = !sys.env.get("SPARK_GRAFT_AQE").contains("0")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // comma-separated filter for local iteration (unset = full driver set)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // defensive: a null SQL (e.g. an object-initialization-order bug in
    // a query module) must not take down the whole round's JSON
    val (nullSql, okSql) = SparkEntry.oracleSql.partition(_._2 == null)
    nullSql.keys.foreach(k => System.err.println(s"[verify] $k has NULL oracle sql — skipped"))
    val json = okSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

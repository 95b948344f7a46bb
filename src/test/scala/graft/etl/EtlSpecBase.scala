package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so ConcurrentExecSpec can give each submitting thread its
    // own pool; single-threaded suites are unaffected (one job at a
    // time schedules identically under FAIR and FIFO)
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()
}

abstract class EtlSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sc = spark.sparkContext
}

package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM. */
object TestSpark {
  // local[4, 2]: maxFailures = 2, so a planted first-attempt task
  // failure is RETRIED like on a real cluster (RetryDeterminismSpec)
  // instead of failing the job — local's default is maxFailures = 1.
  // Deterministic failures (raise_error guards etc.) still propagate,
  // just after the retry also fails.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
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

  /** Runs `body` with the JVM-global system property `key` set to
    * `value`, restoring the prior state after (ADVICE r15). sys.props
    * is unsynchronized global state: this helper is only sound under
    * SERIAL suite execution (sbt's default here — parallelExecution
    * is not enabled, and ConcurrentExecSpec's intra-suite threads
    * never touch property-dispatched queries). A suite that needs a
    * property-pinned path must use this instead of bare mutation so
    * the restore survives assertion failures.
    */
  def withSysProp[A](key: String, value: String)(body: => A): A = {
    val prior = sys.props.get(key)
    sys.props(key) = value
    try body
    finally prior match {
      case Some(v) => sys.props(key) = v
      case None => sys.props.remove(key)
    }
  }
}

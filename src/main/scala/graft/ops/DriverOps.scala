package graft.ops

import org.apache.spark.sql.DataFrame

/** Driver-side collapse of PROVABLY-TINY derived frames (round 18).
  *
  * `broadcast(tiny)` already collects the frame to the driver and
  * re-ships it — but it does so PER CONSUMING QUERY EXECUTION, re-
  * executing the frame's whole subtree each time, and each build is a
  * separate Spark job (a measured ~60–100 ms of fixed cost per job on
  * the bench host; the job-count profile is the top cost of the
  * multi-pass statistical queries). [[local]] does the same driver
  * movement ONCE and replays the rows as a LocalRelation: every
  * downstream broadcast then builds from local rows with no job and no
  * subtree re-execution.
  *
  * Contract: the frame must be bounded by GROUP/CONFIG cardinality
  * (per-group medians, probe rows, bucket offsets — never by data).
  * The cap is enforced loudly; this is the same boundedness argument
  * every `broadcast()` of these frames already made implicitly.
  */
object DriverOps {
  def local(df: DataFrame, maxRows: Int = 65536): DataFrame = {
    val rows = df.collectAsList()
    require(rows.size() <= maxRows,
      s"DriverOps.local: ${rows.size()} rows exceed the $maxRows cap — " +
        "this frame is not config-bounded; keep it distributed")
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}

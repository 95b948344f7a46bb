package graft.queries

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

/** Task-retry determinism (VERDICT r16 #6): the first thing a real
  * cluster does that a single quiet JVM never does is RETRY a task —
  * preempted executors, spot kills, fetch failures. A retried task
  * recomputes its partition from the last shuffle/checkpoint
  * boundary, so any nondeterminism in that lineage (an unseeded draw,
  * an iteration-order-dependent fold) ships different bytes on
  * attempt 2 and silently corrupts the result. The test session runs
  * `local[4, 2]` (maxFailures = 2) so a planted first-attempt
  * failure is genuinely retried.
  */
object RetryDeterminismSpec {
  // companion-object flags: local-mode executors share the JVM, so
  // the lambda (serialized per task) reaches the same atomics
  val armed = new AtomicBoolean(false)
  val fired = new AtomicBoolean(false)

  /** Throws once, on the first attempt of partition 0 while armed. */
  def plantFailure[T](idx: Int, it: Iterator[T]): Iterator[T] = {
    if (idx == 0 && TaskContext.get().attemptNumber() == 0 &&
        armed.get() && fired.compareAndSet(false, true))
      throw new RuntimeException("planted first-attempt task failure")
    it
  }
}

class RetryDeterminismSpec extends PlantedQuerySpec {

  import RetryDeterminismSpec._

  private val dir = "/root/testdata/sf0.001"

  /** Collect `name`'s result re-materialized through an RDD stage
    * whose partition 0 fails on its first attempt when `inject`.
    */
  private def collectWithRetry(name: String, inject: Boolean): Seq[String] = {
    fired.set(false)
    armed.set(inject)
    try {
      val out = run(name, dir).rdd
        .mapPartitionsWithIndex(plantFailure[org.apache.spark.sql.Row])
        .collect()
      if (inject) assert(fired.get(),
        s"$name: the planted failure never armed a task — empty " +
          "partition 0? The retry proved nothing.")
      out.map(_.toString).sorted.toSeq
    } finally armed.set(false)
  }

  test("a once-failing result-stage task leaves a seeded-op query " +
    "cross-section bit-identical") {
    assume(new java.io.File(s"$dir/customer.parquet").exists())
    // the draw/seed-heavy ops (Lehmer mixes, hash splits, kmeans
    // trajectories, JL projections) — exactly the lineages that
    // recompute differently under retry if any draw is unseeded —
    // plus two plain aggregation controls
    val slice = Seq("q66_shuffle_shard", "q77_temperature_mix",
      "q80_split_assign", "q202_stratified_split", "q226_group_kfold",
      "q76_kmeans_embed", "q293_jl_distortion", "q20_minhash_lsh",
      "q29_tpch_q1", "q57_stratified_sample")
    slice.foreach { n =>
      assert(graft.SparkEntry.queries.contains(n), s"$n not registered")
      val clean = collectWithRetry(n, inject = false)
      val retried = collectWithRetry(n, inject = true)
      assert(retried == clean, s"$n diverged under task retry")
    }
  }

  test("map-side seeded draws recompute bit-identically when their " +
    "OWN stage's task retries (failure before the shuffle)") {
    import spark.implicits._
    // the planted failure lives in the SAME stage as the draw
    // projection, upstream of the aggregation shuffle: the retry
    // re-executes the draws themselves, not just the result stage
    val draws = spark.range(0, 50000, 1, 4)
      .select(col("id"), graft.ops.MixOps.portableHash2(col("id"), 42L)
        .as("draw"))
    def shardCensus(inject: Boolean): Seq[String] = {
      fired.set(false)
      armed.set(inject)
      try {
        val rows = draws.rdd
          .mapPartitionsWithIndex(plantFailure[org.apache.spark.sql.Row])
          .map(r => (r.getLong(1) % 64, 1L))
          .reduceByKey(_ + _).collect()
        if (inject) assert(fired.get(), "planted failure never fired")
        rows.map(_.toString).sorted.toSeq
      } finally armed.set(false)
    }
    val clean = shardCensus(inject = false)
    val retried = shardCensus(inject = true)
    assert(retried == clean, "seeded draw stage diverged under retry")
  }
}

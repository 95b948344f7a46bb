package graft.queries

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** Registry plans must not rely on exclusive executor occupancy
  * (VERDICT r14 #8): N queries submitted CONCURRENTLY on one session —
  * each submitting thread in its own FAIR pool — must return exactly
  * the serial results. Everything else in the harness (Bench, Verify,
  * the driver) runs serially, so this is the one place that pins the
  * engine's behavior under a multi-tenant scheduler: shared
  * broadcast/checkpoint state, temp paths, and AQE re-planning must
  * all be per-query, not per-session.
  */
class ConcurrentExecSpec extends PlantedQuerySpec {

  private def canon(name: String, dir: String): Seq[String] =
    run(name, dir).collect().map(_.toString).sorted.toSeq

  test("20-query slice under concurrent FAIR-pool submission matches serial") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/customer.parquet").exists())
    // deterministic stride over the sorted registry: a fixed 20-name
    // cross-section that drifts WITH the registry instead of pinning
    // names that may later rename
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val stride = math.max(all.size / 20, 1)
    val slice = all.indices.collect {
      case i if i % stride == 0 => all(i)
    }.take(20)
    val t0 = System.nanoTime()
    val serial = slice.map(n => n -> canon(n, dir)).toMap
    val serialSec = (System.nanoTime() - t0) / 1e9
    val poolExec = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(poolExec)
    val t1 = System.nanoTime()
    val futs = slice.zipWithIndex.map { case (n, i) =>
      Future {
        // per-thread FAIR pool: undeclared pools get weight 1 /
        // minShare 0, so the 8 in-flight queries share the executor
        // fairly instead of queueing whole-job FIFO
        sc.setLocalProperty("spark.scheduler.pool", s"graft-conc-$i")
        try n -> canon(n, dir)
        finally sc.setLocalProperty("spark.scheduler.pool", null)
      }
    }
    val conc =
      try Await.result(Future.sequence(futs), 15.minutes).toMap
      finally poolExec.shutdown()
    val concSec = (System.nanoTime() - t1) / 1e9
    println(f"[conc] slice=${slice.size} serial=$serialSec%.1f s " +
      f"concurrent(8 threads)=$concSec%.1f s")
    slice.foreach { n =>
      assert(conc(n) == serial(n), s"$n diverged under concurrent execution")
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of registered queries to
  * files — the before/after plan evidence for optimization rounds
  * (plans/r17/<query>_{before,after}.txt). Usage:
  *
  *   graft.plans.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  *
  * Writes <outDir>/<query>_<suffix>.txt per query (all registered
  * queries when the filter list is omitted). The session mirrors the
  * bench config (shuffle.partitions = SPARK_GRAFT_CPUS, AQE per
  * SPARK_GRAFT_AQE) so the dumped plan is the one the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name")
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

/** Per-query execution profile: wall time plus scheduler-side job /
  * stage / task counts, the "where does the fixed cost go" measurement
  * behind the round-17 overhead work. Usage:
  *
  *   graft.plans.QueryProf <sfDir> <reps> q1,q2,...
  *
  * Prints one line per query: best wall seconds over reps, and the
  * job/stage/task counts of ONE steady-state run (counts are identical
  * across reps by construction — they derive from the plan, not the
  * data). Warm-up: each query runs once untimed first.
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val only = args(2).split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = !sys.env.get("SPARK_GRAFT_AQE").contains("0")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROF_PLAN=1: print each query's FINAL executed plan
    // (with AQE the post-reoptimization stages, which `explain` on an
    // unexecuted frame cannot show)
    if (sys.env.get("SPARK_GRAFT_PROF_PLAN").contains("1"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            println(s"=== FINAL PLAN ($funcName) ===\n${qe.executedPlan}")
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    // SPARK_GRAFT_PROF_STAGES=1: per-stage wall + task time + name, the
    // "which stage eats the query" breakdown (round 18)
    val profStages = sys.env.get("SPARK_GRAFT_PROF_STAGES").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          if (profStages) {
            val si = s.stageInfo
            val wall = (for {
              a <- si.submissionTime; b <- si.completionTime
            } yield b - a).getOrElse(-1L)
            println(f"[stage] id=${si.stageId}%5d wall=${wall}%6d ms " +
              f"tasks=${si.numTasks}%4d ${si.name.takeWhile(_ != '\n')}%.90s")
          }
        }
      })
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
      .foreach { case (name, fn) =>
        def run(): Unit =
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        try {
          run() // warmup (codegen, footers)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          org.apache.spark.GraftSparkInternals
            .drainListenerBus(spark.sparkContext)
          jobs.set(0); stages.set(0); tasks.set(0)
          val walls = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            run()
            (System.nanoTime() - t0) / 1e9
          }
          org.apache.spark.GraftSparkInternals
            .drainListenerBus(spark.sparkContext)
          val j = jobs.get.toDouble / reps
          val s = stages.get.toDouble / reps
          val t = tasks.get.toDouble / reps
          println(f"[prof] $name%-35s best=${walls.min}%6.3f s  " +
            f"jobs=$j%6.1f stages=$s%6.1f tasks=$t%8.1f (per rep avg)")
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[prof] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

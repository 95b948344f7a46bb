package graft.plans

import org.apache.spark.sql.SparkSession

/** Micro-probe for the session's fixed cost per job / exchange /
  * broadcast / checkpoint / collect (round 18): the job-count profiles
  * showed the expensive queries are job-bound (50+ jobs of tiny
  * tasks), so every structural decision needs the per-job quantum.
  * Usage: graft.plans.JobCost [reps]; honors SPARK_GRAFT_CPUS/AQE.
  */
object JobCost {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(20)
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
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[jobcost] $label%-40s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/op")
    }
    val tiny = spark.range(1000).toDF("id").localCheckpoint(true)
    time("collect scalar (no shuffle)") { tiny.agg(sum($"id")).collect() }
    time("collect scalar (1 shuffle groupBy)") {
      tiny.groupBy($"id" % 4).agg(sum($"id")).agg(sum("sum(id)")).collect() }
    time("noop write, 0 exchanges") { tiny.write.format("noop").mode("overwrite").save() }
    time("noop write, 1 exchange") {
      tiny.groupBy($"id" % 4).count().write.format("noop").mode("overwrite").save() }
    time("noop write, 2 exchanges") {
      tiny.groupBy($"id" % 4).count().groupBy($"count" % 3).count()
        .write.format("noop").mode("overwrite").save() }
    time("noop write, 4 exchanges") {
      tiny.groupBy($"id" % 4).count().groupBy($"count" % 3).count()
        .groupBy($"count" % 2).count().groupBy($"count").count()
        .write.format("noop").mode("overwrite").save() }
    time("broadcast join build (tiny)") {
      tiny.join(broadcast(tiny.limit(10).toDF("id2")), $"id" === $"id2", "left")
        .write.format("noop").mode("overwrite").save() }
    time("localCheckpoint(true) tiny") {
      val c = tiny.localCheckpoint(true)
      org.apache.spark.sql.graftbridge.RddBridge.unpersistCheckpoint(c)
    }
    time("window over 1 exchange") {
      import org.apache.spark.sql.expressions.Window
      tiny.withColumn("rn", row_number().over(
        Window.partitionBy($"id" % 4).orderBy($"id")))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}

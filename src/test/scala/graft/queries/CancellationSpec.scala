package graft.queries

/** Query cancellation (VERDICT r15 #5): the other thing a shared
  * 100 TB cluster does constantly besides concurrent submission is
  * CANCEL — a user kills a runaway query and the session must stay
  * fully usable. A heavy registry query runs in its own job group,
  * `sc.cancelJobGroup` lands mid-flight (with task interruption), and
  * the same session must then return bit-identical results for the
  * ConcurrentExecSpec-style 20-query registry slice: no poisoned
  * broadcast/checkpoint state, no half-written shuffle reuse, no
  * lingering scheduler debt.
  */
class CancellationSpec extends PlantedQuerySpec {

  private def canon(name: String, dir: String): Seq[String] =
    run(name, dir).collect().map(_.toString).sorted.toSeq

  test("cancelJobGroup mid-flight leaves the session returning " +
    "bit-identical results on a 20-query slice") {
    val dir = "/root/testdata/sf0.001"
    val heavyDir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/customer.parquet").exists())
    assume(new java.io.File(s"$heavyDir/customer.parquet").exists())
    // the same deterministic stride as ConcurrentExecSpec: a 20-name
    // cross-section that drifts with the registry
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val stride = math.max(all.size / 20, 1)
    val slice = all.indices.collect {
      case i if i % stride == 0 => all(i)
    }.take(20)
    val before = slice.map(n => n -> canon(n, dir)).toMap
    // a multi-stage pipeline at sf0.1 on local[4] runs many seconds —
    // the cancel lands as soon as its FIRST job turns live, so the
    // kill genuinely interrupts running tasks, not a finished query
    val group = "graft-cancel-probe"
    @volatile var outcome: Option[Throwable] = Some(
      new IllegalStateException("probe thread never ran"))
    val t = new Thread(() => {
      try {
        sc.setJobGroup(group, "cancellation probe", interruptOnCancel = true)
        graft.SparkEntry.queries("q67_curation_pipeline")(spark, heavyDir)
          .write.format("noop").mode("overwrite").save()
        outcome = None // completed before the cancel landed
      } catch { case e: Throwable => outcome = Some(e) }
      finally sc.clearJobGroup()
    }, "graft-cancel-probe-driver")
    t.start()
    val deadline = System.nanoTime() + (60 * 1e9).toLong
    while (sc.statusTracker.getJobIdsForGroup(group).isEmpty &&
      t.isAlive && System.nanoTime() < deadline) Thread.sleep(5)
    sc.cancelJobGroup(group)
    t.join(120000)
    assert(!t.isAlive, "cancelled query thread failed to terminate")
    assert(outcome.isDefined,
      "the heavy probe completed before the cancel landed — the test " +
        "proved nothing; pick a heavier probe query")
    // message wording differs across Spark versions — also accept the
    // structured error condition (SPARK_JOB_CANCELLED class) so a
    // wording change makes this self-diagnosing, not flaky (ADVICE r16)
    val cond = outcome.get match {
      case st: org.apache.spark.SparkThrowable =>
        Option(st.getCondition).getOrElse("")
      case _ => ""
    }
    val msg = outcome.get.toString.toLowerCase
    assert(msg.contains("cancel") || cond.toLowerCase.contains("cancel"),
      s"probe failed for a non-cancellation reason " +
        s"(condition=$cond): ${outcome.get}")
    // the session must be fully usable afterwards: same slice, same rows
    val after = slice.map(n => n -> canon(n, dir)).toMap
    slice.foreach { n =>
      assert(after(n) == before(n), s"$n diverged after cancellation")
    }
  }
}

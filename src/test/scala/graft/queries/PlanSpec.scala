package graft.queries

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Physical-plan regression guards for the scale-critical properties
  * (SURVEY.md §4): filter/column pushdown to parquet, broadcast joins
  * for dimension enrichment, per-partition top-k (WindowGroupLimit)
  * under row_number windows. If a refactor silently turns a broadcast
  * join into a SortMergeJoin or un-prunes a scan, these fail.
  */
class PlanSpec extends EtlSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("parquet scans carry pushed filters and pruned schemas") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("q30 dimension joins broadcast (never SortMergeJoin)") {
    val plan = planOf("q30_join_enrich")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q31/q22 top-k pushes WindowGroupLimit below the shuffle") {
    assert(planOf("q31_topk_window").contains("WindowGroupLimit"))
    assert(planOf("q22_cosine_topk").contains("WindowGroupLimit"))
  }

  test("q29 aggregate is partial+final (map-side combine)") {
    val plan = planOf("q29_tpch_q1")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"))
  }
}

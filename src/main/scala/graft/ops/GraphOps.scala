package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Iterative graph analytics over relational edge lists — the
  * link-authority side of corpus curation (rank pages by the link
  * graph before quality-gating them), complementing the structural
  * ops in [[DedupOps.dupClusters]] (connected components).
  *
  * Ranks live on an INTEGER grid (units of `scaleU⁻¹` of total
  * mass) and every redistribution step is integer division +
  * associative integer sums; the damping multiply is the single
  * double op per iteration, applied to an exactly-representable
  * value (< 2⁵³). Iterating therefore yields bit-identical ranks on
  * any partition layout and any engine — the [[MixOps]] determinism
  * discipline applied to fixed-point iteration.
  */
object GraphOps {

  /** Fixed-iteration damped PageRank on an integer mass grid.
    *
    * `rank₀ = S/N`; each step:
    * `rankᵢ₊₁(v) = ⌊(1−d)·S⌋/N + ⌊d · Σ_{u→v} (rankᵢ(u) div outdeg(u))⌋`
    * (all divisions integral; dangling mass — sink nodes with no
    * out-edges — simply leaks, the standard simplification).
    *
    * Scale shape: per iteration ONE join of edges to the current
    * rank frame on `src` (both sides hash-partitioned on the same
    * key, so the shuffle is reused across iterations) and one
    * partial-aggregable inflow sum on `dst`. The node frame and
    * out-degree frame are computed once. `iters` is a small constant
    * — the 100 TB cost is `iters × (one edge-keyed shuffle)`, the
    * canonical distributed-PageRank shape; no driver-side state
    * beyond the N scalar.
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 3, damping: Double = 0.85,
      scaleU: Long = 1000000000000L): DataFrame = {
    // the edge list is the loop invariant every iteration re-reads:
    // checkpoint it once (truncating the upstream scan/join/distinct
    // lineage) instead of recomputing it `iters` times
    val edges = edgesIn.localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    val initU = scaleU / n
    val teleU = math.floor((1.0 - damping) * scaleU).toLong / n
    var rank = nodes.select(col("node"), lit(initU).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outdeg, "src")
        .join(rank.withColumnRenamed("node", "src").withColumnRenamed("r", "rs"),
          "src")
        .select(col("dst"), expr("rs div deg").as("c"))
      val inflow = contrib.groupBy("dst").agg(sum(col("c")).as("infl"))
      rank = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleU) +
            floor(lit(damping) * coalesce(col("infl"), lit(0L)).cast(DoubleType))
              .cast(LongType)).as("r"))
    }
    rank.orderBy(col("r").desc, col("node"))
  }

  /** [[pageRank]] oracle rendering: the same integer recurrence as
    * `iters` chained CTEs (`//` = integer div, HUGEINT inflow sums
    * cast back through DOUBLE for the damping multiply).
    */
  def pageRankSql(edgesCte: String, iters: Int = 3, damping: Double = 0.85,
      scaleU: Long = 1000000000000L): String = {
    val tele = s"(CAST(floor(${1.0 - damping} * $scaleU) AS BIGINT) // nn.n)"
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT v.node,
         |    $tele + CAST(floor($damping * CAST(coalesce(infl.s, 0) AS DOUBLE)) AS BIGINT) AS r
         |  FROM nodes v CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst, CAST(sum(p.r // d.deg) AS BIGINT) AS s
         |             FROM edges e JOIN outdeg d ON e.src = d.src
         |             JOIN r${i - 1} p ON e.src = p.node
         |             GROUP BY e.dst) infl ON v.node = infl.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesCte),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT node, $scaleU // nn.n AS r FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node, r FROM r$iters ORDER BY r DESC, node""".stripMargin
  }
}

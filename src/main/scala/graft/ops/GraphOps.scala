package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** Distinct co-occurrence pairs (a < b) from an (order, item)
    * relation — the edge/pair generator behind the co-purchase graph
    * (q146/q153/q159) and association rules (q151).
    *
    * Shape: ONE distinct shuffle on (ok, item), then a groupBy(ok)
    * that REUSES the same hash partitioning (no second exchange) to
    * collect each basket as a sorted array; the per-basket cap is a
    * simple size predicate on that array, and pair expansion is a
    * pure map-side generator over it (sorted ⇒ a < b for free). The
    * earlier self-join formulation (items ⋈ items on ok + a
    * HAVING-count eligibility pass) cost two extra corpus-sized
    * shuffles and measured superlinear at 10× — this is the shape
    * that survives the scale-up.
    *
    * Returns (`ok`, `a`, `b`) — one row per unordered item pair per
    * basket.
    */
  def basketPairs(rel: DataFrame, okCol: Column, itemCol: Column,
      maxItems: Int): DataFrame =
    pairsFromBaskets(cappedBaskets(rel, okCol, itemCol, maxItems))

  /** The capped per-order item arrays behind [[basketPairs]]:
    * (`ok`, `ps` = sorted distinct items), baskets above `maxItems`
    * items dropped (the pair-fan-out cap), single-item baskets KEPT
    * (they carry support counts even though they yield no pairs).
    * `collect_set` dedups WITHIN the one ok-keyed aggregate, so the
    * whole basket build is a single corpus shuffle (a separate
    * `.distinct()` pass would pay that shuffle twice — measured at
    * 10×, it was the dominant cost).
    */
  def cappedBaskets(rel: DataFrame, okCol: Column, itemCol: Column,
      maxItems: Int): DataFrame =
    rel.select(okCol.as("ok"), itemCol.as("item"))
      .groupBy("ok").agg(sort_array(collect_set(col("item"))).as("ps"))
      .where(size(col("ps")) <= maxItems)

  /** Map-side pair expansion over [[cappedBaskets]] output — sorted
    * arrays make a < b free.
    */
  def pairsFromBaskets(baskets: DataFrame): DataFrame = {
    val pairs = flatten(transform(sequence(lit(1), size(col("ps")) - 1),
      i => transform(sequence(i + 1, size(col("ps"))),
        j => struct(element_at(col("ps"), i).as("a"),
          element_at(col("ps"), j).as("b")))))
    baskets.where(size(col("ps")) >= 2)
      .select(col("ok"), explode(pairs).as("p"))
      .select(col("ok"), col("p.a").as("a"), col("p.b").as("b"))
  }

  /** Degree-ordered triangle census over an undirected edge list.
    *
    * Input: columns (`a`, `b`) — any direction, self-loops and
    * duplicates tolerated (normalized away). Output: ONE row
    * (n_nodes, n_edges, n_wedges, n_triangles, gcc_ppm) where
    * `n_wedges = Σ_v d(v)(d(v)−1)/2` and `gcc_ppm` is the global
    * clustering coefficient `3·T/W` in exact integer ppm.
    *
    * Scale shape: the naive wedge join (edges ⋈ edges on the shared
    * endpoint) explodes quadratically on hub nodes. The fix is the
    * standard degree orientation: direct every edge from its
    * (degree, id)-smaller endpoint to the larger, so each triangle
    * {x<y<z} is counted exactly once as x→y, y→z, x→z, and a node's
    * out-degree is bounded by O(√m) — total wedge-join work is
    * O(m^{3/2}) (the arboricity bound) instead of Σd². Both joins
    * are plain hash joins on edge keys; no driver-side state.
    */
  def triangleStats(edgesIn: DataFrame): DataFrame = {
    val und = edgesIn.select(
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // read by degree calc + two orientation joins
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient: src = the (deg, id)-lexicographically smaller endpoint
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .localCheckpoint(true) // read three times by the wedge/close joins
    val wedgePaths = oriented.select(col("src").as("x"), col("dst").as("y"))
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), "y")
    val triangles = wedgePaths
      .join(oriented.select(col("src").as("x"), col("dst").as("z")),
        Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("n_wedges"))
    val edgeStats = und.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(broadcast(edgeStats)) // one-row stats frames
      .crossJoin(broadcast(triangles))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("3 * n_triangles * 1000000 div n_wedges"))
          .otherwise(lit(0L)).as("gcc_ppm"))
  }

  /** [[triangleStats]] oracle rendering over an `edgesCte` producing
    * columns (a, b).
    */
  def triangleStatsSql(edgesCte: String): String =
    s"""WITH raw AS ($edgesCte),
       |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |        FROM raw WHERE a <> b),
       |deg AS (SELECT node, count(*) AS deg FROM (
       |          SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |        GROUP BY 1),
       |ori AS (SELECT
       |    CASE WHEN (da.deg, und.u) < (db.deg, und.v) THEN und.u ELSE und.v END AS src,
       |    CASE WHEN (da.deg, und.u) < (db.deg, und.v) THEN und.v ELSE und.u END AS dst
       |  FROM und JOIN deg da ON und.u = da.node JOIN deg db ON und.v = db.node),
       |tri AS (SELECT count(*) AS n_triangles
       |  FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
       |  JOIN ori e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |ds AS (SELECT count(*) AS n_nodes,
       |         CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
       |es AS (SELECT count(*) AS n_edges FROM und)
       |SELECT n_nodes, n_edges, n_wedges, CAST(n_triangles AS BIGINT) AS n_triangles,
       |  CASE WHEN n_wedges > 0
       |       THEN CAST(3 * n_triangles * 1000000 // n_wedges AS BIGINT)
       |       ELSE 0 END AS gcc_ppm
       |FROM ds, es, tri""".stripMargin

  /** Fixed-round k-core peeling census.
    *
    * Input: undirected edges (`a`, `b`), normalized like
    * [[triangleStats]]. Each round removes every node whose CURRENT
    * degree is below `k` (with its edges), the standard iterative
    * peel whose fixpoint is the k-core. Output: one row per round —
    * (round, n_removed, n_nodes_after, n_edges_after) — the
    * densification trace an analyst reads to pick k (`rounds` is a
    * small constant; rounds-to-fixpoint is data-dependent, so a
    * bounded-round TRACE is the distributed-friendly contract, the
    * same shape as pageRank's fixed iterations).
    *
    * Scale shape: per round one partial-aggregable degree count and
    * one semi-join of the edge list against the surviving nodes
    * (edge-keyed shuffles only), with the surviving edge frame
    * checkpointed per round to keep lineage flat. Driver state is
    * `rounds × 4` scalars.
    */
  def kCorePeel(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    var cur = edgesIn.select(
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val out = Seq.newBuilder[(Int, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val deg = cur.select(col("u").as("node"))
        .unionAll(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true) // feeds the census AND both semi-joins
      val keep = deg.where(col("deg") >= k)
      // both round counts in ONE job over the checkpointed degree frame
      val stats = deg.agg(count(lit(1)).as("nb"),
        sum(when(col("deg") >= k, 1L).otherwise(0L)).as("na")).head()
      val nBefore = stats.getLong(0)
      val nAfter = Option(stats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      cur = cur
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(true)
      out += ((r, nBefore - nAfter, nAfter, cur.count()))
    }
    out.result().toDF("round", "n_removed", "n_nodes_after", "n_edges_after")
      .orderBy("round")
  }

  /** [[kCorePeel]] oracle rendering: unrolled degree/keep/filter CTE
    * blocks over an `edgesCte` producing columns (a, b).
    */
  def kCorePeelSql(edgesCte: String, k: Int, rounds: Int): String = {
    val blocks = (1 to rounds).map { r =>
      s"""d$r AS (SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
         |  GROUP BY 1),
         |k$r AS (SELECT node FROM d$r WHERE deg >= $k),
         |e$r AS (SELECT u, v FROM e${r - 1}
         |  WHERE u IN (SELECT node FROM k$r) AND v IN (SELECT node FROM k$r))""".stripMargin
    }.mkString(",\n")
    val rows = (1 to rounds).map { r =>
      s"""SELECT $r AS round,
         |  (SELECT count(*) FROM d$r) - (SELECT count(*) FROM k$r) AS n_removed,
         |  (SELECT count(*) FROM k$r) AS n_nodes_after,
         |  (SELECT count(*) FROM e$r) AS n_edges_after""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH e0 AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |  FROM ($edgesCte) WHERE a <> b),
       |$blocks
       |SELECT round, n_removed, n_nodes_after, n_edges_after FROM (
       |  $rows)
       |ORDER BY round""".stripMargin
  }

  /** Synchronous label propagation (fixed rounds) + community census.
    *
    * Input: undirected edges (`a`, `b`), normalized like
    * [[triangleStats]]. Labels start as node ids; each round every
    * node adopts the most frequent label among its NEIGHBORS (ties →
    * smallest label; isolated nodes cannot occur — every node has an
    * edge by construction). After `rounds` rounds, returns the top
    * `topK` communities as (label, n_members), ties → smallest label.
    * Fixed rounds, like [[pageRank]]: rounds-to-convergence is
    * data-dependent, so a bounded-round snapshot is the distributed
    * contract.
    *
    * Scale shape: per round ONE edge-keyed join of the label frame +
    * one (node, label) partial-aggregable count + a per-node argmax
    * via WindowGroupLimit — no driver state at all; the census ships
    * `topK` rows by TakeOrdered.
    */
  def labelPropagation(edgesIn: DataFrame, rounds: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edgesIn.select(
        least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // both directions: neighbor lists are symmetric
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("node"), col("u").as("nbr")))
      .localCheckpoint(true)
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      val nbrLabels = adj
        .join(labels.withColumnRenamed("node", "nbr")
          .withColumnRenamed("lbl", "nlbl"), "nbr")
        .groupBy(col("node"), col("nlbl")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("node")
        .orderBy(col("c").desc, col("nlbl").asc)
      labels = nbrLabels
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("nlbl").as("lbl"))
        .localCheckpoint(true) // flatten the per-round lineage
    }
    labels.groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
      .limit(topK)
  }

  /** [[labelPropagation]] oracle rendering. */
  def labelPropagationSql(edgesCte: String, rounds: Int, topK: Int): String = {
    val blocks = (1 to rounds).map { i =>
      s"""l$i AS (SELECT node, nlbl AS lbl FROM (
         |    SELECT adj.node, p.lbl AS nlbl, count(*) AS c,
         |      row_number() OVER (PARTITION BY adj.node
         |        ORDER BY count(*) DESC, p.lbl ASC) AS rn
         |    FROM adj JOIN l${i - 1} p ON adj.nbr = p.node
         |    GROUP BY adj.node, p.lbl)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |  FROM ($edgesCte) WHERE a <> b),
       |adj AS (SELECT u AS node, v AS nbr FROM und
       |  UNION ALL SELECT v, u FROM und),
       |l0 AS (SELECT DISTINCT node AS node, node AS lbl FROM adj),
       |$blocks
       |SELECT lbl AS label, count(*) AS n_members FROM l$rounds
       |GROUP BY 1 ORDER BY n_members DESC, label LIMIT $topK""".stripMargin
  }

  /** Frontier BFS level census from a seed predicate.
    *
    * Input: directed edges (`src`, `dst`) — pass both directions for
    * an undirected graph — and a one-column seed frame (`node`).
    * Output: (level, n_nodes) for levels 0..maxHops, where level is
    * the FIRST hop count at which a node becomes reachable (the
    * shortest-path level census).
    *
    * Scale shape: classic frontier expansion — per hop ONE join of
    * the edge list to the current frontier plus one distinct and one
    * anti-join against the visited set; the frontier and visited
    * frames are node-keyed (never edge-keyed), and each hop's
    * frontier is checkpointed so lineage stays flat. maxHops is a
    * small constant; at 100 TB this is `hops × (one edge shuffle)`,
    * the Pregel BFS shape without per-node mutable state.
    */
  def bfsLevels(edgesIn: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst")).localCheckpoint(true)
    var frontier = seeds.select(col("node")).distinct().localCheckpoint(true)
    var visited = frontier
    var out = frontier.select(lit(0).as("level"), col("node"))
    for (h <- 1 to maxHops) {
      frontier = edges
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      // visited is a union of already-checkpointed frontiers: lineage
      // is flat without materializing it again each hop
      visited = visited.unionAll(frontier)
      out = out.unionAll(frontier.select(lit(h).as("level"), col("node")))
    }
    out.groupBy("level").agg(count(lit(1)).as("n_nodes")).orderBy("level")
  }

  /** [[bfsLevels]] oracle rendering: unrolled per-hop CTEs (frontier
    * = neighbors of the previous frontier minus everything seen).
    */
  def bfsLevelsSql(edgesCte: String, seedsCte: String, maxHops: Int): String = {
    val hops = (1 to maxHops).map { h =>
      s"""f$h AS (SELECT DISTINCT e.dst AS node
         |  FROM edges e JOIN f${h - 1} f ON e.src = f.node
         |  WHERE e.dst NOT IN (SELECT node FROM v${h - 1})),
         |v$h AS (SELECT node FROM v${h - 1} UNION SELECT node FROM f$h)""".stripMargin
    }.mkString(",\n")
    val levels = (0 to maxHops)
      .map(h => s"SELECT $h AS level, count(*) AS n_nodes FROM f$h")
      .mkString(" UNION ALL ")
    s"""WITH edges AS ($edgesCte),
       |f0 AS (SELECT DISTINCT node FROM ($seedsCte)),
       |v0 AS (SELECT node FROM f0),
       |$hops
       |SELECT level, n_nodes FROM ($levels) WHERE n_nodes > 0 ORDER BY level""".stripMargin
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

  /** Fixed-iteration HITS (hubs & authorities) on an integer mass
    * grid. Each half-step is the classic mutual reinforcement —
    * `a(v) = Σ_{u→v} h(u)`, `h(u) = Σ_{u→v} a(v)` — followed by L1
    * normalization to `scaleU` total mass via one integral division
    * (`x·scaleU div Σx`, numerators in DECIMAL(38,0)), replacing the
    * usual IEEE L2 normalization so every iterate is bit-identical
    * on any partition layout and any engine. Hub scores exist for
    * nodes with out-edges, authority scores for nodes with in-edges
    * (on a bipartite graph: the two sides).
    *
    * Scale shape: per iteration one edge⋈hub join keyed on `src` +
    * one edge⋈auth join keyed on `dst` (each followed by a map-side-
    * combining sum), and two one-row total frames broadcast back —
    * the Pregel half-step pair. Score frames are checkpointed each
    * iteration so lineage stays flat ([[pageRank]]'s q215 lesson).
    */
  def hits(edgesIn: DataFrame, iters: Int = 3,
      scaleU: Long = 1000000000L): DataFrame = {
    require(iters > 0, s"iters must be positive: $iters")
    val edges = edgesIn.localCheckpoint(true)
    var hub = edges.select(col("src")).distinct()
      .select(col("src"), lit(scaleU).as("h"))
      .localCheckpoint(true)
    var auth: DataFrame = hub.limit(0)
      .select(col("src").as("dst"), col("h").as("a"))
    for (_ <- 1 to iters) {
      // sums in DECIMAL(38,0) from the first partial on: at scaleU=1e9
      // a BIGINT per-node (or total) accumulator wraps silently once
      // edge counts reach ~9e9 — the 100 TB framing — while the
      // oracle's HUGEINT sums stay exact (ADVICE r11)
      val araw = edges.join(hub, "src").groupBy("dst")
        .agg(sum(col("h").cast(DecimalType(38, 0))).as("ar"))
      val atot = araw.agg(sum(col("ar")).cast(DecimalType(38, 0)).as("at"))
      auth = araw.crossJoin(broadcast(atot))
        .select(col("dst"), expr(s"ar * ${scaleU}L div at").as("a"))
        .localCheckpoint(true)
      val hraw = edges.join(auth, "dst").groupBy("src")
        .agg(sum(col("a").cast(DecimalType(38, 0))).as("hr"))
      val htot = hraw.agg(sum(col("hr")).cast(DecimalType(38, 0)).as("ht"))
      hub = hraw.crossJoin(broadcast(htot))
        .select(col("src"), expr(s"hr * ${scaleU}L div ht").as("h"))
        .localCheckpoint(true)
    }
    hub.select(col("src").as("node"), lit("hub").as("kind"),
        col("h").as("score_u"))
      .unionByName(auth.select(col("dst").as("node"),
        lit("authority").as("kind"), col("a").as("score_u")))
      .orderBy(col("kind"), col("score_u").desc, col("node"))
  }

  /** [[hits]] oracle rendering: the iteration unrolled CTE by CTE,
    * HUGEINT numerators mirroring the DECIMAL(38,0) ones.
    */
  def hitsSql(edgesCte: String, iters: Int = 3,
      scaleU: Long = 1000000000L): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (SELECT dst, CAST(CAST(sum(h) AS HUGEINT) * $scaleU
         |    // (SELECT CAST(sum(ar) AS HUGEINT) FROM (
         |      SELECT dst, sum(h) AS ar FROM edges JOIN h${i - 1} USING (src)
         |      GROUP BY 1)) AS BIGINT) AS a
         |  FROM edges JOIN h${i - 1} USING (src) GROUP BY dst),
         |h$i AS (SELECT src, CAST(CAST(sum(a) AS HUGEINT) * $scaleU
         |    // (SELECT CAST(sum(hr) AS HUGEINT) FROM (
         |      SELECT src, sum(a) AS hr FROM edges JOIN a$i USING (dst)
         |      GROUP BY 1)) AS BIGINT) AS h
         |  FROM edges JOIN a$i USING (dst) GROUP BY src)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesCte),
       |h0 AS (SELECT DISTINCT src, CAST($scaleU AS BIGINT) AS h FROM edges),
       |$iterCtes
       |SELECT src AS node, 'hub' AS kind, h AS score_u FROM h$iters
       |UNION ALL
       |SELECT dst AS node, 'authority' AS kind, a AS score_u FROM a$iters
       |ORDER BY kind, score_u DESC, node""".stripMargin
  }

  /** Weighted single-source-set shortest-path distance census —
    * min-plus Bellman-Ford, frontier-restricted (the label-correcting
    * SSSP every routing/blast-radius job over a weighted graph needs;
    * [[bfsLevels]] is the unit-weight special case).
    *
    * Input: directed edges (`src`, `dst`, `w`) with BIGINT weights
    * `w ≥ 0` (pass both directions for undirected), and a one-column
    * seed frame (`node`) — all seeds start at distance 0. Output:
    * (dist, n_nodes) over nodes reachable within `rounds` edges,
    * where dist = exact min-plus distance over paths of ≤ `rounds`
    * edges (the Bellman-Ford invariant).
    *
    * Scale shape: per round, edges join ONLY the frontier (nodes
    * whose distance improved last round) — the delta-restriction is
    * exact because an improvement at round r propagates at round r+1,
    * so after r rounds both the full relaxation and the restricted
    * one have minimized over every ≤ r-edge path. Candidate
    * distances pre-aggregate per dst (map-side combine) BEFORE
    * joining the running distance map, and each round checkpoints
    * frontier + distances so lineage stays flat. Per round: one
    * edge-keyed shuffle + two node-keyed shuffles, the Pregel SSSP
    * shape — at 100 TB the cost is `rounds × (edge shuffle)` with a
    * frontier that shrinks as labels settle, never a node×node
    * structure.
    */
  def ssspDistances(edgesIn: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("d")).localCheckpoint(true)
    var frontier = dist
    for (_ <- 1 to rounds) {
      val cand = relaxOnce(edges, frontier)
      val improved = cand
        .join(dist.withColumnRenamed("d", "__old"), Seq("node"), "left_outer")
        .where(col("__old").isNull || col("d") < col("__old"))
        .select(col("node"), col("d"))
        .localCheckpoint(true)
      // improved rows shadow their stale entries through the min
      dist = dist.unionAll(improved)
        .groupBy("node").agg(min(col("d")).as("d"))
        .localCheckpoint(true)
      frontier = improved
    }
    dist.groupBy("d").agg(count(lit(1)).as("n_nodes"))
      .select(col("d").as("dist"), col("n_nodes"))
      .orderBy("dist")
  }

  /** Personalized PageRank: teleport mass returns ONLY to the seed
    * set (uniformly), so ranks measure relevance TO THE SEEDS — the
    * random-walk-with-restart behind graph-based recommendations and
    * cohort blast-radius scoring. Same integer grid, damping step,
    * and per-iteration shape as [[pageRank]] (one edge-keyed shuffle
    * per iteration, no driver state beyond the seed-count scalar);
    * non-seed nodes start at 0 and receive no teleport. Output:
    * top-`topK` nodes by (rank desc, node asc) via TakeOrdered.
    */
  def personalizedPageRank(edgesIn: DataFrame, seedsIn: DataFrame,
      iters: Int = 3, damping: Double = 0.85,
      scaleU: Long = 1000000000000L, topK: Int = 25): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val seeds = seedsIn.select(col("node")).distinct()
      .withColumn("is_seed", lit(1)).localCheckpoint(true)
    val ns = seeds.count()
    require(ns > 0, "personalizedPageRank needs a non-empty seed set")
    val initU = scaleU / ns
    val teleU = math.floor((1.0 - damping) * scaleU).toLong / ns
    var rank = nodes.join(seeds, Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed") === 1, initU).otherwise(0L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outdeg, "src")
        .join(rank.withColumnRenamed("node", "src").withColumnRenamed("r", "rs"),
          "src")
        .select(col("dst"), expr("rs div deg").as("c"))
      val inflow = contrib.groupBy("dst").agg(sum(col("c")).as("infl"))
      // checkpoint each round: the PPR recurrence has TWO left joins
      // per iteration (inflow + seed membership), so un-truncated
      // lineage compounds to a join tree that re-plans and re-executes
      // shared subtrees (measured 11.8 s → ~3 s at sf0.1)
      rank = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .join(seeds, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed") === 1, teleU).otherwise(0L) +
            floor(lit(damping) * coalesce(col("infl"), lit(0L)).cast(DoubleType))
              .cast(LongType)).as("r"))
        .localCheckpoint(true)
    }
    rank.orderBy(col("r").desc, col("node")).limit(topK)
  }

  /** [[personalizedPageRank]] oracle rendering. */
  def personalizedPageRankSql(edgesCte: String, seedsCte: String,
      iters: Int = 3, damping: Double = 0.85,
      scaleU: Long = 1000000000000L, topK: Int = 25): String = {
    val teleU = s"(CAST(floor(${1.0 - damping} * $scaleU) AS BIGINT) // nsx.ns)"
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT v.node,
         |    CASE WHEN s.node IS NOT NULL THEN $teleU ELSE 0 END
         |      + CAST(floor($damping * CAST(coalesce(infl.s, 0) AS DOUBLE)) AS BIGINT) AS r
         |  FROM nodes v CROSS JOIN nsx
         |  LEFT JOIN seeds s ON v.node = s.node
         |  LEFT JOIN (SELECT e.dst, CAST(sum(p.r // d.deg) AS BIGINT) AS s
         |             FROM edges e JOIN outdeg d ON e.src = d.src
         |             JOIN r${i - 1} p ON e.src = p.node
         |             GROUP BY e.dst) infl ON v.node = infl.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesCte),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |seeds AS (SELECT DISTINCT node FROM ($seedsCte)),
       |nsx AS (SELECT count(*) AS ns FROM seeds),
       |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT v.node,
       |    CASE WHEN s.node IS NOT NULL THEN $scaleU // nsx.ns ELSE 0 END AS r
       |  FROM nodes v CROSS JOIN nsx LEFT JOIN seeds s ON v.node = s.node),
       |$iterCtes
       |SELECT node, r FROM r$iters ORDER BY r DESC, node LIMIT $topK""".stripMargin
  }

  /** One SSSP relaxation round: candidate distances through the
    * frontier's out-edges, pre-aggregated to one min per dst (the
    * map-side-combining edge shuffle PlanSpec pins).
    */
  private[graft] def relaxOnce(edges: DataFrame,
      frontier: DataFrame): DataFrame =
    edges
      .join(frontier.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      .groupBy("node").agg(min(col("d")).as("d"))

  /** [[ssspDistances]] oracle rendering: the UNRESTRICTED relaxation
    * unrolled (relax every labeled node each round) — equivalent to
    * the frontier-restricted form after the same number of rounds,
    * per the propagation argument in the scaladoc above.
    */
  def ssspDistancesSql(edgesCte: String, seedsCte: String,
      rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""d$r AS (SELECT node, min(d) AS d FROM (
         |    SELECT node, d FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, p.d + e.w AS d
         |    FROM edges e JOIN d${r - 1} p ON e.src = p.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesCte),
       |d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS d FROM ($seedsCte)),
       |$iters
       |SELECT d AS dist, count(*) AS n_nodes FROM d$rounds
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}

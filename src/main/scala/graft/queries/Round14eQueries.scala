package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 fifth wave: isolation-forest anomaly census (q394) and
  * linear-model SHAP feature attribution (q395) — both exact integer
  * replays (hash-seeded forests, DECIMAL Cramer solves) so the DuckDB
  * oracle hash-matches at every SF.
  */
object Round14eQueries {

  // -- q394: isolation-forest anomaly census ---------------------------------------
  // The streaming-friendly variant (fixed global split ranges, the
  // random-cut-forest flavor): T hash-seeded trees of depth D over
  // (order value, order date); a node's split dimension and threshold
  // are pure functions of (tree, node id), so a point's root-to-leaf
  // path is ONE unrolled map-side expression and the forest never
  // materializes. A point's path length is the first depth at which
  // it is ALONE in its node — one (tree, depth, node) census + a join
  // back. Output: the 20 most isolable orders (shortest average
  // path). Scale shape: a T*D-fold explode into a partial-aggregable
  // census; no iteration, no driver state beyond the 4 range
  // literals.
  private val IfTrees = 8
  private val IfDepth = 8

  private def q394(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey").as("id"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE)," +
          " DATE '1990-01-01') AS BIGINT)").as("y"))
    val rng = pts.agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
      min(col("y")).as("y0"), max(col("y")).as("y1"))
    // node walk: node <- node*2 + (v > thr(tree, node)); one column
    // per depth, unrolled as SQL so the integral div matches the
    // oracle's // exactly
    def h(node: String, salt: Int): String =
      s"((t * 1000003 + $node * 48271 + $salt) * 1103515245 + 12345)" +
        s" % 2147483648"
    val base = pts.crossJoin(broadcast(rng))
      .withColumn("t", explode(array((1 to IfTrees).map(i =>
        lit(i.toLong)): _*)))
    val walked = (1 to IfDepth).foldLeft(
      base.withColumn("node1", lit(1L))) { case (df, d) =>
      val n = s"node$d"
      df.withColumn(s"node${d + 1}", expr(
        s"$n * 2 + (CASE WHEN (CASE WHEN ${h(n, 1)} % 2 = 0 THEN x" +
          s" ELSE y END) > (CASE WHEN ${h(n, 1)} % 2 = 0" +
          s" THEN x0 + (${h(n, 2)} % 10001) * (x1 - x0) div 10000" +
          s" ELSE y0 + (${h(n, 2)} % 10001) * (y1 - y0) div 10000 END)" +
          s" THEN 1 ELSE 0 END)"))
    }
    val paths = walked.select(col("id"), col("t"),
      explode(array((1 to IfDepth).map(d =>
        struct(lit(d.toLong).as("depth"), col(s"node${d + 1}").as("node"))
      ): _*)).as("p"))
      .select(col("id"), col("t"), col("p.depth").as("depth"),
        col("p.node").as("node"))
    // a singleton census cell IS its point: max(id) identifies it, so
    // the path frame is never joined back — the only shuffles are the
    // census and a (point, tree)-spine left join against the (tiny)
    // singleton set
    val singles = paths.groupBy("t", "depth", "node")
      .agg(count(lit(1)).as("cnt"), max(col("id")).as("id"))
      .where(col("cnt") === 1)
      .groupBy("id", "t").agg(min(col("depth")).as("pl0"))
    val pl = pts.select(col("id"))
      .withColumn("t", explode(array((1 to IfTrees).map(i =>
        lit(i.toLong)): _*)))
      .join(singles, Seq("id", "t"), "left")
      .select(col("id"), coalesce(col("pl0"), lit(IfDepth.toLong))
        .as("pl"))
    pl.groupBy("id")
      .agg(expr(s"sum(pl) * 1000 div $IfTrees").as("avg_path_milli"))
      .orderBy(col("avg_path_milli"), col("id"))
      .limit(20)
  }

  private val q394Oracle: String = {
    def h(salt: Int) =
      s"((t * 1000003 + node * 48271 + $salt) * 1103515245 + 12345)" +
        s" % 2147483648"
    val steps = (1 to IfDepth).map { d =>
      s"""w$d AS (SELECT id, x, y, t, x0, x1, y0, y1,
         |  node * 2 + (CASE WHEN (CASE WHEN ${h(1)} % 2 = 0 THEN x
         |    ELSE y END) > (CASE WHEN ${h(1)} % 2 = 0
         |    THEN x0 + (${h(2)} % 10001) * (x1 - x0) // 10000
         |    ELSE y0 + (${h(2)} % 10001) * (y1 - y0) // 10000 END)
         |    THEN 1 ELSE 0 END) AS node,
         |  $d AS depth
         |FROM ${if (d == 1) "base" else s"w${d - 1}"})""".stripMargin
    }.mkString(",\n")
    val unions = (1 to IfDepth).map(d =>
      s"SELECT id, t, depth, node FROM w$d").mkString("\nUNION ALL ")
    s"""WITH pts AS (SELECT o_orderkey AS id,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1990-01-01' AS BIGINT)
       |      AS y
       |  FROM orders),
       |rng AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0,
       |    max(y) AS y1 FROM pts),
       |base AS (SELECT id, x, y, t.t, x0, x1, y0, y1, CAST(1 AS BIGINT)
       |    AS node
       |  FROM pts, rng, (SELECT unnest(range(1, ${IfTrees + 1})) AS t) t),
       |$steps,
       |paths AS ($unions),
       |census AS (SELECT t, depth, node, count(*) AS cnt FROM paths
       |  GROUP BY 1, 2, 3),
       |pl AS (SELECT id, paths.t,
       |    coalesce(min(CASE WHEN cnt = 1 THEN depth END), $IfDepth)
       |      AS pl
       |  FROM paths JOIN census USING (t, depth, node) GROUP BY 1, 2)
       |SELECT id, CAST(sum(pl) * 1000 // $IfTrees AS BIGINT)
       |    AS avg_path_milli
       |FROM pl GROUP BY id
       |ORDER BY avg_path_milli, id LIMIT 20""".stripMargin
  }

  // -- q395: linear-model SHAP attribution -------------------------------------------
  // Exact SHAP for a linear model IS phi_j = b_j * (x_j - mean_j); fit
  // y = a + b1*q + b2*disc on the cents grid by the 2-feature normal
  // equations (Cramer ratios held as exact DECIMAL numerator /
  // denominator pairs — no division until the ppm grid), then report
  // per-returnflag mean absolute attribution per feature: the global
  // feature-importance table an explainability dashboard shows. Two
  // scans (moments, then attribution census), everything else is
  // 1-row algebra.
  private def q395(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("x2"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("y"))
      .localCheckpoint(true) // moments pass AND attribution pass
    val m = rows.agg(count(lit(1)).as("n"),
      sum(expr("CAST(x1 AS DECIMAL(38,0))")).as("s1"),
      sum(expr("CAST(x2 AS DECIMAL(38,0))")).as("s2"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x1")).as("s11"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x2")).as("s12"),
      sum(expr("CAST(x2 AS DECIMAL(38,0)) * x2")).as("s22"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * y")).as("s1y"),
      sum(expr("CAST(x2 AS DECIMAL(38,0)) * y")).as("s2y"))
      // centered normal equations: A11 b1 + A12 b2 = c1; A12 b1 + A22
      // b2 = c2 with Aij = n*sij - si*sj, ci = n*siy - si*sy
      .selectExpr("n", "s1", "s2", "sy",
        "n * s11 - s1 * s1 AS a11", "n * s12 - s1 * s2 AS a12",
        "n * s22 - s2 * s2 AS a22",
        "n * s1y - s1 * sy AS c1", "n * s2y - s2 * sy AS c2")
      .selectExpr("n", "s1", "s2",
        "a11 * a22 - a12 * a12 AS det",
        "c1 * a22 - c2 * a12 AS b1n", // b1 = b1n / det
        "c2 * a11 - c1 * a12 AS b2n")
      // slopes land on a milli grid BEFORE the row pass: the raw
      // |b_n * (n*x - s)| cross-mult would cross 1e40 at sf0.1.
      // b_n/det is signed -> the sign-safe div pattern
      .selectExpr("n", "s1", "s2",
        "CASE WHEN b1n < 0 THEN -CAST((-b1n) * 1000 div abs(det)" +
          " AS BIGINT) ELSE CAST(b1n * 1000 div abs(det) AS BIGINT) END" +
          " * (CASE WHEN det < 0 THEN -1 ELSE 1 END) AS b1_milli",
        "CASE WHEN b2n < 0 THEN -CAST((-b2n) * 1000 div abs(det)" +
          " AS BIGINT) ELSE CAST(b2n * 1000 div abs(det) AS BIGINT) END" +
          " * (CASE WHEN det < 0 THEN -1 ELSE 1 END) AS b2_milli")
    // phi_j(row) = b_j*(x_j - mean_j); |phi| sums ride cross-mults:
    // |b1_milli/1000 * (x1 - s1/n)| = |b1_milli * (n*x1 - s1)|/(1000n)
    rows.crossJoin(broadcast(m))
      .groupBy("flag")
      .agg(count(lit(1)).as("rows_n"),
        sum(expr("abs(b1_milli * (CAST(x1 AS DECIMAL(38,0)) * n - s1))"))
          .as("p1"),
        sum(expr("abs(b2_milli * (CAST(x2 AS DECIMAL(38,0)) * n - s2))"))
          .as("p2"),
        max(col("n")).as("n"), max(col("b1_milli")).as("b1_milli"),
        max(col("b2_milli")).as("b2_milli"))
      .selectExpr("flag", "rows_n", "b1_milli", "b2_milli",
        "CAST(p1 div (1000 * CAST(n AS DECIMAL(38,0))) div rows_n" +
          " AS BIGINT) AS mean_abs_phi_qty_c",
        "CAST(p2 div (1000 * CAST(n AS DECIMAL(38,0))) div rows_n" +
          " AS BIGINT) AS mean_abs_phi_disc_c")
      .orderBy("flag")
  }

  private val q395Oracle: String =
    """WITH rows0 AS (SELECT l_returnflag AS flag,
      |    CAST(l_quantity AS BIGINT) AS x1,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |mom AS (SELECT count(*) AS n,
      |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    sum(CAST(x1 AS HUGEINT) * x1) AS s11,
      |    sum(CAST(x1 AS HUGEINT) * x2) AS s12,
      |    sum(CAST(x2 AS HUGEINT) * x2) AS s22,
      |    sum(CAST(x1 AS HUGEINT) * y) AS s1y,
      |    sum(CAST(x2 AS HUGEINT) * y) AS s2y
      |  FROM rows0),
      |nm AS (SELECT n, s1, s2,
      |    n * s11 - s1 * s1 AS a11, n * s12 - s1 * s2 AS a12,
      |    n * s22 - s2 * s2 AS a22,
      |    n * s1y - s1 * sy AS c1, n * s2y - s2 * sy AS c2
      |  FROM mom),
      |fit0 AS (SELECT n, s1, s2,
      |    a11 * a22 - a12 * a12 AS det,
      |    c1 * a22 - c2 * a12 AS b1n,
      |    c2 * a11 - c1 * a12 AS b2n
      |  FROM nm),
      |fit AS (SELECT n, s1, s2,
      |    (CASE WHEN b1n < 0 THEN -CAST((-b1n) * 1000 // abs(det)
      |      AS BIGINT) ELSE CAST(b1n * 1000 // abs(det) AS BIGINT) END)
      |      * (CASE WHEN det < 0 THEN -1 ELSE 1 END) AS b1_milli,
      |    (CASE WHEN b2n < 0 THEN -CAST((-b2n) * 1000 // abs(det)
      |      AS BIGINT) ELSE CAST(b2n * 1000 // abs(det) AS BIGINT) END)
      |      * (CASE WHEN det < 0 THEN -1 ELSE 1 END) AS b2_milli
      |  FROM fit0)
      |SELECT flag, count(*) AS rows_n,
      |  CAST(max(b1_milli) AS BIGINT) AS b1_milli,
      |  CAST(max(b2_milli) AS BIGINT) AS b2_milli,
      |  CAST(sum(abs(b1_milli * (CAST(x1 AS HUGEINT) * n - s1)))
      |    // (1000 * CAST(max(n) AS HUGEINT)) // count(*) AS BIGINT)
      |    AS mean_abs_phi_qty_c,
      |  CAST(sum(abs(b2_milli * (CAST(x2 AS HUGEINT) * n - s2)))
      |    // (1000 * CAST(max(n) AS HUGEINT)) // count(*) AS BIGINT)
      |    AS mean_abs_phi_disc_c
      |FROM rows0, fit GROUP BY flag ORDER BY flag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q394_isolation_forest", q394, Some(q394Oracle)),
    QueryDef("q395_linear_shap", q395, Some(q395Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 third wave: categorical association (Cramér's V),
  * weight-of-evidence / information-value feature scoring,
  * Jensen-Shannon distribution divergence, and exact average
  * precision (PR-AUC) — the feature-evaluation statistics a training
  * pipeline runs before a model ever sees the data.
  */
object Round12cQueries {

  private val dec = DecimalType(38, 0)

  // -- q245: Cramér's V categorical association --------------------------------
  // "Are these two categorical features redundant?" — the χ²-based
  // association strength between order priority and order status,
  // each cell's χ² contribution (o − rc/n)²/(rc/n) is algebraically
  // (o·n − r·c)²/(r·c·n): the numerator root and the denominator are
  // EXACT DECIMAL/HUGEINT integers, each cast to double once, and
  // the squared ratio floors onto the 1e-6 grid (the q137 class —
  // identical arithmetic sequence on identical exact integers in
  // both engines; squaring in the integer domain would cap n at
  // ~1e8 rows under DECIMAL(38), so the square happens in double).
  // The contingency table is one map-side-combining census;
  // the dense cell spine (distinct rows × distinct cols, broadcast)
  // keeps zero cells contributing their rc²/(rcn) = rc/n mass.
  private def q245(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority").as("a"), col("o_orderstatus").as("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // spine + margins + contributions
    val rowM = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val colM = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    val spine = rowM.crossJoin(broadcast(colM))
    val contrib = spine
      .join(broadcast(cells), Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("n_obs"),
        col("r"), col("c"), col("n"), col("nr"), col("nc"))
      .withColumn("__dd",
        (col("n_obs").cast(dec) * col("n") - col("r").cast(dec) * col("c"))
          .cast(DoubleType))
      .withColumn("contrib_u",
        floor(col("__dd") * col("__dd") /
          (col("r").cast(dec) * col("c") * col("n")).cast(DoubleType) *
          lit(1e6) + lit(0.5)).cast(LongType))
      .localCheckpoint(true)
    val chi = contrib.agg(sum(col("contrib_u")).as("chi2_u"),
      max(col("n")).as("__n"),
      max(least(col("nr"), col("nc")) - 1).as("__m"))
      .select(col("chi2_u"),
        Norm.n4(sqrt(col("chi2_u").cast(DoubleType) / lit(1e6) /
          (col("__n") * col("__m")).cast(DoubleType))).as("cramers_v_n4"))
    contrib.select(col("a"), col("b"), col("n_obs"), col("contrib_u"))
      .crossJoin(broadcast(chi))
      .orderBy("a", "b")
  }

  private val q245Oracle: String =
    s"""WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
       |    count(*) AS o
       |  FROM orders GROUP BY 1, 2),
       |rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       |cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
       |    count(DISTINCT a) AS nr, count(DISTINCT b) AS nc FROM cells),
       |contrib AS (SELECT rm.a, cm.b,
       |    CAST(coalesce(o, 0) AS BIGINT) AS n_obs, r, c, n, nr, nc,
       |    CAST(floor(
       |      CAST(CAST(coalesce(o, 0) AS HUGEINT) * n
       |        - CAST(r AS HUGEINT) * c AS DOUBLE)
       |      * CAST(CAST(coalesce(o, 0) AS HUGEINT) * n
       |        - CAST(r AS HUGEINT) * c AS DOUBLE)
       |      / CAST(CAST(r AS HUGEINT) * c * n AS DOUBLE)
       |      * 1e6 + 0.5) AS BIGINT) AS contrib_u
       |  FROM rm CROSS JOIN cm
       |  LEFT JOIN cells ON cells.a = rm.a AND cells.b = cm.b
       |  CROSS JOIN t),
       |x AS (SELECT CAST(sum(contrib_u) AS BIGINT) AS chi2_u,
       |    ${graft.etl.OracleSql.n4(
      "sqrt(CAST(sum(contrib_u) AS DOUBLE) / 1e6 / " +
        "CAST(CAST(any_value(n) AS HUGEINT) " +
        "* (least(any_value(nr), any_value(nc)) - 1) AS DOUBLE))")}
       |      AS cramers_v_n4
       |  FROM contrib)
       |SELECT a, b, n_obs, contrib_u, chi2_u, cramers_v_n4
       |FROM contrib CROSS JOIN x
       |ORDER BY a, b""".stripMargin

  // -- q246: weight-of-evidence / information value ----------------------------
  // The credit-scoring-grade feature audit ("how predictive is price
  // of a return?"): quartile-bin the value, per bin compute
  // WOE = ln(p_good/p_bad) and the IV term (p_g − p_b)·WOE. Bin
  // edges are EXACT LOWER ORDER STATISTICS at ranks (n·q) div 4 —
  // picked by integer rank comparison from the bucketed census
  // prefix (q228's rank-pick; both engines mirror the pick, so the
  // edges are engine-identical without any interpolation or sketch).
  // The single ln per bin runs over a ratio of exact BIGINTs and is
  // floor-gridded to 1e-6 (the q116 discipline); the IV terms
  // multiply that gridded integer by an exact-rational double and
  // land on the grid again, so the sum is an integer sum. Zero
  // counts are clamped to 1 (the standard WOE floor), stated in
  // both engines.
  private val WoeBins = 4

  private def q246(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .select(floor(col("l_extendedprice")).cast(LongType).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
      .groupBy("v")
      .agg(count(lit(1)).as("cnt"), sum(col("bad")).as("nb"))
      .localCheckpoint(true) // cuts pass + bin census
    val fracs = (1 until 32).map(_.toDouble / 32)
    val cuts = census.agg(percentile_approx(col("v"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"),
      sum(col("cnt")).as("__n"))
    val bucketed = census.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until 32).foldLeft(lit(1)) { case (acc, i) =>
        acc + when(col("v") > element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("__bkt").agg(sum(col("cnt")).as("__bs"))
      .withColumn("__carry",
        coalesce(sum(col("__bs")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed.join(broadcast(carries), "__bkt")
      .withColumn("__cum0",
        col("__carry") + coalesce(sum(col("cnt")).over(w), lit(0L)))
    // the 3 quartile edges, by rank-interval membership
    val edgeCols = (1 until WoeBins).map { q =>
      max(when(expr(s"__n * $q div $WoeBins") >= col("__cum0") &&
        expr(s"__n * $q div $WoeBins") < col("__cum0") + col("cnt"),
        col("v"))).as(s"e$q")
    }
    val edges = ranked.agg(edgeCols.head, edgeCols.tail: _*)
    val binned = census.crossJoin(broadcast(edges))
      .withColumn("bin", (1 until WoeBins).foldLeft(lit(1)) {
        case (acc, q) =>
          acc + when(col("v") > col(s"e$q"), 1).otherwise(0)
      })
      .groupBy("bin")
      .agg(sum(col("cnt") - col("nb")).as("ng"), sum(col("nb")).as("nb"))
    val totals = binned.agg(sum(col("ng")).as("gt"), sum(col("nb")).as("bt"))
    val terms = binned.crossJoin(broadcast(totals))
      .withColumn("woe_u",
        floor(log((greatest(col("ng"), lit(1L)).cast(dec) * col("bt"))
            .cast(DoubleType) /
          (greatest(col("nb"), lit(1L)).cast(dec) * col("gt"))
            .cast(DoubleType)) * lit(1e6) + lit(0.5))
          .cast(LongType))
      .withColumn("iv_term_u",
        floor((col("ng").cast(dec) * col("bt") -
            col("nb").cast(dec) * col("gt")).cast(DoubleType) /
          (col("gt").cast(dec) * col("bt")).cast(DoubleType) *
          col("woe_u").cast(DoubleType) + lit(0.5)).cast(LongType))
      .localCheckpoint(true) // 4-row frame: rows + the IV rollup
    val iv = terms.agg(sum(col("iv_term_u")).as("iv_u"))
    terms.crossJoin(broadcast(iv))
      .select(col("bin"), col("ng"), col("nb"), col("woe_u"),
        col("iv_term_u"), col("iv_u"))
      .orderBy("bin")
  }

  private val q246Oracle: String =
    s"""WITH census AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS v,
       |    count(*) AS cnt,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb
       |  FROM lineitem GROUP BY 1),
       |ranked AS (SELECT v, cnt, nb,
       |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum0,
       |    CAST(sum(cnt) OVER () AS BIGINT) AS n
       |  FROM census),
       |edges AS (SELECT ${(1 until WoeBins).map(q =>
      s"max(CASE WHEN n * $q // $WoeBins >= cum0 AND n * $q // $WoeBins " +
        s"< cum0 + cnt THEN v END) AS e$q").mkString(", ")}
       |  FROM ranked),
       |binned AS (SELECT 1 ${(1 until WoeBins).map(q =>
      s"+ (CASE WHEN v > e$q THEN 1 ELSE 0 END)").mkString(" ")} AS bin,
       |    CAST(sum(cnt - nb) AS BIGINT) AS ng, CAST(sum(nb) AS BIGINT) AS nb
       |  FROM census CROSS JOIN edges GROUP BY 1),
       |t AS (SELECT CAST(sum(ng) AS BIGINT) AS gt,
       |    CAST(sum(nb) AS BIGINT) AS bt FROM binned),
       |woe AS (SELECT bin, ng, nb,
       |    CAST(floor(ln(CAST(CAST(greatest(ng, 1) AS HUGEINT) * bt
       |        AS DOUBLE)
       |      / CAST(CAST(greatest(nb, 1) AS HUGEINT) * gt AS DOUBLE))
       |      * 1e6 + 0.5) AS BIGINT) AS woe_u,
       |    gt, bt
       |  FROM binned CROSS JOIN t),
       |terms AS (SELECT bin, ng, nb, woe_u,
       |    CAST(floor(CAST(CAST(ng AS HUGEINT) * bt
       |        - CAST(nb AS HUGEINT) * gt AS DOUBLE)
       |      / CAST(CAST(gt AS HUGEINT) * bt AS DOUBLE)
       |      * CAST(woe_u AS DOUBLE) + 0.5) AS BIGINT) AS iv_term_u
       |  FROM woe)
       |SELECT bin, ng, nb, woe_u, iv_term_u,
       |  CAST(sum(iv_term_u) OVER () AS BIGINT) AS iv_u
       |FROM terms ORDER BY bin""".stripMargin

  // -- q247: Jensen-Shannon divergence -----------------------------------------
  // The bounded, symmetric distribution-drift metric PSI (q141) and
  // KS (q122) don't give: JSD between the 1996 and 1997 day-of-week
  // revenue distributions. Day-of-week is epoch-day mod 7 (pure
  // integer — Spark's and DuckDB's dayofweek() disagree on the week
  // origin, so neither is used). Each KL term p·ln(p/m) reduces to
  // exact-integer ratios — p/m = 2aB/(aB + bA) with HUGEINT/DECIMAL
  // products cast to double once — and floors onto the 1e-9 grid, so
  // the sum is an integer sum (q116/q137 discipline); zero-mass
  // cells contribute 0 by definition.
  private def q247(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "orders")
      .select(year(to_date(col("o_orderdate"))).as("yr"),
        (unix_date(to_date(col("o_orderdate"))) % 7).cast(LongType)
          .as("dow"),
        floor(col("o_totalprice")).cast(LongType).as("r"))
      .where(col("yr").isin(1996, 1997))
    val m = base.groupBy("dow")
      .agg(sum(when(col("yr") === 1996, col("r")).otherwise(0L)).as("a"),
        sum(when(col("yr") === 1997, col("r")).otherwise(0L)).as("b"))
      .localCheckpoint(true)
    val tots = m.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val terms = m.crossJoin(broadcast(tots))
      .withColumn("__ab", col("a").cast(dec) * col("tb"))
      .withColumn("__ba", col("b").cast(dec) * col("ta"))
      .withColumn("tp_u", when(col("a") === 0, 0L).otherwise(
        floor(col("a").cast(DoubleType) / col("ta").cast(DoubleType) *
          log((lit(2).cast(dec) * col("__ab")).cast(DoubleType) /
            (col("__ab") + col("__ba")).cast(DoubleType)) * lit(1e9) +
          lit(0.5)).cast(LongType)))
      .withColumn("tq_u", when(col("b") === 0, 0L).otherwise(
        floor(col("b").cast(DoubleType) / col("tb").cast(DoubleType) *
          log((lit(2).cast(dec) * col("__ba")).cast(DoubleType) /
            (col("__ab") + col("__ba")).cast(DoubleType)) * lit(1e9) +
          lit(0.5)).cast(LongType)))
      .localCheckpoint(true)
    // 2·JSD ≥ 0 analytically; the per-term half-up rounding can leave
    // the integer sum a hair negative, so clamp BEFORE halving (the
    // oracle mirrors), keeping the div exact on both engines
    val jsd = terms.agg(
      expr("greatest(sum(tp_u) + sum(tq_u), 0L) div 2").as("jsd_nano"))
    terms.select(col("dow"), col("a"), col("b"), col("tp_u"), col("tq_u"))
      .crossJoin(broadcast(jsd))
      .orderBy("dow")
  }

  private val q247Oracle: String =
    """WITH base AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
      |      AS dow,
      |    CAST(floor(o_totalprice) AS BIGINT) AS r
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
      |m AS (SELECT dow,
      |    CAST(sum(CASE WHEN yr = 1996 THEN r ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN yr = 1997 THEN r ELSE 0 END) AS BIGINT) AS b
      |  FROM base GROUP BY 1),
      |t AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
      |    CAST(sum(b) AS BIGINT) AS tb FROM m),
      |terms AS (SELECT dow, a, b,
      |    CASE WHEN a = 0 THEN 0 ELSE
      |      CAST(floor(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)
      |        * ln(CAST(2 * (CAST(a AS HUGEINT) * tb) AS DOUBLE)
      |          / CAST(CAST(a AS HUGEINT) * tb + CAST(b AS HUGEINT) * ta
      |            AS DOUBLE))
      |        * 1e9 + 0.5) AS BIGINT) END AS tp_u,
      |    CASE WHEN b = 0 THEN 0 ELSE
      |      CAST(floor(CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)
      |        * ln(CAST(2 * (CAST(b AS HUGEINT) * ta) AS DOUBLE)
      |          / CAST(CAST(a AS HUGEINT) * tb + CAST(b AS HUGEINT) * ta
      |            AS DOUBLE))
      |        * 1e9 + 0.5) AS BIGINT) END AS tq_u
      |  FROM m CROSS JOIN t),
      |j AS (SELECT CAST(greatest(sum(tp_u) + sum(tq_u), 0) // 2 AS BIGINT)
      |    AS jsd_nano FROM terms)
      |SELECT dow, a, b, tp_u, tq_u, jsd_nano
      |FROM terms CROSS JOIN j
      |ORDER BY dow""".stripMargin

  // -- q248: exact average precision (PR-AUC) ----------------------------------
  // The ranking-quality twin of q112's AUC, preferred under class
  // imbalance: grade "order value ranks returns" by exact average
  // precision. AP = (1/P)·Σ_{positives} prec@k, where k is the
  // positive's global rank by (score desc, key) and prec@k = j/k
  // with j = its rank among positives — BOTH ranks from the bucketed
  // global-rank machinery (never a single-partition window), so the
  // whole statistic is pure integer: each term is j·10⁶ div k, the
  // AP is the floored mean of the terms. The random-ranker baseline
  // (prevalence) rides along.
  private def q248(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.LayoutOps
    val returned = Tables.read(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
    val scored = Tables.read(spark, sfDir, "orders")
      .join(returned.withColumn("__pos", lit(1L)),
        col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey").as("id"),
        (-floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType))
          .as("neg_score"),
        coalesce(col("__pos"), lit(0L)).as("pos"))
    val ranked = LayoutOps.globalRank(scored, "neg_score", "id")
      .withColumnRenamed("rank", "k")
      .localCheckpoint(true) // totals + the positive-side re-rank
    val tot = ranked.agg(count(lit(1)).as("n_total"),
      sum(col("pos")).as("n_pos"))
    val posRanked = LayoutOps.globalRank(ranked.where(col("pos") === 1L),
      "k", "id")
    val ap = posRanked
      .select(expr("rank * 1000000 div k").as("term_u"))
      .agg(sum(col("term_u")).as("__s"), count(lit(1)).as("__p"))
      .select(expr("__s div __p").as("ap_ppm"))
    tot.crossJoin(broadcast(ap))
      .select(col("n_total"), col("n_pos"), col("ap_ppm"),
        expr("n_pos * 1000000 div n_total").as("prevalence_ppm"))
  }

  private val q248Oracle: String =
    """WITH pos AS (SELECT DISTINCT l_orderkey FROM lineitem
      |  WHERE l_returnflag = 'R'),
      |scored AS (SELECT o_orderkey AS id,
      |    -CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS neg_score,
      |    CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END AS p
      |  FROM orders LEFT JOIN pos ON o_orderkey = l_orderkey),
      |ranked AS (SELECT id, p,
      |    row_number() OVER (ORDER BY neg_score, id) AS k
      |  FROM scored),
      |pr AS (SELECT k,
      |    row_number() OVER (ORDER BY k) AS j
      |  FROM ranked WHERE p = 1),
      |ap AS (SELECT CAST(sum(j * 1000000 // k) // count(*) AS BIGINT)
      |    AS ap_ppm FROM pr),
      |t AS (SELECT count(*) AS n_total, CAST(sum(p) AS BIGINT) AS n_pos
      |  FROM ranked)
      |SELECT n_total, n_pos, ap_ppm,
      |  CAST(n_pos * 1000000 // n_total AS BIGINT) AS prevalence_ppm
      |FROM t CROSS JOIN ap""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q245_cramers_v", q245, Some(q245Oracle)),
    QueryDef("q246_woe_iv", q246, Some(q246Oracle)),
    QueryDef("q247_js_divergence", q247, Some(q247Oracle)),
    QueryDef("q248_pr_auc", q248, Some(q248Oracle)))
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.ops._

/** Round-12 fourteenth wave: dimensionality reduction with a
  * distortion audit (Johnson–Lindenstrauss ±1 projection, q293), the
  * statistically-sound collocation test the PMI miner (q116) lacks
  * (Dunning's G² log-likelihood ratio, q294), the wide→long reshape
  * surface (unpivot/melt, q295), and forecast backtesting
  * (seasonal-naive MASE, q296). Same discipline as every wave:
  * integer grids end to end, DECIMAL(38,0) where a BIGINT could wrap
  * at 100 TB, logs gridded per-term BEFORE summation, and every
  * fan-out either broadcast or calendar-bounded.
  */
object Round12nQueries {

  private val dec = DecimalType(38, 0)

  // -- q293: JL projection + distortion audit ----------------------------------
  // Project the 64-dim embeddings to 8 dims with a ±1 sign matrix
  // drawn from the two-round Lehmer hash (data-independent, seeded,
  // identical integer formula on both engines), then AUDIT the
  // JL promise on the deterministic neighbor-pair set
  // (vec_id, vec_id+1): ratio = ||p_a - p_b||² / (k/d · scale) against
  // E[ratio] = 1, censused into 0.1-wide buckets on a dense 0..19
  // spine. Everything is exact integer arithmetic on the 1e-4
  // component grid (the StaticInvoke kernels keep it codegen'd and
  // allocation-free); the pair join is a +1-key equi join — linear,
  // no fan-out. At 100 TB this is the cheap pre-filter that lets ANN
  // candidate generation run on 8 longs instead of 64 floats.
  private val JlDims = 8
  private val JlSeed = 17L

  private def q293(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        SimilarityOps.jlProject(col("v"), JlDims, JlSeed).as("p"))
    val b = emb.select(col("vec_id").as("vb"), col("v").as("v2"),
      col("p").as("p2"))
    val ratios = emb
      .join(b, col("vb") === col("vec_id") + 1)
      .select(SimilarityOps.gridSqDist(col("v"), col("v2")).as("origd"),
        SimilarityOps.sqDistLong(col("p"), col("p2")).as("projd"))
      .where(col("origd") > 0) // identical neighbors carry no signal
      // E[projd] = JlDims · origd (±1 signs are unscaled), so
      // ratio_ppm ≈ 1e6; DECIMAL numerator — projd·1e6 nears the
      // BIGINT edge already at 64 dims
      .select((col("projd").cast(dec) * 1000000).as("pn"),
        (col("origd") * JlDims).as("od"))
      .select(least(expr("(pn div od) div 100000"), lit(19L))
        .as("bucket"))
    val census = ratios.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
    spark.range(0, 20).select(col("id").as("bucket"))
      .join(census, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  private val q293Oracle: String = {
    val proj = SimilarityOps.jlProjectSql("embedding", JlDims, JlSeed)
    s"""WITH e AS (SELECT vec_id, embedding, $proj AS p FROM embeddings),
       |pr AS (SELECT
       |    ${SimilarityOps.gridSqDistSql("a.embedding", "b.embedding")}
       |      AS origd,
       |    ${SimilarityOps.sqDistLongSql("a.p", "b.p")} AS projd
       |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
       |ratios AS (SELECT least((CAST(projd AS HUGEINT) * 1000000
       |      // (origd * $JlDims)) // 100000, 19) AS bucket
       |  FROM pr WHERE origd > 0),
       |census AS (SELECT bucket, count(*) AS n FROM ratios GROUP BY 1),
       |spine AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(0, 20))
       |SELECT s.bucket, CAST(coalesce(n, 0) AS BIGINT) AS n_pairs
       |FROM spine s LEFT JOIN census USING (bucket)
       |ORDER BY s.bucket""".stripMargin
  }

  // -- q294: Dunning G² collocations -------------------------------------------
  // The log-likelihood-ratio collocation test — the statistically
  // sound ranking PMI (q116) lacks (PMI is biased toward rare pairs;
  // G² weighs evidence mass). 2×2 contingency per bigram from the
  // bigram census and its first/second-position marginals:
  // G² = 2·Σ O·ln(O·N / (row·col)) over the four cells (empty cells
  // contribute 0). Each of the four ln terms lands on the 1e-6 grid
  // BEFORE the sum (the q116/q137 ulp lesson: >2^53 products round
  // differently per engine), so the final score is an exact integer
  // and the top-20 ranking is deterministic with (w1, w2) tiebreaks.
  // Scale shape: token/bigram censuses are the only fact shuffles;
  // marginal joins are token-keyed; the result is a 20-row TakeOrdered.
  private val LlrMinCount = 5L
  private val LlrK = 20

  private def q294(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = Tables.read(spark, sfDir, "documents")
      // two-step projection: ngramsOf over a PRE-BOUND token column —
      // inlining tokens(text) re-splits the string inside every slice
      // lambda step (O(tokens²) splits per doc, the TextOps.ngramsOf
      // contract; measured 4x on this query)
      .select(TextOps.tokens(col("text")).as("__toks"))
      .select(explode(TextOps.ngramsOf(col("__toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      // NO checkpoint: N, both marginals, and the main scan all sit in
      // ONE final plan, so Catalyst's ReusedExchange computes the
      // census shuffle once — an eager localCheckpoint here
      // materialized the (large) census a second time and measured 4x
      // slower at 10x corpus scale
    val n = bg.agg(sum(col("c12")).as("nb"))
    val m1 = bg.groupBy(col("w1").as("m1w"))
      .agg(sum(col("c12")).as("r1"))
    val m2 = bg.groupBy(col("w2").as("m2w"))
      .agg(sum(col("c12")).as("c1"))
    def term(o: Column, row: Column, colm: Column, nb: Column): Column =
      when(o > 0,
        floor(o.cast("double") *
          log(o.cast("double") * nb.cast("double") /
            (row.cast("double") * colm.cast("double"))) *
          lit(1000000.0) + lit(0.5)).cast(LongType))
        .otherwise(0L)
    bg.where(col("c12") >= LlrMinCount)
      .join(m1, col("w1") === col("m1w"))
      .join(m2, col("w2") === col("m2w"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        ((term(col("c12"), col("r1"), col("c1"), col("nb")) +
          term(col("r1") - col("c12"), col("r1"),
            col("nb") - col("c1"), col("nb")) +
          term(col("c1") - col("c12"), col("nb") - col("r1"),
            col("c1"), col("nb")) +
          term(col("nb") - col("r1") - col("c1") + col("c12"),
            col("nb") - col("r1"), col("nb") - col("c1"), col("nb"))) *
          2).as("g2_u"))
      .orderBy(col("g2_u").desc, col("w1"), col("w2"))
      .limit(LlrK)
  }

  private val q294Oracle: String = {
    def t(o: String, row: String, colm: String): String =
      s"""CASE WHEN $o > 0 THEN CAST(floor(CAST($o AS DOUBLE)
         | * ln(CAST($o AS DOUBLE) * CAST(nb AS DOUBLE)
         |   / (CAST($row AS DOUBLE) * CAST($colm AS DOUBLE)))
         | * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END""".stripMargin
        .replace("\n", " ")
    s"""WITH bg AS (SELECT bg, count(*) AS c12,
       |    split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
       |  FROM (SELECT unnest(${TextOps.ngramsSql("text", 2)}) AS bg
       |        FROM documents)
       |  GROUP BY 1),
       |n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM bg),
       |m1 AS (SELECT w1 AS m1w, CAST(sum(c12) AS BIGINT) AS r1
       |  FROM bg GROUP BY 1),
       |m2 AS (SELECT w2 AS m2w, CAST(sum(c12) AS BIGINT) AS c1
       |  FROM bg GROUP BY 1)
       |SELECT w1, w2, c12,
       |  (${t("c12", "r1", "c1")}
       |   + ${t("(r1 - c12)", "r1", "(nb - c1)")}
       |   + ${t("(c1 - c12)", "(nb - r1)", "c1")}
       |   + ${t("(nb - r1 - c1 + c12)", "(nb - r1)", "(nb - c1)")}) * 2
       |    AS g2_u
       |FROM bg JOIN m1 ON w1 = m1w JOIN m2 ON w2 = m2w, n
       |WHERE c12 >= $LlrMinCount
       |ORDER BY g2_u DESC, w1, w2 LIMIT $LlrK""".stripMargin
  }

  // -- q295: unpivot / melt (wide → long reshape) -------------------------------
  // The reshape surface: one pass computes per-column profile stats
  // over lineitem's four measures, then `stack` unpivots the wide
  // one-row frame into (column, sum_u, min_u, max_u) long format —
  // Spark's unpivot primitive against DuckDB's UNION ALL rendering.
  // All values land on the 1e-4 grid; the whole reshape rides ONE
  // map-side-combined aggregate (the transpose itself is free — it
  // happens on a one-row frame).
  private val MeltCols = Seq("l_quantity", "l_extendedprice",
    "l_discount", "l_tax")

  private def q295(spark: SparkSession, sfDir: String): DataFrame = {
    def u(c: String) = floor(col(c) * 10000 + lit(0.5)).cast(LongType)
    val aggs = MeltCols.flatMap { c =>
      Seq(sum(u(c).cast(dec)).cast(LongType).as(s"__s_$c"),
        min(u(c)).as(s"__mn_$c"), max(u(c)).as(s"__mx_$c"))
    }
    val wide = Tables.read(spark, sfDir, "lineitem")
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = MeltCols
      .map(c => s"'$c', __s_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.select(expr(s"stack(${MeltCols.length}, $stackArgs) " +
        "AS (column_name, sum_u, min_u, max_u)"))
      .orderBy(col("column_name"))
  }

  private val q295Oracle: String = {
    def u(c: String) = s"CAST(floor($c * 10000 + 0.5) AS BIGINT)"
    val wide = MeltCols.map { c =>
      s"CAST(sum(${u(c)}) AS BIGINT) AS s_$c, " +
        s"min(${u(c)}) AS mn_$c, max(${u(c)}) AS mx_$c"
    }.mkString(", ")
    val arms = MeltCols.map { c =>
      s"SELECT '$c' AS column_name, s_$c AS sum_u, mn_$c AS min_u, " +
        s"mx_$c AS max_u FROM wide"
    }.mkString(" UNION ALL ")
    s"""WITH wide AS (SELECT $wide FROM lineitem)
       |$arms
       |ORDER BY column_name""".stripMargin
  }

  // -- q296: seasonal-naive forecast backtest (MASE) ----------------------------
  // Backtest the zero-parameter seasonal-naive forecast x̂_t = x_{t-7}
  // on daily revenue, scored by MASE (MAE of the model over MAE of
  // the 1-day naive walk — the standard scale-free forecast metric).
  // Both error series come from +k-key equi self-joins on the
  // calendar-bounded day census (the only fact shuffle); the MASE
  // ratio is a DECIMAL cross-multiplication (mean-vs-mean, so
  // n-weights swap sides and everything stays integer); per-dow error
  // rows localize WHERE the weekly forecast fails.
  private def q296(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .groupBy(datediff(to_date(col("l_shipdate")),
          lit("1995-01-01").cast("date")).cast(LongType).as("t"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
          .cast(LongType).cast(dec))
        .cast(LongType).as("x"))
      .localCheckpoint(true) // three self-referencing reads
    def errs(k: Int): DataFrame = census
      .join(broadcast(census.select((col("t") + k).as("tk"),
          col("x").as("xp"))),
        col("t") === col("tk"))
      .select(col("t"), abs(col("x") - col("xp")).as("e"))
    val e7 = errs(7)
    val glob = e7.agg(sum(col("e").cast(dec)).as("s7"),
        count(lit(1)).as("n7"))
      .crossJoin(broadcast(errs(1)
        .agg(sum(col("e").cast(dec)).as("s1"), count(lit(1)).as("n1"))))
      .select(expr("(s7 * n1 * 1000000) div (s1 * n7)").as("mase_ppm"))
    e7.groupBy((col("t") % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("e").cast(dec)).cast(LongType).as("sum_abs_e7"))
      .crossJoin(broadcast(glob))
      .orderBy(col("dow"))
  }

  private val q296Oracle: String =
    """WITH census AS (SELECT
      |    CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS t,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1),
      |e7 AS (SELECT a.t, abs(a.x - b.x) AS e
      |  FROM census a JOIN census b ON a.t = b.t + 7),
      |e1 AS (SELECT abs(a.x - b.x) AS e
      |  FROM census a JOIN census b ON a.t = b.t + 1),
      |gmase AS (SELECT CAST(
      |    (SELECT CAST(sum(e) AS HUGEINT) FROM e7)
      |      * (SELECT count(*) FROM e1) * 1000000
      |    // ((SELECT CAST(sum(e) AS HUGEINT) FROM e1)
      |      * (SELECT count(*) FROM e7)) AS BIGINT) AS mase_ppm)
      |SELECT t % 7 AS dow, count(*) AS n_days,
      |  CAST(sum(e) AS BIGINT) AS sum_abs_e7, mase_ppm
      |FROM e7, gmase GROUP BY 1, mase_ppm ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q293_jl_distortion", q293, Some(q293Oracle)),
    QueryDef("q294_llr_collocations", q294, Some(q294Oracle)),
    QueryDef("q295_unpivot_profile", q295, Some(q295Oracle)),
    QueryDef("q296_mase_backtest", q296, Some(q296Oracle)))
}

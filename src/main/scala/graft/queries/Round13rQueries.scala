package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 eighteenth wave: the pairwise mutual-information matrix
  * (q374 — feature-dependence screening from ONE joint census), the
  * character-entropy compressibility census (q375 — the order-0 bound
  * quality filters use to spot binary junk), and a multi-level
  * hierarchy rollup (q376 — BOM/category aggregation via arithmetic
  * ancestor explosion, self-auditing level totals).
  */
object Round13rQueries {

  // -- q374: pairwise mutual-information matrix -------------------------------------------
  // Feature-dependence screening over four categorical views of
  // lineitem (returnflag, linestatus, ship year, quantity decile):
  // ONE scan builds the full joint census (≤ a few hundred cells);
  // every pairwise MI marginalizes that tiny frame, with each cell's
  // ln(c·N/(n_x·n_y)) gridded to micro-nats BEFORE summation (the
  // q214 discipline — a gridded float is a defined value). Output in
  // micro-nats per observation.
  private val MiVars = Seq("f", "s", "y", "qb")

  private def q374(spark: SparkSession, sfDir: String): DataFrame = {
    // Round 17 rework (same answer, ~5 exchanges instead of 31): the
    // old form ran 3 aggregations + 2 broadcast builds PER PAIR over
    // the checkpointed census (19 passes, 13 broadcasts). Instead the
    // census fans out 6× by a LITERAL pair list (pure map-side
    // Generate), ONE aggregation builds every pair's joint census, and
    // the marginals/total ride pair-keyed windows over that tiny frame
    // — no checkpoint, no per-pair plans. Key values are cast to
    // STRING for the shared x/yv columns (injective per variable, and
    // each pair groups only within itself, so grouping is unchanged);
    // counts stay BIGINT and the micro-nat grid expression is
    // byte-identical, so every output value is bit-equal to the old
    // form's (oracle re-verified at all three SFs).
    val cells = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_linestatus").as("s"),
        expr("CAST(year(l_shipdate) AS BIGINT)").as("y"),
        expr("CAST(l_quantity AS BIGINT) div 10").as("qb"))
      .groupBy("f", "s", "y", "qb").agg(count(lit(1)).as("c"))
    val pairs = for {
      i <- MiVars.indices; j <- (i + 1) until MiVars.size
    } yield (MiVars(i), MiVars(j))
    val pairLits = array(pairs.map { case (a, b) =>
      struct(lit(a).as("pa"), lit(b).as("pb")) }: _*)
    def keyOf(v: Column): Column = MiVars.foldLeft(lit(null).cast("string")) {
      case (acc, name) => when(v === name, col(name).cast("string"))
        .otherwise(acc)
    }
    val fanned = cells.select(col("f"), col("s"), col("y"), col("qb"),
        col("c"), explode(pairLits).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"),
        keyOf(col("p.pa")).as("x"), keyOf(col("p.pb")).as("yv"), col("c"))
    val joint = fanned.groupBy("pa", "pb", "x", "yv")
      .agg(sum(col("c")).as("cxy"))
    val wx = Window.partitionBy("pa", "pb", "x")
    val wy = Window.partitionBy("pa", "pb", "yv")
    val wn = Window.partitionBy("pa", "pb")
    joint
      .withColumn("cx", sum(col("cxy")).over(wx))
      .withColumn("cy", sum(col("cxy")).over(wy))
      .withColumn("nn", sum(col("cxy")).over(wn))
      .select(col("pa"), col("pb"), col("nn"),
        expr("cxy * CAST(floor(ln(CAST(cxy AS DOUBLE) * nn" +
          " / (CAST(cx AS DOUBLE) * cy)) * 1000000 + 0.5) AS BIGINT)")
          .as("term"))
      .groupBy("pa", "pb", "nn").agg(sum(col("term")).as("tsum"))
      .select(col("pa").as("var_a"), col("pb").as("var_b"),
        expr("CASE WHEN tsum < 0 THEN -((-tsum) div nn)" +
          " ELSE tsum div nn END").as("mi_micronats"))
      .orderBy("var_a", "var_b")
  }

  private val q374Oracle: String = {
    val pairs = for {
      i <- MiVars.indices; j <- (i + 1) until MiVars.size
    } yield (MiVars(i), MiVars(j))
    val branches = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS var_a, '$b' AS var_b,
         |  CAST(CASE WHEN sum(term) < 0 THEN -((-sum(term)) // max(nn))
         |    ELSE sum(term) // max(nn) END AS BIGINT) AS mi_micronats
         |FROM (SELECT cxy * CAST(floor(ln(CAST(cxy AS DOUBLE) * nn
         |      / (CAST(cx AS DOUBLE) * cy)) * 1000000 + 0.5) AS BIGINT)
         |      AS term, nn
         |  FROM (SELECT $a AS x, $b AS yv, CAST(sum(c) AS BIGINT) AS cxy
         |      FROM cells GROUP BY 1, 2) j
         |  JOIN (SELECT $a AS x, CAST(sum(c) AS BIGINT) AS cx FROM cells
         |      GROUP BY 1) ma USING (x)
         |  JOIN (SELECT $b AS yv, CAST(sum(c) AS BIGINT) AS cy FROM cells
         |      GROUP BY 1) mb USING (yv)
         |  CROSS JOIN n)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cells AS (SELECT l_returnflag AS f, l_linestatus AS s,
       |    CAST(year(l_shipdate) AS BIGINT) AS y,
       |    CAST(l_quantity AS BIGINT) // 10 AS qb, count(*) AS c
       |  FROM lineitem GROUP BY 1, 2, 3, 4),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells)
       |$branches
       |ORDER BY var_a, var_b""".stripMargin
  }

  // -- q375: character-entropy compressibility census ----------------------------------------
  // The order-0 entropy bound per source — the cheap "is this text or
  // binary junk?" quality gate: H = Σ (c/N)·ln(N/c) over the character
  // census, each log gridded to micro-nats, reported in micro-BITS per
  // character (÷ ln 2 as a micro literal) with the implied best-case
  // compression ratio against 8-bit bytes. Per-char explosion is the
  // only row-amplifying step; the census is alphabet-grain.
  private val Ln2Micro = 693147L

  private def q375(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), "")).as("ch"))
      .groupBy("source", "ch").agg(count(lit(1)).as("c"))
    val tot = census.groupBy("source").agg(sum(col("c")).as("n"),
      count(lit(1)).as("distinct_chars"))
    census.join(tot, "source")
      .select(col("source"), col("n"), col("distinct_chars"),
        expr("c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1000000 + 0.5)" +
          " AS BIGINT)").as("term"))
      .groupBy("source", "n", "distinct_chars")
      .agg(sum(col("term")).as("tsum"))
      .select(col("source"), col("n").as("n_chars"), col("distinct_chars"),
        // tsum·1e6 crosses 2^63 at sf0.1 corpus size: DECIMAL
        expr(s"CAST(tsum AS DECIMAL(38,0)) * 1000000" +
          s" div (CAST(n AS DECIMAL(38,0)) * $Ln2Micro)").as("h_microbits"),
        expr(s"CAST(tsum AS DECIMAL(38,0)) * 1000000" +
          s" div (CAST(n AS DECIMAL(38,0)) * $Ln2Micro)" +
          " * 1000000 div 8000000").as("compress_bound_ppm"))
      .orderBy("source")
  }

  private val q375Oracle: String =
    s"""WITH census AS (SELECT source, unnest(string_split(text, '')) AS ch
       |  FROM documents),
       |cc AS (SELECT source, ch, count(*) AS c FROM census GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
       |    count(*) AS distinct_chars FROM cc GROUP BY 1),
       |terms AS (SELECT cc.source, n, distinct_chars,
       |    c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1000000 + 0.5)
       |      AS BIGINT) AS term
       |  FROM cc JOIN tot USING (source)),
       |hs AS (SELECT source, n, distinct_chars,
       |    CAST(sum(term) AS BIGINT) AS tsum
       |  FROM terms GROUP BY 1, 2, 3)
       |SELECT source, n AS n_chars, distinct_chars,
       |  CAST(CAST(tsum AS HUGEINT) * 1000000
       |    // (CAST(n AS HUGEINT) * $Ln2Micro) AS BIGINT) AS h_microbits,
       |  CAST(CAST(tsum AS HUGEINT) * 1000000
       |    // (CAST(n AS HUGEINT) * $Ln2Micro) * 1000000 // 8000000
       |    AS BIGINT) AS compress_bound_ppm
       |FROM hs ORDER BY source""".stripMargin

  // -- q376: multi-level hierarchy rollup -------------------------------------------------------
  // BOM/category-tree aggregation without recursion: ancestors are
  // ARITHMETIC (level-k ancestor of part p = p div 10^k), so one
  // explode emits every (level, ancestor) pair and one census rolls
  // revenue to every tree level. The per-level grand total is
  // invariant by construction — the rollup audits itself — and each
  // level reports its dominant subtree.
  private val HierLevels = 6

  private def q376(spark: SparkSession, sfDir: String): DataFrame = {
    val perPart = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .as("rev_u"))
    val lvls = (0 until HierLevels).map(k =>
      s"struct(${k}L AS lvl, pk div ${math.pow(10, k).toLong} AS anc)")
      .mkString("array(", ", ", ")")
    val byAnc = perPart
      .select(explode(expr(lvls)).as("la"), col("rev_u"))
      .groupBy(col("la.lvl").as("lvl"), col("la.anc").as("anc"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_u")).as("rev_u"))
    byAnc
      .withColumn("rk", row_number().over(Window.partitionBy("lvl")
        .orderBy(col("rev_u").desc, col("anc"))))
      .withColumn("total_rev_u",
        sum(col("rev_u")).over(Window.partitionBy("lvl")))
      .where(col("rk") === 1)
      .select(col("lvl"), col("anc").as("top_ancestor"),
        col("n_parts").as("top_n_parts"), col("rev_u").as("top_rev_u"),
        expr("CAST(rev_u AS DECIMAL(38,0)) * 1000000 div total_rev_u")
          .as("top_share_ppm"), col("total_rev_u"))
      .orderBy("lvl")
  }

  private val q376Oracle: String = {
    val lvls = (0 until HierLevels).map(k =>
      s"SELECT ${k} AS lvl, CAST(${math.pow(10, k).toLong} AS BIGINT)" +
        " AS d").mkString(" UNION ALL ")
    s"""WITH perpart AS (SELECT l_partkey AS pk,
       |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
       |      AS BIGINT) AS rev_u
       |  FROM lineitem GROUP BY 1),
       |lv AS ($lvls),
       |byanc AS (SELECT CAST(lvl AS BIGINT) AS lvl, pk // d AS anc,
       |    count(*) AS n_parts, CAST(sum(rev_u) AS BIGINT) AS rev_u
       |  FROM perpart CROSS JOIN lv GROUP BY 1, 2),
       |rk AS (SELECT *,
       |    row_number() OVER (PARTITION BY lvl ORDER BY rev_u DESC, anc)
       |      AS rk,
       |    CAST(sum(rev_u) OVER (PARTITION BY lvl) AS BIGINT)
       |      AS total_rev_u
       |  FROM byanc)
       |SELECT lvl, anc AS top_ancestor, n_parts AS top_n_parts,
       |  rev_u AS top_rev_u,
       |  CAST(CAST(rev_u AS HUGEINT) * 1000000 // total_rev_u AS BIGINT)
       |    AS top_share_ppm,
       |  total_rev_u
       |FROM rk WHERE rk = 1 ORDER BY lvl""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q374_mi_matrix", q374, Some(q374Oracle)),
    QueryDef("q375_char_entropy", q375, Some(q375Oracle)),
    QueryDef("q376_hierarchy_rollup", q376, Some(q376Oracle)),
  )
}

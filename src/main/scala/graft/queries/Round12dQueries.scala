package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ops.MultimodalOps

/** Round-12 fourth wave: the BMP container parser (completing the
  * five-format metadata family) and a Simpson's-paradox stratification
  * check built entirely on exact integer cross-multiplication.
  */
object Round12dQueries {

  private val dec = DecimalType(38, 0)

  // -- q249: BMP header metadata roundtrip -------------------------------------
  // The fifth container format, chosen for the two things the other
  // four never exercise: a SIGNED dimension field (negative height =
  // top-down row order) and a derived file size that depends on
  // 4-byte row-stride padding — both re-validated by the independent
  // parser (MultimodalOps.bmpDims), with every 7th payload corrupted
  // and every 3rd top-down. The oracle recomputes width/height/
  // stride/file-size algebraically from the same doc columns, so a
  // wrong offset, an unsigned height read, or a padding slip breaks
  // the gate.
  private def q249(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val payload = MultimodalOps.bmpHeader(
      col("n_chars") % 800 + 1, col("doc_id") % 600 + 1,
      col("doc_id") % 3 === 0, col("doc_id") % 7 =!= 0)
    val dims = MultimodalOps.bmpDims(col("payload"))
    d.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), dims.as("__d"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"))
      .select(col("doc_id"),
        col("__d").getItem(0).as("width"),
        col("__d").getItem(1).as("height"),
        col("__d").getItem(2).as("bpp"),
        col("__d").getItem(3).as("top_down"),
        col("__d").getItem(4).as("file_size"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  private val q249Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 800 + 1 END AS width,
      |  CASE WHEN doc_id % 7 <> 0 THEN doc_id % 600 + 1 END AS height,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(24 AS BIGINT) END AS bpp,
      |  CASE WHEN doc_id % 7 <> 0 THEN
      |    CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    END AS top_down,
      |  CASE WHEN doc_id % 7 <> 0 THEN
      |    54 + ((n_chars % 800 + 1) * 3 + 3) // 4 * 4 * (doc_id % 600 + 1)
      |    END AS file_size,
      |  CAST(54 AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q250: Simpson's-paradox stratification check ----------------------------
  // The aggregation trap every metrics review must test for: does the
  // pooled cohort comparison (urgent-priority orders vs the rest, on
  // mean order value) keep its sign inside every year stratum? All
  // sign decisions are exact integer cross-multiplications —
  // mean_A > mean_B ⟺ s_A·n_B > s_B·n_A in DECIMAL/HUGEINT — so no
  // division, rounding, or float boundary can flip a verdict. Means
  // are reported on the n4 grid (one double division each,
  // NULL-guarded via try_divide ↔ plain / per the degenerate-stratum
  // contract); the pooled direction and the all-strata-reversed flag
  // ride every row.
  private def q250(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "orders")
      .select(year(to_date(col("o_orderdate"))).cast(LongType).as("yr"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "A")
          .otherwise("B").as("cohort"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType)
          .as("x_u"))
    val strat = base.groupBy("yr")
      .agg(
        sum(when(col("cohort") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("cohort") === "A", col("x_u")).otherwise(0L)).as("sa"),
        sum(when(col("cohort") === "B", 1L).otherwise(0L)).as("nb"),
        sum(when(col("cohort") === "B", col("x_u")).otherwise(0L)).as("sb"))
      .withColumn("dir", signum(
        (col("sa").cast(dec) * col("nb") - col("sb").cast(dec) * col("na"))
          .cast(DoubleType)).cast(LongType))
      .localCheckpoint(true) // rows + pooled rollup + paradox fold
    val pooled = strat.agg(
        sum(col("na")).as("pna"), sum(col("sa")).cast(dec).as("psa"),
        sum(col("nb")).as("pnb"), sum(col("sb")).cast(dec).as("psb"))
      .select(signum((col("psa") * col("pnb") - col("psb") * col("pna"))
        .cast(DoubleType)).cast(LongType).as("pooled_dir"))
    val paradox = strat.crossJoin(broadcast(pooled))
      .agg((max(col("pooled_dir")) =!= 0L &&
        max(col("dir") * col("pooled_dir")) < 0L).as("paradox"))
    strat.crossJoin(broadcast(pooled)).crossJoin(broadcast(paradox))
      .select(col("yr"), col("na"),
        Norm.n4(try_divide(col("sa").cast(DoubleType),
          col("na").cast(DoubleType) * lit(100.0))).as("mean_a_n4"),
        col("nb"),
        Norm.n4(try_divide(col("sb").cast(DoubleType),
          col("nb").cast(DoubleType) * lit(100.0))).as("mean_b_n4"),
        col("dir"), col("pooled_dir"), col("paradox"))
      .orderBy("yr")
  }

  private val q250Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH base AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
       |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 'A' ELSE 'B' END AS cohort,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x_u
       |  FROM orders),
       |strat AS (SELECT yr,
       |    CAST(sum(CASE WHEN cohort = 'A' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN cohort = 'A' THEN x_u ELSE 0 END) AS BIGINT)
       |      AS sa,
       |    CAST(sum(CASE WHEN cohort = 'B' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nb,
       |    CAST(sum(CASE WHEN cohort = 'B' THEN x_u ELSE 0 END) AS BIGINT)
       |      AS sb
       |  FROM base GROUP BY 1),
       |d AS (SELECT *, CAST(sign(CAST(CAST(sa AS HUGEINT) * nb
       |      - CAST(sb AS HUGEINT) * na AS DOUBLE)) AS BIGINT) AS dir
       |  FROM strat),
       |p AS (SELECT CAST(sign(CAST(sum(CAST(sa AS HUGEINT)) * sum(nb)
       |      - sum(CAST(sb AS HUGEINT)) * sum(na) AS DOUBLE)) AS BIGINT)
       |      AS pooled_dir
       |  FROM strat),
       |x AS (SELECT max(pooled_dir) <> 0
       |      AND max(dir * pooled_dir) < 0 AS paradox
       |  FROM d CROSS JOIN p)
       |SELECT yr, na,
       |  ${n4("CAST(sa AS DOUBLE) / (CAST(na AS DOUBLE) * 100.0)")}
       |    AS mean_a_n4,
       |  nb,
       |  ${n4("CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * 100.0)")}
       |    AS mean_b_n4,
       |  dir, pooled_dir, paradox
       |FROM d CROSS JOIN p CROSS JOIN x
       |ORDER BY yr""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q249_bmp_metadata", q249, Some(q249Oracle)),
    QueryDef("q250_simpson_check", q250, Some(q250Oracle)))
}

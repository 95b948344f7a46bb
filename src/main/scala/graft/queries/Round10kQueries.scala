package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-10 eleventh wave: corpus cartography (source-centroid
  * similarity) and pre-flight join-skew diagnostics.
  */
object Round10kQueries {

  // -- q184: source-centroid similarity map ----------------------------------
  // Which sources say the same things: per-source embedding centroids
  // compared pairwise by cosine — the corpus cartography a mixing
  // policy (q77/q139) consults before re-weighting. Determinism is
  // the hard part: float sums are order-private, so each dimension is
  // gridded to exact 1e-6 integers per row FIRST and centroid moments
  // are ASSOCIATIVE integer sums (DECIMAL(38)/HUGEINT for the cross
  // products); cosine then runs once per source pair on the tiny
  // 20x64 moment frame. Scale shape: one posexplode shuffle keyed by
  // (source, dim), then all-pairs over SOURCES (a config-bounded
  // domain, not the corpus).
  private def q184(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dims = Tables.read(spark, sfDir, "embeddings")
      .join(Tables.read(spark, sfDir, "documents")
          .select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("source"), col("dim"),
        floor(col("x").cast("double") * 1000000 + lit(0.5)).cast("long")
          .as("u"))
      .groupBy("source", "dim").agg(sum(col("u")).as("s_u"))
      .localCheckpoint(true) // both sides of the pair join
    val pairs = dims.select(col("source").as("sa"), col("dim"),
        col("s_u").as("ua"))
      .join(dims.select(col("source").as("sb"), col("dim"),
        col("s_u").as("ub")), "dim")
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(sum(col("ua").cast(dec) * col("ub").cast(dec)).as("sab"),
        sum(col("ua").cast(dec) * col("ua").cast(dec)).as("saa"),
        sum(col("ub").cast(dec) * col("ub").cast(dec)).as("sbb"))
    pairs.select(col("sa"), col("sb"),
        Norm.n4(col("sab").cast("double") /
          (sqrt(col("saa").cast("double")) * sqrt(col("sbb").cast("double"))))
          .as("cos_n4"))
      .orderBy("sa", "sb")
  }

  private val q184Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH dims AS (SELECT source, dim, CAST(sum(u) AS BIGINT) AS s_u
       |  FROM (SELECT d.source,
       |          unnest(range(1, len(e.embedding) + 1)) AS dim,
       |          CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 1000000
       |            + 0.5) AS BIGINT) AS u
       |        FROM embeddings e
       |        JOIN documents d ON e.vec_id = d.doc_id)
       |  GROUP BY 1, 2),
       |p AS (SELECT a.source AS sa, b.source AS sb,
       |    sum(CAST(a.s_u AS HUGEINT) * b.s_u) AS sab,
       |    sum(CAST(a.s_u AS HUGEINT) * a.s_u) AS saa,
       |    sum(CAST(b.s_u AS HUGEINT) * b.s_u) AS sbb
       |  FROM dims a JOIN dims b ON a.dim = b.dim AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT sa, sb,
       |  ${n4("CAST(sab AS DOUBLE) / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE)))")}
       |    AS cos_n4
       |FROM p ORDER BY sa, sb""".stripMargin
  }

  // -- q185: join-skew pre-flight diagnostics --------------------------------
  // The check a pipeline runs BEFORE a big join picks salting (q54)
  // or AQE skew handling: the per-key frequency profile of the join
  // key — key count, max load, exact p50/p99 loads, and the skew
  // factor (max over mean, in thousandths). One partial-aggregable
  // key census plus a one-row readout; percentiles run on the
  // key-cardinality frame, not the corpus.
  private def q185(spark: SparkSession, sfDir: String): DataFrame = {
    val perKey = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    perKey.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        percentile(col("n"), lit(0.5)).as("__p50"),
        percentile(col("n"), lit(0.99)).as("__p99"))
      .select(col("n_rows"), col("n_keys"), col("max_n"),
        Norm.n4(col("__p50")).as("p50_n4"), Norm.n4(col("__p99")).as("p99_n4"),
        expr("max_n * 1000 * n_keys div n_rows").as("skew_x1000"))
  }

  private val q185Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH k AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1)
       |SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
       |  max(n) AS max_n,
       |  ${n4("quantile_cont(n, 0.5)")} AS p50_n4,
       |  ${n4("quantile_cont(n, 0.99)")} AS p99_n4,
       |  CAST(max(n) * 1000 * count(*) // CAST(sum(n) AS BIGINT) AS BIGINT)
       |    AS skew_x1000
       |FROM k""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q184_source_centroids", q184, Some(q184Oracle)),
    QueryDef("q185_join_skew_stats", q185, Some(q185Oracle)))
}

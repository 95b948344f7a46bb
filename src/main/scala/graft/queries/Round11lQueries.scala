package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ops.MixOps

/** Round-11 twelfth wave: the exact Mann-Whitney U test and
  * data-skipping (file-stats pruning) effectiveness statistics.
  */
object Round11lQueries {

  // -- q223: Mann-Whitney U test ---------------------------------------------
  // The nonparametric A/B workhorse (rank-sum — robust where q121's
  // t-statistic assumes moments), computed EXACTLY at scale: the raw
  // metric collapses to a (value → per-variant count) census — the
  // only data-sized shuffle — and 2U = Σ_v cA_v·(2·cumB_<v + cB_v)
  // needs only a prefix sum over that census, decomposed q205-style
  // (percentile-cut buckets, 32-row carry frame, bucket-keyed
  // windows; exact for any cut placement since + is associative and
  // buckets are value-contiguous). Doubling U keeps tie handling
  // integer. The tie-corrected z casts each exact DECIMAL piece to
  // DOUBLE once and applies one fixed expression (IEEE sqrt is
  // correctly rounded), then lands on the n4 grid.
  private val MwSeed = 91L
  private val MwBuckets = 32

  private def q223(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val census = Tables.read(spark, sfDir, "orders")
      .select(floor(col("o_totalprice")).as("x"),
        (MixOps.portableHash2(col("o_orderkey"), MwSeed) % 2).as("g"))
      .groupBy("x")
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
      .localCheckpoint(true) // cuts probe + bucketed prefix + moments
    val fracs = (1 until MwBuckets).map(_.toDouble / MwBuckets)
    // SKETCH cuts (round 12): placement needs no exactness — any
    // value-contiguous bucketing yields the same prefix sums — so the
    // exact percentile's single-reducer value map buys nothing here
    val cuts = census.agg(percentile_approx(col("x"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = census.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until MwBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("x").cast(DoubleType) >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("__bkt").agg(sum(col("cb")).as("__bsum"))
      .withColumn("__carry",
        coalesce(sum(col("__bsum")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = bucketed.join(broadcast(carries), "__bkt")
      .withColumn("__cumb",
        col("__carry") + coalesce(sum(col("cb")).over(w), lit(0L)))
      .select(col("ca"), col("cb"),
        (col("ca").cast(dec) *
          (lit(2L) * col("__cumb") + col("cb")).cast(dec)).as("u2t"),
        ((col("ca") + col("cb")).cast(dec)).as("t"))
    contrib.agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("u2t")).as("__u2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("__ties"))
      .select(col("n_a"), col("n_b"),
        col("__u2").cast(LongType).as("u2"),
        Norm.n4(
          (col("__u2").cast(DoubleType) -
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast(DoubleType)) /
          (lit(2.0) * sqrt(
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast(DoubleType) *
              ((col("n_a") + col("n_b") + 1).cast(DoubleType) -
                col("__ties").cast(DoubleType) /
                ((col("n_a") + col("n_b")).cast(dec) *
                  (col("n_a") + col("n_b") - 1).cast(dec)).cast(DoubleType))
              / lit(12.0)))).as("z_n4"))
  }

  private val q223Oracle: String = {
    val h = s"((((o_orderkey % ${MixOps.P} + $MwSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS x,
       |    ($h) % 2 AS g
       |  FROM orders),
       |census AS (SELECT x,
       |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM b GROUP BY 1),
       |pre AS (SELECT ca, cb,
       |    CAST(coalesce(sum(cb) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cumb
       |  FROM census),
       |agg AS (SELECT
       |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
       |    sum(CAST(ca AS HUGEINT) * (2 * cumb + cb)) AS u2,
       |    sum(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
       |      - (ca + cb)) AS ties
       |  FROM pre)
       |SELECT n_a, n_b, CAST(u2 AS BIGINT) AS u2,
       |  ${graft.etl.OracleSql.n4(
      "(CAST(u2 AS DOUBLE) - CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE)) / " +
        "(2.0 * sqrt(CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) * " +
        "(CAST(n_a + n_b + 1 AS DOUBLE) - CAST(ties AS DOUBLE) / " +
        "CAST(CAST(n_a + n_b AS HUGEINT) * (n_a + n_b - 1) AS DOUBLE)) " +
        "/ 12.0))")} AS z_n4
       |FROM agg""".stripMargin
  }

  // -- q224: data-skipping effectiveness stats -------------------------------
  // The Iceberg/Delta manifest-pruning question asked of the data
  // itself: with per-file min/max column stats (files = the q204
  // inventory derivation), what fraction of files does a given range
  // predicate skip, and what is the I/O amplification of the files it
  // must open? Per-file stats are ONE map-side-combining aggregate;
  // the pruning decision (max < lo OR min > hi ⇒ skip) and the
  // matched-vs-scanned row accounting are pure algebra on the file-
  // stats frame. Reported per probe window (three predicate ranges),
  // ordered — the scan-planning cost model in one query.
  private val SkipProbes = Seq(
    ("p1_low", 1000L, 20000L),
    ("p2_mid", 80000L, 120000L),
    ("p3_high", 350000L, 600000L))

  private def q224(spark: SparkSession, sfDir: String): DataFrame = {
    // per-probe matched counts fold into the SAME single aggregate as
    // the min/max stats — one scan serves stats and truth counts
    val filesFull = Tables.read(spark, sfDir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("part"),
        (col("o_orderkey") % 97).as("file_id"),
        floor(col("o_totalprice")).as("pu"))
      .groupBy("part", "file_id")
      .agg(count(lit(1)).as("n_rows"),
        (Seq(min(col("pu")).as("mn"), max(col("pu")).as("mx")) ++
          SkipProbes.map { case (nm, lo, hi) =>
            sum(when(col("pu") >= lo && col("pu") <= hi, 1L).otherwise(0L))
              .as(s"m_$nm")
          }): _*)
      .localCheckpoint(true) // one stats frame serves all three probes
    SkipProbes.map { case (nm, lo, hi) =>
      val scanned = when(!(col("mx") < lo || col("mn") > hi), 1L)
        .otherwise(0L)
      filesFull.agg(
          count(lit(1)).as("n_files"),
          sum(lit(1L) - scanned).as("n_skipped"),
          sum(when(scanned === 1L, col("n_rows")).otherwise(0L))
            .as("rows_scanned"),
          sum(col(s"m_$nm")).as("rows_matched"))
        .select(lit(nm).as("probe"), col("n_files"), col("n_skipped"),
          expr("n_skipped * 1000000 div n_files").as("skip_ppm"),
          col("rows_scanned"), col("rows_matched"),
          when(col("rows_matched") > 0,
            expr("rows_scanned * 1000000 div rows_matched"))
            .as("amp_ppm"))
    }.reduce(_ unionAll _).orderBy("probe")
  }

  private val q224Oracle: String = {
    val probes = SkipProbes.map { case (nm, lo, hi) =>
      s"""SELECT '$nm' AS probe, count(*) AS n_files,
         |  CAST(sum(CASE WHEN mx < $lo OR mn > $hi THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_skipped,
         |  CAST(sum(CASE WHEN mx < $lo OR mn > $hi THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS skip_ppm,
         |  CAST(sum(CASE WHEN NOT (mx < $lo OR mn > $hi) THEN n_rows
         |    ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(sum(m_$nm) AS BIGINT) AS rows_matched,
         |  CASE WHEN sum(m_$nm) > 0 THEN
         |    CAST(sum(CASE WHEN NOT (mx < $lo OR mn > $hi) THEN n_rows
         |      ELSE 0 END) * 1000000 // sum(m_$nm) AS BIGINT)
         |  END AS amp_ppm
         |FROM f""".stripMargin
    }
    val matchCols = SkipProbes.map { case (nm, lo, hi) =>
      s"CAST(sum(CASE WHEN pu >= $lo AND pu <= $hi THEN 1 ELSE 0 END) AS BIGINT) AS m_$nm"
    }.mkString(",\n    ")
    s"""WITH rows_ AS (SELECT strftime(o_orderdate, '%Y-%m') AS part,
       |    o_orderkey % 97 AS file_id,
       |    CAST(floor(o_totalprice) AS BIGINT) AS pu
       |  FROM orders),
       |f AS (SELECT part, file_id, count(*) AS n_rows,
       |    min(pu) AS mn, max(pu) AS mx,
       |    $matchCols
       |  FROM rows_ GROUP BY 1, 2)
       |SELECT * FROM (
       |${probes.mkString("\nUNION ALL\n")}
       |) ORDER BY probe""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q223_mann_whitney", q223, Some(q223Oracle)),
    QueryDef("q224_skipping_stats", q224, Some(q224Oracle)))
}

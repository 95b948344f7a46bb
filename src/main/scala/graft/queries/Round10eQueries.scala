package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 fifth wave: content-addressable digest census, linear
  * gap interpolation, measured Bloom FPR, and the mergeable
  * partial-rollup pattern.
  */
object Round10eQueries {

  // -- q162: content-addressable digest census -------------------------------
  // The storage layer under every dedup pipeline: objects keyed by
  // SHA-256 of their bytes, sharded by digest prefix (the uniform
  // fan-out trick object stores use). Census per 2-hex-char shard:
  // reference count vs distinct object count — the dedup win the
  // addressing scheme buys. Corpus is documents plus planted exact
  // duplicates (every 7th doc re-referenced), so n_refs > n_objects
  // on a known subset. Cryptographic-hash parity across engines is
  // itself a gate: a digest mismatch anywhere flips a shard count.
  private def q162(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val refs = d.select(col("text"))
      .unionAll(d.where(col("doc_id") % 7 === 0).select(col("text")))
    refs.select(sha2(col("text"), 256).as("digest"))
      .select(substring(col("digest"), 1, 2).as("shard"), col("digest"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("digest")).as("n_objects"))
      .orderBy("shard")
  }

  private val q162Oracle: String =
    """WITH refs AS (SELECT text FROM documents
      |  UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0),
      |d AS (SELECT sha256(text) AS digest FROM refs)
      |SELECT substr(digest, 1, 2) AS shard, count(*) AS n_refs,
      |  CAST(count(DISTINCT digest) AS BIGINT) AS n_objects
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q163: linear gap interpolation ----------------------------------------
  // q136's forward-fill sibling for sensor-style series: a sparse
  // daily series (every 3rd day observed) linearly interpolated onto
  // the dense calendar grid, exact integer arithmetic
  // (`prev + (next−prev)·(d−pd) div (nd−pd)` in cents), NULL outside
  // the observed hull (no extrapolation). The observed-day filter is
  // epoch-day arithmetic, so both engines pick identical days.
  private def q163(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("rev_u"))
      .where(unix_date(col("day")) % 3 === 0)
      .localCheckpoint(true) // feeds the bounds scan AND the grid join
    val bounds = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
    val grid = bounds.select(
      explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val sparse = grid.join(daily, Seq("day"), "left")
    val before = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    // "next observed" = last-non-null over the REVERSED expanding
    // frame, never `first over (0, unboundedFollowing)`: Spark
    // re-evaluates shrinking UnboundedFollowing frames from scratch
    // per row — O(days²), measured 16.5 s on the 25k-day stretched
    // calendar vs 0.5 s at 2.5k days (round 17). The reversed
    // expanding frame is O(days) and picks the identical day.
    val beforeDesc = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // day-grain windows: calendar-bounded frame (the q104/q149 argument)
    val withEnds = sparse
      .withColumn("pv", last(col("rev_u"), ignoreNulls = true).over(before))
      .withColumn("pd", last(when(col("rev_u").isNotNull, col("day")),
        ignoreNulls = true).over(before))
      .withColumn("nv", last(col("rev_u"), ignoreNulls = true)
        .over(beforeDesc))
      .withColumn("nd", last(when(col("rev_u").isNotNull, col("day")),
        ignoreNulls = true).over(beforeDesc))
    // the interpolation fraction runs in DOUBLE with an explicit floor
    // on BOTH engines: a bare long/long divide then cast would
    // truncate in Spark but ROUND in DuckDB's CAST(double AS BIGINT)
    val frac = floor((col("nv") - col("pv")).cast("double") *
      datediff(col("day"), col("pd")) / datediff(col("nd"), col("pd")))
    withEnds.select(col("day"), col("rev_u"),
      when(col("rev_u").isNotNull, col("rev_u"))
        .otherwise(when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv") + frac.cast("long")))
        .cast("long").as("interp_u"))
      .orderBy("day")
  }

  private val q163Oracle: String =
    """WITH daily AS (SELECT day, rev_u FROM (
      |    SELECT CAST(o_orderdate AS DATE) AS day,
      |      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |        AS rev_u
      |    FROM orders GROUP BY 1)
      |  WHERE CAST(day - DATE '1970-01-01' AS BIGINT) % 3 = 0),
      |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |grid AS (SELECT lo + CAST(u.i AS INTEGER) AS day
      |  FROM bounds, unnest(range(0, CAST(hi - lo AS BIGINT) + 1)) u(i)),
      |sparse AS (SELECT g.day, d.rev_u FROM grid g
      |  LEFT JOIN daily d ON g.day = d.day),
      |ends AS (SELECT day, rev_u,
      |    last_value(rev_u IGNORE NULLS) OVER (ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS pv,
      |    last_value(CASE WHEN rev_u IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
      |    first_value(rev_u IGNORE NULLS) OVER (ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN rev_u IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nd
      |  FROM sparse)
      |SELECT day, rev_u,
      |  CAST(CASE WHEN rev_u IS NOT NULL THEN rev_u
      |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |      pv + CAST(floor(CAST(nv - pv AS DOUBLE)
      |        * CAST(day - pd AS BIGINT) / CAST(nd - pd AS BIGINT)) AS BIGINT)
      |    END AS BIGINT) AS interp_u
      |FROM ends ORDER BY day""".stripMargin

  // -- q164: measured Bloom-filter false-positive rate -----------------------
  // The q73 prefilter's configured fpp, actually measured: build the
  // native BloomFilterAggregate over the even part keys, probe with
  // the disjoint odd keys (every positive IS a false positive), and
  // gate that the measured rate stays within 3x the configured 1% —
  // the est-vs-truth convention (q62/q64/q126), since no other engine
  // can replay Spark's exact bit pattern.
  private val BloomFpp = 0.01

  private def q164(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ExprBridge
    val part = Tables.read(spark, sfDir, "part").select(col("p_partkey"))
      .localCheckpoint(true) // feeds the build count, the build, the probes
    val members = part.where(col("p_partkey") % 2 === 0)
    val nItems = math.max(members.count(), 1L)
    val nBits = math.max(64L,
      math.ceil(-nItems * math.log(BloomFpp) /
        (math.log(2) * math.log(2))).toLong)
    val bloomAgg = ExprBridge.column(
      new BloomFilterAggregate(
        ExprBridge.expression(xxhash64(col("p_partkey"))),
        Literal(nItems), Literal(nBits)).toAggregateExpression())
    val bin = members.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val might = ExprBridge.column(BloomFilterMightContain(
      ExprBridge.expression(lit(bin)),
      ExprBridge.expression(xxhash64(col("p_partkey")))))
    part.where(col("p_partkey") % 2 === 1)
      .agg(count(lit(1)).as("n_probes"),
        sum(might.cast("long")).as("__fp"))
      .select(col("n_probes"),
        (col("__fp") <= lit(3 * BloomFpp) * col("n_probes"))
          .as("within_3x_fpp"))
  }

  private val q164Oracle: String =
    """SELECT count(*) AS n_probes, TRUE AS within_3x_fpp
      |FROM part WHERE p_partkey % 2 = 1""".stripMargin

  // -- q165: mergeable partial rollup ----------------------------------------
  // The incremental-aggregation contract 100 TB rollups live on:
  // yesterday's partial aggregate states merged with today's must
  // equal the full recompute. Two disjoint half-batches each produce
  // per-priority moment partials (n, sum, min, max — all mergeable),
  // the merge is a second aggregate over the UNION of states, and the
  // oracle IS the direct full rollup — so a non-mergeable moment or a
  // lossy merge breaks the hash.
  private def q165(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
    def partial(pred: org.apache.spark.sql.Column) = orders.where(pred)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("s_u"),
        min(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("mn_u"),
        max(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("mx_u"))
    partial(col("o_orderkey") % 2 === 0)
      .unionAll(partial(col("o_orderkey") % 2 === 1))
      .groupBy("prio")
      .agg(sum(col("n")).as("n"), sum(col("s_u")).as("s_u"),
        min(col("mn_u")).as("mn_u"), max(col("mx_u")).as("mx_u"))
      .select(col("prio"), col("n"), col("s_u"), col("mn_u"), col("mx_u"),
        expr("s_u div n").as("mean_u_floor"))
      .orderBy("prio")
  }

  private val q165Oracle: String =
    """SELECT o_orderpriority AS prio, count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS s_u,
      |  min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS mn_u,
      |  max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS mx_u,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    // count(*) AS mean_u_floor
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q162_content_hash", q162, Some(q162Oracle)),
    QueryDef("q163_linear_interp", q163, Some(q163Oracle)),
    QueryDef("q164_bloom_fpr", q164, Some(q164Oracle)),
    QueryDef("q165_partial_merge", q165, Some(q165Oracle)))
}

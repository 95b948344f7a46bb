package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.StatsOps

/** Round-11 first wave: the documented 100 TB scale path for the two
  * most expensive steady exact-percentile queries (VERDICT r10 #2) —
  * sketch variants of q180's equi-depth statistics and q103's MAD
  * outlier census, each GATED against the exact statistic inside the
  * same query so the driver hash gate fails if a sketch ever drifts
  * out of its documented tolerance.
  */
object Round11Queries {

  // -- q188: approximate equi-depth column statistics -------------------------
  // q180's 100 TB form: cut points from percentile_approx (the
  // GK-sketch — one pass, bounded memory, mergeable across executors;
  // exact interpolated percentiles need a full sort of the column) and
  // NDV from HLL (approx_count_distinct at 1% rsd) instead of an exact
  // dedup exchange. The gate: per bucket, the realized depth must sit
  // within 5% of the ideal n/16 (the equi-depth property the sketch
  // cuts promise — rank error at accuracy 10⁴ is ≤0.01% of n, so 5%
  // is generous headroom for tie mass), and the HLL estimate within
  // 5% of the exact per-bucket NDV (5 rsd). The oracle recomputes
  // n_total exactly and emits TRUE gates — a drifting sketch fails
  // the driver hash compare at whichever SF it drifts.
  private val DepthBuckets = 16
  private val DepthAccuracy = 10000

  private def q188(spark: SparkSession, sfDir: String): DataFrame = {
    val vals = Tables.read(spark, sfDir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        .as("v_u"))
      .localCheckpoint(true) // cuts pass AND the census passes
    val fracs = (1 until DepthBuckets).map(_.toDouble / DepthBuckets)
    val cuts = vals.agg(percentile_approx(col("v_u"),
      array(fracs.map(lit): _*), lit(DepthAccuracy)).as("__cuts"))
    val bucketed = vals.crossJoin(broadcast(cuts))
      .withColumn("bucket", (1 until DepthBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("v_u").cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .localCheckpoint(true) // HLL census AND exact-NDV census
    // HLL NDV map-side; the exact NDV (the gate's truth side) is the
    // one dedup exchange — dropped entirely in the production scale
    // mode, where only the sketch columns survive
    val perBucket = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("v_u"), 0.01).as("andv"))
    val exactNdv = bucketed.select("bucket", "v_u").distinct()
      .groupBy("bucket").agg(count(lit(1)).as("endv"))
    val total = vals.agg(count(lit(1)).as("__t"))
    // dense 1..16 spine (ADVICE r11): heavy tie mass can leave a
    // sketch-cut bucket EMPTY — without the spine that bucket simply
    // vanishes and the gate fails on ROW COUNT instead of surfacing
    // as depth_ok=false (n=0 always misses the ±5% depth band)
    val spine = spark.range(1, DepthBuckets + 1)
      .select(col("id").cast("int").as("bucket"))
    spine
      .join(broadcast(perBucket.join(broadcast(exactNdv), "bucket")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("__t").as("n_total"),
        (abs(coalesce(col("n"), lit(0L)) - col("__t") / DepthBuckets)
          .cast("double") <=
          lit(0.05) * col("__t") / DepthBuckets).as("depth_ok"),
        (abs(coalesce(col("andv"), lit(0L)) - coalesce(col("endv"), lit(0L)))
          .cast("double") <=
          lit(0.05) * coalesce(col("endv"), lit(0L))).as("ndv_ok"))
      .orderBy("bucket")
  }

  private val q188Oracle: String =
    s"""WITH t AS (SELECT count(*) AS n_total FROM lineitem)
       |SELECT CAST(b AS INTEGER) AS bucket, n_total,
       |  TRUE AS depth_ok, TRUE AS ndv_ok
       |FROM (SELECT unnest(range(1, ${DepthBuckets + 1})) AS b), t
       |ORDER BY bucket""".stripMargin

  // -- q189: approximate MAD outlier census ------------------------------------
  // q103's 100 TB form — see [[StatsOps.madOutliersApprox]].
  private def q189(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.madOutliersApprox(
      Tables.read(spark, sfDir, "lineitem"), "l_returnflag", "l_extendedprice")

  private val q189Oracle: String =
    StatsOps.madOutliersApproxSql("lineitem", "l_returnflag", "l_extendedprice")

  // -- q190: join-size preflight estimate --------------------------------------
  // The "would this join explode" check run BEFORE a big join, on the
  // key census alone (never materializing the join): the exact output
  // size of an orders self-join on order day is Σ c(day)² — computed
  // from the day-cardinality frame — next to the independence-
  // assumption estimate n²/n_keys an optimizer without histograms
  // would use, the blowup ratio between them, and the hottest key's
  // output share. Everything in DECIMAL(38)/HUGEINT (Σc² squares row
  // counts — the first thing to overflow BIGINT at real scale).
  private def q190(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val byDay = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
    byDay.agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_c"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("__exact"))
      .select(col("n_rows"), col("n_keys"), col("max_c"),
        col("__exact").cast("long").as("exact_out"),
        expr("cast(n_rows as decimal(38,0)) * n_rows div n_keys")
          .as("indep_est"),
        expr("__exact * 1000 div (cast(n_rows as decimal(38,0)) * n_rows div n_keys)")
          .as("blowup_x1000"),
        expr("cast(max_c as decimal(38,0)) * max_c * 1000000 div __exact")
          .as("top_share_ppm"))
  }

  private val q190Oracle: String =
    """WITH k AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS c
      |  FROM orders GROUP BY 1),
      |a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |    max(c) AS max_c, sum(CAST(c AS HUGEINT) * c) AS ex FROM k)
      |SELECT n_rows, n_keys, max_c, CAST(ex AS BIGINT) AS exact_out,
      |  CAST(CAST(n_rows AS HUGEINT) * n_rows // n_keys AS BIGINT) AS indep_est,
      |  CAST(ex * 1000 // (CAST(n_rows AS HUGEINT) * n_rows // n_keys) AS BIGINT)
      |    AS blowup_x1000,
      |  CAST(CAST(max_c AS HUGEINT) * max_c * 1000000 // ex AS BIGINT)
      |    AS top_share_ppm
      |FROM a""".stripMargin

  // -- q191: quarantine channel (dead-letter routing) ---------------------------
  // What the reference's C1 silently nulls, a production pipeline must
  // CHANNEL: every raw value routes to ok / null_like / unparseable
  // with a per-reason census and a sample — the badRecordsPath pattern
  // as data. The router reuses the REAL C1 kernel for the verdict and
  // the expression spec for the reason, so the census is the cleaner's
  // own confusion matrix. Dirt is derived deterministically from
  // lineitem so both engines see the identical feed.
  private[queries] def q191Dirty(castStr: String => String): String =
    s"""(CASE l_linenumber % 5
       | WHEN 1 THEN replace(${castStr("l_extendedprice")}, '.', ',')
       | WHEN 2 THEN concat(${castStr("l_quantity")}, '.', '000,', '25')
       | WHEN 3 THEN 'N/A'
       | WHEN 4 THEN 'n.a.'
       | ELSE ${castStr("l_extendedprice")}
       | END)""".stripMargin.replaceAll("\n", " ")

  /** (l_orderkey, raw, reason) routing projection over a lineitem
    * frame — shared by the batch census (q191) and its streaming twin
    * (q195, Round11bQueries): one routing definition, two execution
    * modes, one oracle.
    */
  private[queries] def quarantineRouted(
      li: DataFrame): DataFrame = {
    import graft.etl.Cleaners
    val raw = expr(q191Dirty(e => s"CAST($e AS STRING)"))
    val stripped = regexp_replace(col("raw"), "[^0-9.,+-]", "")
    val nulled = Cleaners.mapNullLikes(translate(stripped, ",", "."),
      Cleaners.numericNullLikes)
    li.select(col("l_orderkey"), raw.as("raw"))
      .select(col("l_orderkey"), col("raw"),
        when(Cleaners.cleanNumeric(col("raw")).isNotNull, "ok")
          .when(nulled.isNull, "null_like")
          .otherwise("unparseable").as("reason"))
  }

  private[queries] def quarantineCensus(routed: DataFrame): DataFrame =
    routed.groupBy("reason")
      .agg(count(lit(1)).as("n"), min(col("raw")).as("sample_raw"),
        max(col("l_orderkey")).as("max_key"))

  private def q191(spark: SparkSession, sfDir: String): DataFrame =
    quarantineCensus(quarantineRouted(Tables.read(spark, sfDir, "lineitem")))
      .orderBy("reason")

  private[queries] val q191Oracle: String = {
    import graft.etl.{Cleaners, OracleSql}
    val dirty = q191Dirty(e => s"CAST($e AS VARCHAR)")
    val stripped = "regexp_replace(raw, '[^0-9.,+-]', '', 'g')"
    val nulled = OracleSql.mapNullLikes(
      OracleSql.let(s"replace($stripped, ',', '.')", "d", "d"),
      Cleaners.numericNullLikes)
    s"""WITH b AS (SELECT l_orderkey, $dirty AS raw FROM lineitem),
       |r AS (SELECT l_orderkey, raw,
       |    CASE WHEN ${OracleSql.cleanNumeric("raw")} IS NOT NULL THEN 'ok'
       |         WHEN $nulled IS NULL THEN 'null_like'
       |         ELSE 'unparseable' END AS reason
       |  FROM b)
       |SELECT reason, count(*) AS n, min(raw) AS sample_raw,
       |  max(l_orderkey) AS max_key
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -- q192: higher-order-function vector statistics ----------------------------
  // The §2.7 array-function surface exercised as a first-class query:
  // per embedding, L2 norm via aggregate(), out-of-band component
  // count via filter(), and the head of the 1e-4-gridded transform()
  // — the lambda trio (aggregate/filter/transform) over ArrayType
  // that vector pipelines lean on when no kernel exists. Norms are
  // gridded (q116 discipline) so both engines hash identically.
  private def q192(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("embedding")
    val sq = aggregate(
      transform(x, v => v.cast("double") * v.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        floor(sqrt(sq) * 10000 + lit(0.5)).cast("long").as("l2_e4"),
        size(filter(x, v => abs(v.cast("double")) > lit(0.5)))
          .as("n_large"),
        floor(element_at(transform(x, v => v.cast("double") * 10000), 1)
          + lit(0.5)).cast("long").as("head_e4"))
      .orderBy("vec_id")
  }

  private val q192Oracle: String =
    """SELECT vec_id,
      |  CAST(floor(sqrt(list_sum(list_transform(embedding,
      |    v -> CAST(v AS DOUBLE) * v))) * 10000 + 0.5) AS BIGINT) AS l2_e4,
      |  CAST(len(list_filter(embedding,
      |    v -> abs(CAST(v AS DOUBLE)) > 0.5)) AS INTEGER) AS n_large,
      |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
      |    AS head_e4
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // -- q193: item-item co-occurrence recommendations ----------------------------
  // "Customers also bought": cosine-squared similarity over the basket
  // co-occurrence counts — sim²(a,b) = n_ab²/(c_a·c_b), EXACT in ppb
  // (squaring dodges the sqrt, keeping the ranking pure-integer and
  // engine-identical), top-3 partners per item via WindowGroupLimit.
  // Reuses q151's capped-basket pair machinery; the ranking frame is
  // rule-sized, never corpus-sized.
  private val RecTopK = 3
  private val RecMinPairs = 2L
  private val RecMaxItems = 20

  private def q193(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.GraphOps
    val baskets = GraphOps.cappedBaskets(
      Tables.read(spark, sfDir, "lineitem"),
      col("l_orderkey"), col("l_partkey"), RecMaxItems)
      .localCheckpoint(true)
    val itemCnt = baskets.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("c"))
    val und = GraphOps.pairsFromBaskets(baskets)
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= RecMinPairs)
    val directed = und.select(col("a").as("item"), col("b").as("rec"), col("n_ab"))
      .unionAll(und.select(col("b").as("item"), col("a").as("rec"), col("n_ab")))
    val ruleKeys = directed.select(col("item").as("pk")).distinct()
    val cnt = itemCnt.join(broadcast(ruleKeys), Seq("pk"), "left_semi")
    val w = Window.partitionBy("item")
      .orderBy(col("sim2_ppb").desc, col("rec").asc)
    directed
      .join(cnt.select(col("pk").as("item"), col("c").as("c_i")), "item")
      .join(cnt.select(col("pk").as("rec"), col("c").as("c_r")), "rec")
      .select(col("item"), col("rec"), col("n_ab"),
        expr("cast(n_ab as decimal(38,0)) * n_ab * 1000000000" +
          " div (cast(c_i as decimal(38,0)) * c_r)").as("sim2_ppb"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= RecTopK)
      .select("item", "rk", "rec", "n_ab", "sim2_ppb")
      .orderBy("item", "rk")
  }

  private val q193Oracle: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |el AS (SELECT ok FROM items GROUP BY ok HAVING count(*) <= $RecMaxItems),
       |baskets AS (SELECT ok, pk FROM items JOIN el USING (ok)),
       |ic AS (SELECT pk, count(*) AS c FROM baskets GROUP BY 1),
       |und AS (SELECT ia.pk AS a, ib.pk AS b, count(*) AS n_ab
       |  FROM baskets ia JOIN baskets ib USING (ok) WHERE ia.pk < ib.pk
       |  GROUP BY 1, 2 HAVING count(*) >= $RecMinPairs),
       |directed AS (SELECT a AS item, b AS rec, n_ab FROM und
       |  UNION ALL SELECT b, a, n_ab FROM und),
       |scored AS (SELECT item, rec, n_ab,
       |    CAST(CAST(n_ab AS HUGEINT) * n_ab * 1000000000
       |      // (CAST(ci.c AS HUGEINT) * cr.c) AS BIGINT) AS sim2_ppb
       |  FROM directed
       |  JOIN ic ci ON directed.item = ci.pk
       |  JOIN ic cr ON directed.rec = cr.pk),
       |ranked AS (SELECT item, rec, n_ab, sim2_ppb,
       |    row_number() OVER (PARTITION BY item
       |      ORDER BY sim2_ppb DESC, rec ASC) AS rk
       |  FROM scored)
       |SELECT item, CAST(rk AS INTEGER) AS rk, rec,
       |  CAST(n_ab AS BIGINT) AS n_ab, sim2_ppb
       |FROM ranked WHERE rk <= $RecTopK
       |ORDER BY item, rk""".stripMargin

  // -- q194: top-1% revenue concentration ---------------------------------------
  // The concentration readout a curation/abuse review asks for ("what
  // share of revenue comes from the top 1% of customers") — composed
  // from the distributed global rank (q166's bucketed machinery — no
  // single-partition window) plus one exact-cents aggregate. The
  // cutoff is a pure integer rank comparison, so the boundary is
  // layout- and engine-stable.
  private def q194(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.LayoutOps
    val perCust = Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("rev_u"))
    val ranked = LayoutOps.globalRank(perCust, "rev_u", "o_custkey")
      .localCheckpoint(true) // census + share aggregate share one frame
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      // top 1% by rank: rank > n - ceil(n/100) <=> (n - rank) * 100 < n
      .select(col("rev_u"), ((col("__n") - col("rank")) * 100 < col("__n"))
        .as("top1"), col("__n"))
      .groupBy("__n").pivot("top1", Seq("true", "false"))
      .agg(sum(col("rev_u")).as("rev"), count(lit(1)).as("n"))
      .select(col("__n").as("n_cust"),
        col("true_n").as("n_top"), col("true_rev").as("rev_top"),
        (col("true_rev") + col("false_rev")).as("rev_total"),
        expr("true_rev * 1000000 div (true_rev + false_rev)")
          .as("top_share_ppm"))
  }

  private val q194Oracle: String =
    """WITH pc AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev_u
      |  FROM orders GROUP BY 1),
      |r AS (SELECT rev_u,
      |    row_number() OVER (ORDER BY rev_u, o_custkey) AS rank,
      |    count(*) OVER () AS n FROM pc)
      |SELECT any_value(n) AS n_cust,
      |  count(*) FILTER ((n - rank) * 100 < n) AS n_top,
      |  CAST(sum(rev_u) FILTER ((n - rank) * 100 < n) AS BIGINT) AS rev_top,
      |  CAST(sum(rev_u) AS BIGINT) AS rev_total,
      |  CAST(sum(rev_u) FILTER ((n - rank) * 100 < n) * 1000000
      |    // sum(rev_u) AS BIGINT) AS top_share_ppm
      |FROM r""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q188_equidepth_approx", q188, Some(q188Oracle)),
    QueryDef("q189_mad_approx", q189, Some(q189Oracle)),
    QueryDef("q190_join_size_preflight", q190, Some(q190Oracle)),
    QueryDef("q191_quarantine_channel", q191, Some(q191Oracle)),
    QueryDef("q192_vector_hof_stats", q192, Some(q192Oracle)),
    QueryDef("q193_item_recs", q193, Some(q193Oracle)),
    QueryDef("q194_top_revenue_share", q194, Some(q194Oracle)))
}

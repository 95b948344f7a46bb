package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{SimilarityOps, TextOps}

/** Round-13 eighth wave: nearest-centroid classification eval (q335 —
  * the cheapest embedding classifier as a confusion census), content-
  * defined chunking (q336 — the dedup-storage primitive: hash-gated
  * token cut points, order-sensitive chunk fingerprints, per-source
  * dup ratios), greedy k-center coreset selection (q337 — the
  * data-selection loop, k scans + k-bounded driver state), and a
  * Selinger-style join-order cost enumeration (q338 — the planner
  * what-if over the 3-table star, pure stats algebra).
  */
object Round13hQueries {

  private val GridVec =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5)" +
      " AS BIGINT))"
  private val GridVecSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000" +
      " + 0.5) AS BIGINT))"

  // -- q335: nearest-centroid classification eval ------------------------------------
  // The zero-training embedding classifier: per-label mean vector on
  // the 1e-4 grid (sign-safe per-dim trunc div — label sums CAN be
  // negative), then every vector classifies to its nearest centroid
  // (squared L2, ties to the smaller label). Output is the confusion
  // census. Scale shape: the only data-sized ops are one posexplode
  // census (label × dim cells) and one broadcast-×-10 distance scan;
  // centroids are dimension-bounded.
  private def q335(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        expr(GridVec).as("xu"))
      .localCheckpoint(true) // feeds the centroid build AND the scan
    val cents = g.select(col("label"), posexplode(col("xu")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cu",
        expr("CASE WHEN s < 0 THEN -((-s) div n) ELSE s div n END"))
      .groupBy("label")
      .agg(expr("transform(sort_array(collect_list(struct(dim, cu)))," +
        " t -> t.cu)").as("c")) // 10 rows
    g.crossJoin(broadcast(cents.select(col("label").as("clabel"), col("c"))))
      .select(col("vec_id"), col("label"), col("clabel"),
        SimilarityOps.sqDistLong(col("xu"), col("c")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))))
      .where(col("rk") === 1)
      .groupBy(col("label").as("true_label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  private val q335Oracle: String =
    s"""WITH g AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    $GridVecSql AS xu FROM embeddings),
       |dims AS (SELECT label, generate_subscripts(xu, 1) AS dim,
       |    unnest(xu) AS v FROM g),
       |cent AS (SELECT label, dim, CAST(sum(v) AS BIGINT) AS s,
       |    count(*) AS n FROM dims GROUP BY 1, 2),
       |cu AS (SELECT label, dim,
       |    CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS cu
       |  FROM cent),
       |cvec AS (SELECT label AS clabel, list(cu ORDER BY dim) AS c
       |  FROM cu GROUP BY 1),
       |scored AS (SELECT vec_id, label, clabel,
       |    ${SimilarityOps.sqDistLongSql("xu", "c")} AS d2
       |  FROM g CROSS JOIN cvec),
       |best AS (SELECT vec_id, label, clabel,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rk
       |  FROM scored)
       |SELECT label AS true_label, clabel AS pred_label, count(*) AS n
       |FROM best WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q336: content-defined chunking dedup census ------------------------------------
  // The dedup-storage primitive (rsync/FastCDC shape): cut points are
  // CONTENT-defined — a token opens a new chunk when its kernel hash
  // ≡ 0 (mod 16) — so an insertion only re-chunks its neighborhood
  // instead of shifting every fixed-size block downstream. Chunk
  // fingerprints must be ORDER-sensitive (Σ relpos·h, assembled from
  // plain aggregates as Σp·h − (min p − 1)·Σh — no second window),
  // then a global fingerprint census yields per-source dup ratios.
  private def q336(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.read(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        TextOps.tokenHashesOf(TextOps.tokens(col("text"))).as("hs"))
      .select(col("source"), col("doc_id"),
        posexplode(col("hs")).as(Seq("p0", "h")))
      .select(col("source"), col("doc_id"), (col("p0") + 1).as("p"),
        col("h"),
        when(col("p0") === 0 || col("h") % 16 === 0, 1L).otherwise(0L)
          .as("cut"))
    val chunks = toks
      .withColumn("chunk", sum(col("cut")).over(
        Window.partitionBy("doc_id").orderBy("p")))
      .groupBy("source", "doc_id", "chunk")
      .agg(count(lit(1)).as("nt"),
        (sum(col("p") * col("h")) -
          (min(col("p")) - 1L) * sum(col("h"))).as("fp"))
    chunks.groupBy("source").agg(
      count(lit(1)).as("n_chunks"),
      countDistinct(col("fp")).as("n_distinct"),
      sum(col("nt")).as("n_tokens"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        expr("(n_chunks - n_distinct) * 1000000 div n_chunks")
          .as("dup_chunk_ppm"),
        expr("n_tokens * 1000 div n_chunks").as("toks_per_chunk_milli"))
      .orderBy("source")
  }

  private val q336Oracle: String = {
    val hs = TextOps.tokenHashesOfSql(TextOps.tokensSql("text"))
    s"""WITH toks AS (SELECT source, doc_id,
       |    generate_subscripts($hs, 1) AS p, unnest($hs) AS h
       |  FROM documents),
       |cuts AS (SELECT source, doc_id, p, h,
       |    CASE WHEN p = 1 OR h % 16 = 0 THEN 1 ELSE 0 END AS cut
       |  FROM toks),
       |chn AS (SELECT source, doc_id, p, h,
       |    sum(cut) OVER (PARTITION BY doc_id ORDER BY p) AS chunk
       |  FROM cuts),
       |chunks AS (SELECT source, doc_id, chunk, count(*) AS nt,
       |    CAST(sum(p * h) AS BIGINT)
       |      - (min(p) - 1) * CAST(sum(h) AS BIGINT) AS fp
       |  FROM chn GROUP BY 1, 2, 3),
       |per AS (SELECT source, count(*) AS n_chunks,
       |    count(DISTINCT fp) AS n_distinct,
       |    CAST(sum(nt) AS BIGINT) AS n_tokens
       |  FROM chunks GROUP BY 1)
       |SELECT source, n_chunks, n_distinct,
       |  CAST((n_chunks - n_distinct) * 1000000 // n_chunks AS BIGINT)
       |    AS dup_chunk_ppm,
       |  CAST(n_tokens * 1000 // n_chunks AS BIGINT) AS toks_per_chunk_milli
       |FROM per ORDER BY source""".stripMargin
  }

  // -- q337: greedy k-center coreset selection ----------------------------------------
  // The farthest-point data-selection loop (coresets, diverse
  // evaluation sets): seed at the smallest vec_id, then k−1 times pick
  // the vector FARTHEST from the chosen set (squared-L2 on the 1e-4
  // grid, ties to the smaller id) and report the covering radius
  // after each pick. Distributed shape: the running min-distance
  // column updates by ONE broadcast-literal kernel call per round over
  // the checkpointed grid frame; driver state is k·(d+1) literals —
  // the k-means discipline. The oracle unrolls the same k rounds as
  // chained CTEs.
  private val KCenters = 6

  private def q337(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr(GridVec).as("xu"))
      .localCheckpoint(true)
    def vecLit(xs: Seq[Long]) = array(xs.map(lit): _*)
    val seed = g.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("xu")).collect()(0)
    var picks = Seq((1L, seed.getLong(0)))
    var cur = g.withColumn("d", SimilarityOps.sqDistLong(col("xu"),
      vecLit(seed.getSeq[Long](1)))).localCheckpoint(true)
    var radii = Seq(cur.agg(max(col("d"))).collect()(0).getLong(0))
    var k = 2
    while (k <= KCenters) {
      val next = cur.orderBy(col("d").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("xu")).collect()(0)
      picks :+= ((k.toLong, next.getLong(0)))
      cur = cur.withColumn("d", least(col("d"),
        SimilarityOps.sqDistLong(col("xu"), vecLit(next.getSeq[Long](1)))))
        .localCheckpoint(true)
      radii :+= cur.agg(max(col("d"))).collect()(0).getLong(0)
      k += 1
    }
    picks.zip(radii).map { case ((s, id), r) => (s, id, r) }
      .toDF("step", "center_id", "radius_d2")
      .orderBy("step")
  }

  private val q337Oracle: String = {
    val dist = SimilarityOps.sqDistLongSql("b.xu", "cx")
    val steps = (2 to KCenters).map { k =>
      s"""c$k AS (SELECT xu AS cx, vec_id AS cid FROM d${k - 1}
         |  ORDER BY d DESC, vec_id LIMIT 1),
         |d$k AS (SELECT b.vec_id, b.xu, least(b.d, $dist) AS d
         |  FROM d${k - 1} b, c$k),
         |r$k AS (SELECT $k AS step, (SELECT cid FROM c$k) AS center_id,
         |  max(d) AS radius_d2 FROM d$k)""".stripMargin
    }.mkString(",\n")
    val unions = (2 to KCenters).map(k => s"SELECT * FROM r$k")
      .mkString("\nUNION ALL ")
    s"""WITH g AS (SELECT vec_id, $GridVecSql AS xu FROM embeddings),
       |c1 AS (SELECT xu AS cx, vec_id AS cid FROM g ORDER BY vec_id LIMIT 1),
       |d1 AS (SELECT b.vec_id, b.xu, $dist AS d FROM g b, c1),
       |r1 AS (SELECT 1 AS step, (SELECT cid FROM c1) AS center_id,
       |  max(d) AS radius_d2 FROM d1),
       |$steps
       |SELECT CAST(step AS BIGINT) AS step, center_id,
       |  CAST(radius_d2 AS BIGINT) AS radius_d2
       |FROM (SELECT * FROM r1
       |UNION ALL $unions) ORDER BY step""".stripMargin
  }

  // -- q338: Selinger-style join-order cost enumeration -------------------------------
  // The planner what-if over the customer⋈orders⋈lineitem star: from
  // five table stats (row counts + per-key distinct counts), estimate
  // every left-deep order's intermediate sizes with the textbook
  // |R⋈S| = |R|·|S| div max(V(R,k), V(S,k)) formula (cross products
  // cost |R|·|S|), cost = Σ intermediates. All six orders converge to
  // the same final size — the invariant that makes intermediate size
  // THE ranking signal. Pure stats algebra: three one-row aggregates
  // broadcast onto a 6-row literal frame.
  private def q338(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val st = Tables.read(spark, sfDir, "customer")
      .agg(count(lit(1)).as("nc"))
      .crossJoin(Tables.read(spark, sfDir, "orders")
        .agg(count(lit(1)).as("no"),
          countDistinct(col("o_custkey")).as("dck")))
      .crossJoin(Tables.read(spark, sfDir, "lineitem")
        .agg(count(lit(1)).as("nl"),
          countDistinct(col("l_orderkey")).as("dok")))
    val perms = Seq((1L, "C*O*L"), (2L, "O*C*L"), (3L, "O*L*C"),
      (4L, "L*O*C"), (5L, "C*L*O"), (6L, "L*C*O"))
      .toDF("perm", "order_str")
    perms.crossJoin(broadcast(st))
      .withColumn("i1", expr("CASE WHEN perm <= 2" +
        " THEN nc * no div greatest(nc, dck)" +
        " WHEN perm <= 4 THEN no * nl div greatest(no, dok)" +
        " ELSE nc * nl END"))
      .withColumn("i2", expr("CASE WHEN perm <= 2" +
        " THEN i1 * nl div greatest(no, dok)" +
        " WHEN perm <= 4 THEN i1 * nc div greatest(nc, dck)" +
        " ELSE i1 * no div greatest(nc, dck) div greatest(no, dok) END"))
      .withColumn("cost", col("i1") + col("i2"))
      .withColumn("is_best",
        col("cost") === min(col("cost")).over(Window.partitionBy()))
      .select(col("perm"), col("order_str"), col("i1"), col("i2"),
        col("cost"), col("is_best"))
      .orderBy("perm")
  }

  private val q338Oracle: String =
    """WITH st AS (SELECT
      |    (SELECT count(*) FROM customer) AS nc,
      |    (SELECT count(*) FROM orders) AS no_,
      |    (SELECT count(DISTINCT o_custkey) FROM orders) AS dck,
      |    (SELECT count(*) FROM lineitem) AS nl,
      |    (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS dok),
      |perms AS (SELECT * FROM (VALUES (1, 'C*O*L'), (2, 'O*C*L'),
      |  (3, 'O*L*C'), (4, 'L*O*C'), (5, 'C*L*O'), (6, 'L*C*O'))
      |  p(perm, order_str)),
      |sized AS (SELECT perm, order_str,
      |    CASE WHEN perm <= 2 THEN nc * no_ // greatest(nc, dck)
      |      WHEN perm <= 4 THEN no_ * nl // greatest(no_, dok)
      |      ELSE nc * nl END AS i1,
      |    nc, no_, dck, nl, dok
      |  FROM perms CROSS JOIN st),
      |costed AS (SELECT perm, order_str, i1,
      |    CASE WHEN perm <= 2 THEN i1 * nl // greatest(no_, dok)
      |      WHEN perm <= 4 THEN i1 * nc // greatest(nc, dck)
      |      ELSE i1 * no_ // greatest(nc, dck) // greatest(no_, dok)
      |      END AS i2
      |  FROM sized)
      |SELECT CAST(perm AS BIGINT) AS perm, order_str,
      |  CAST(i1 AS BIGINT) AS i1, CAST(i2 AS BIGINT) AS i2,
      |  CAST(i1 + i2 AS BIGINT) AS cost,
      |  i1 + i2 = min(i1 + i2) OVER () AS is_best
      |FROM costed ORDER BY perm""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q335_nearest_centroid", q335, Some(q335Oracle)),
    QueryDef("q336_cdc_chunking", q336, Some(q336Oracle)),
    QueryDef("q337_kcenter_coreset", q337, Some(q337Oracle)),
    QueryDef("q338_join_order_cost", q338, Some(q338Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops._

/** Round-12 eighth wave: the evaluation surfaces the engine still
  * owed — ranking quality (NDCG), graph-structure prediction and
  * shape metrics (link prediction, assortativity, per-node
  * clustering), agreement statistics (Cohen's kappa / MCC, McNemar),
  * and corpus-saturation estimators (Chao1 / Good–Turing). Everything
  * rides exact integer grids or single fixed IEEE expressions over
  * exact integers, so every result hash-matches the DuckDB oracle on
  * any partition layout.
  */
object Round12hQueries {

  import OracleHelpers.n4

  // ---- shared co-purchase graph (q146's constants, so the graph
  // family — triangles, k-core, LPA, and now link prediction /
  // assortativity / clustering census — all read the SAME graph) ----
  private val GMinQty = 40
  private val GMaxItems = 20

  /** Normalized undirected edge list (u < v) of the co-purchase
    * graph: capped-basket pair generation (ONE corpus shuffle +
    * map-side expansion — see [[GraphOps.basketPairs]]), then the
    * distinct that IS the edge set.
    */
  private def undirected(spark: SparkSession, sfDir: String): DataFrame =
    GraphOps.basketPairs(
        Tables.read(spark, sfDir, "lineitem")
          .where(col("l_quantity") >= GMinQty),
        col("l_orderkey"), col("l_partkey"), GMaxItems)
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** The same edge set in DuckDB (q146's oracle rendering: self-join
    * pair expansion + the HAVING basket cap).
    */
  private val undCte: String =
    s"""und AS (SELECT DISTINCT least(ia.pk, ib.pk) AS u,
       |    greatest(ia.pk, ib.pk) AS v
       |  FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |        FROM lineitem WHERE l_quantity >= $GMinQty) ia
       |  JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |        FROM lineitem WHERE l_quantity >= $GMinQty) ib USING (ok)
       |  JOIN (SELECT ok FROM (SELECT DISTINCT l_orderkey AS ok,
       |          l_partkey AS pk FROM lineitem
       |          WHERE l_quantity >= $GMinQty)
       |        GROUP BY ok HAVING count(*) <= $GMaxItems) el USING (ok)
       |  WHERE ia.pk <> ib.pk),
       |deg AS (SELECT node, count(*) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY 1)""".stripMargin

  // -- q263: NDCG@10 of the exact cosine retrieval ------------------------------
  // The ranking-quality grader the retrieval stack (q22 brute / q23
  // LSH / q49 IVF / q230 IVF-PQ / q232 RRF) owed: graded relevance =
  // label agreement, IDCG against the CORPUS-wide relevant count
  // (capped at k), so a query whose class has <k members is not
  // penalized for physics. Discount weights 1/log2(i+1) are
  // compile-time integer literals on a 1e-9 grid — the same constants
  // are interpolated into BOTH engines, so DCG is an order-free
  // integer sum; NDCG is an integer ppm pick. Scale shape: the only
  // corpus-sized work is q22's broadcast-query scan; everything after
  // rides ≤ k rows per query.
  private val NdcgK = 10
  private val NdcgQueries = 32
  private val discU: Seq[Long] = (1 to NdcgK)
    .map(i => math.round(1e9 / (math.log(i + 1) / math.log(2))))
  private val prefixU: Seq[Long] = discU.scanLeft(0L)(_ + _).tail

  private def q263(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val labels = emb.select(col("vec_id").as("nid"), col("label").as("nl"))
    val qs = emb.where(col("vec_id") < NdcgQueries)
    val qLabels = qs.select(col("vec_id").as("query_id"),
      col("label").as("ql"))
    val top = SimilarityOps.bruteForceTopK(emb, qs, NdcgK)
      .join(broadcast(qLabels), "query_id")
      .join(labels, col("vec_id") === col("nid"))
      .select(col("query_id"),
        (col("nl") === col("ql")).cast(LongType).as("rel"),
        element_at(typedLit(discU), col("rank")).as("disc_u"))
    val dcg = top.groupBy("query_id")
      .agg(sum(col("rel") * col("disc_u")).as("dcg_u"))
    // corpus-wide relevant count per query (self excluded)
    val nRel = qLabels.join(labels, col("nl") === col("ql"))
      .where(col("nid") =!= col("query_id"))
      .groupBy("query_id").agg(count(lit(1)).as("total_rel"))
    qLabels.select("query_id")
      .join(dcg, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("total_rel"), lit(0L)).as("total_rel"),
        coalesce(col("dcg_u"), lit(0L)).as("dcg_u"))
      .withColumn("idcg_u",
        when(col("total_rel") > 0, element_at(typedLit(prefixU),
          least(col("total_rel"), lit(NdcgK.toLong)).cast("int"))))
      .withColumn("ndcg_ppm",
        when(col("idcg_u").isNotNull, expr("dcg_u * 1000000 div idcg_u")))
      .orderBy("query_id")
  }

  private val q263Oracle: String = {
    val discVals = discU.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d}::BIGINT)" }.mkString(", ")
    val prefixList = prefixU.map(p => s"${p}::BIGINT").mkString("[", ", ", "]")
    s"""WITH c AS (SELECT vec_id, label,
       |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS ql, v AS qv
       |      FROM c WHERE vec_id < $NdcgQueries),
       |scored AS (SELECT query_id, ql, vec_id, label,
       |    ${n4(SimilarityOps.cosineSql("qv", "v"))} AS cos
       |  FROM c, q WHERE vec_id != query_id),
       |ranked AS (SELECT query_id, ql, label, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored),
       |top AS (SELECT * FROM ranked WHERE rank <= $NdcgK),
       |d(rank, disc_u) AS (VALUES $discVals),
       |dcg AS (SELECT query_id, CAST(sum(CASE WHEN label = ql
       |      THEN disc_u ELSE 0 END) AS BIGINT) AS dcg_u
       |  FROM top JOIN d USING (rank) GROUP BY 1),
       |nrel AS (SELECT query_id, count(*) AS total_rel
       |  FROM q JOIN c ON c.label = q.ql AND c.vec_id != q.query_id
       |  GROUP BY 1)
       |SELECT q.query_id,
       |  CAST(coalesce(total_rel, 0) AS BIGINT) AS total_rel,
       |  CAST(coalesce(dcg_u, 0) AS BIGINT) AS dcg_u,
       |  CASE WHEN coalesce(total_rel, 0) > 0 THEN
       |    list_extract($prefixList,
       |      CAST(least(total_rel, $NdcgK) AS INTEGER)) END AS idcg_u,
       |  CASE WHEN coalesce(total_rel, 0) > 0 THEN
       |    CAST(coalesce(dcg_u, 0) * 1000000 // list_extract($prefixList,
       |      CAST(least(total_rel, $NdcgK) AS INTEGER)) AS BIGINT)
       |    END AS ndcg_ppm
       |FROM q LEFT JOIN dcg ON dcg.query_id = q.query_id
       |LEFT JOIN nrel ON nrel.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  // -- q264: resource-allocation link prediction --------------------------------
  // Top-20 predicted co-purchase links: for every non-adjacent pair
  // (a, b), RA(a,b) = Σ_{z ∈ Γ(a)∩Γ(b)} 1/deg(z), the classic
  // common-neighbor index that down-weights promiscuous hubs. Exact
  // integers: each term is 1e12 div deg(z). Scale shape: wedges are
  // generated per CENTER z (adjacency self-join keyed on z), so the
  // fan-out is Σ deg(z)² — bounded by dropping centers with
  // deg > HubCap, which is principled here because a hub's RA
  // contribution (1/deg) is by construction negligible; the cap is
  // part of the op's contract and the oracle replays it. The
  // anti-join against the edge set removes already-linked pairs.
  private val HubCap = 64
  private val RaTopK = 20

  private def q264(spark: SparkSession, sfDir: String): DataFrame = {
    val und = undirected(spark, sfDir).localCheckpoint(true)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val adj = und.select(col("u").as("z"), col("v").as("n"))
      .unionAll(und.select(col("v").as("z"), col("u").as("n")))
      .join(deg.select(col("node").as("z"), col("deg").as("dz")), "z")
      .where(col("dz") <= HubCap)
    val wedges = adj.select(col("z"), col("dz"), col("n").as("a"))
      .join(adj.select(col("z"), col("n").as("b")), "z")
      .where(col("a") < col("b"))
    val cand = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("common_n"),
        sum(expr("1000000000000 div dz")).as("ra_u"))
    cand.join(und, cand("a") === und("u") && cand("b") === und("v"),
        "left_anti")
      .orderBy(col("ra_u").desc, col("a"), col("b"))
      .limit(RaTopK)
  }

  private val q264Oracle: String =
    s"""WITH $undCte,
       |adj AS (SELECT z, n, deg AS dz FROM (
       |    SELECT u AS z, v AS n FROM und
       |    UNION ALL SELECT v, u FROM und) a
       |  JOIN deg ON deg.node = a.z
       |  WHERE deg <= $HubCap),
       |wedges AS (SELECT w1.n AS a, w2.n AS b, w1.dz
       |  FROM adj w1 JOIN adj w2 ON w1.z = w2.z AND w1.n < w2.n),
       |cand AS (SELECT a, b, count(*) AS common_n,
       |    CAST(sum(1000000000000 // dz) AS BIGINT) AS ra_u
       |  FROM wedges GROUP BY 1, 2)
       |SELECT a, b, common_n, ra_u FROM cand
       |WHERE NOT EXISTS (SELECT 1 FROM und
       |  WHERE und.u = cand.a AND und.v = cand.b)
       |ORDER BY ra_u DESC, a, b LIMIT $RaTopK""".stripMargin

  // -- q265: degree assortativity ------------------------------------------------
  // Do high-degree parts co-purchase with other high-degree parts?
  // Pearson correlation of endpoint degrees over the DIRECTED edge
  // multiset (each undirected edge contributes both orientations, the
  // standard Newman definition — which makes the x and y marginals
  // identical, so the correlation denominator needs NO sqrt and the
  // whole statistic is ONE fixed division over exact BIGINT sums).
  private def q265(spark: SparkSession, sfDir: String): DataFrame = {
    val und = undirected(spark, sfDir).localCheckpoint(true)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val pairs = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("du").as("x"), col("dv").as("y"))
    val both = pairs.unionAll(pairs.select(col("y").as("x"),
      col("x").as("y")))
    both.agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"))
      .select(col("n_pairs"), col("sum_x"), col("sum_xx"), col("sum_xy"),
        // one fixed IEEE expression over exact integers (the
        // symmetric marginals collapse the denominator to n·Σx²−(Σx)²)
        ((col("n_pairs").cast("double") * col("sum_xy").cast("double") -
          col("sum_x").cast("double") * col("sum_x").cast("double")) /
          (col("n_pairs").cast("double") * col("sum_xx").cast("double") -
            col("sum_x").cast("double") * col("sum_x").cast("double")))
          .as("assortativity"))
  }

  private val q265Oracle: String =
    s"""WITH $undCte,
       |pairs AS (SELECT da.deg AS x, db.deg AS y FROM und
       |  JOIN deg da ON da.node = und.u
       |  JOIN deg db ON db.node = und.v),
       |dirpairs AS (SELECT x, y FROM pairs UNION ALL SELECT y, x FROM pairs),
       |s AS (SELECT count(*) AS n_pairs,
       |    CAST(sum(x) AS BIGINT) AS sum_x,
       |    CAST(sum(x * x) AS BIGINT) AS sum_xx,
       |    CAST(sum(x * y) AS BIGINT) AS sum_xy
       |  FROM dirpairs)
       |SELECT n_pairs, sum_x, sum_xx, sum_xy,
       |  (CAST(n_pairs AS DOUBLE) * CAST(sum_xy AS DOUBLE)
       |    - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
       |  / (CAST(n_pairs AS DOUBLE) * CAST(sum_xx AS DOUBLE)
       |    - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
       |  AS assortativity
       |FROM s""".stripMargin

  // -- q266: local clustering-coefficient census ---------------------------------
  // Per-node neighborhood density — q146 published only the GLOBAL
  // coefficient; curation wants the distribution (a corpus whose
  // item graph is all 0-coefficient stars is a very different beast
  // from one full of cliques). Triangles are enumerated ONCE via the
  // same degree-oriented O(m^{3/2}) join as q146, then credited to
  // all three corners map-side (explode). Census rows: coefficient
  // decile bucket → node count + exact mean coefficient ppm.
  private def q266(spark: SparkSession, sfDir: String): DataFrame = {
    val und = undirected(spark, sfDir).localCheckpoint(true)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .localCheckpoint(true) // read 3x by the wedge/close joins
    val triCorners = oriented.select(col("src").as("x"), col("dst").as("y"))
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), "y")
      .join(oriented.select(col("src").as("x"), col("dst").as("z")),
        Seq("x", "z"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(triCorners, Seq("node"), "left")
      .where(col("deg") >= 2)
      .select(col("node"),
        (coalesce(col("tri"), lit(0L)) * 2L * 1000000L).as("num"),
        (col("deg") * (col("deg") - 1)).as("den"))
      .select(expr("num div den").as("cc_ppm"))
      .groupBy(expr("cc_ppm div 100000").as("decile"))
      .agg(count(lit(1)).as("n_nodes"),
        expr("sum(cc_ppm) div count(1)").as("mean_cc_ppm"))
      .orderBy("decile")
  }

  private val q266Oracle: String =
    s"""WITH $undCte,
       |ori AS (SELECT
       |    CASE WHEN (da.deg, und.u) < (db.deg, und.v)
       |         THEN und.u ELSE und.v END AS src,
       |    CASE WHEN (da.deg, und.u) < (db.deg, und.v)
       |         THEN und.v ELSE und.u END AS dst
       |  FROM und JOIN deg da ON und.u = da.node
       |  JOIN deg db ON und.v = db.node),
       |tri AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       |  FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
       |  JOIN ori e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |corners AS (SELECT node, count(*) AS t FROM (
       |    SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY 1),
       |cc AS (SELECT CAST(coalesce(t, 0) * 2 * 1000000
       |      // (deg * (deg - 1)) AS BIGINT) AS cc_ppm
       |  FROM deg LEFT JOIN corners ON corners.node = deg.node
       |  WHERE deg >= 2)
       |SELECT CAST(cc_ppm // 100000 AS BIGINT) AS decile,
       |  count(*) AS n_nodes,
       |  CAST(sum(cc_ppm) // count(*) AS BIGINT) AS mean_cc_ppm
       |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q267: Cohen's kappa + Matthews correlation --------------------------------
  // Chance-corrected agreement for q161's classifier eval (F1 alone
  // overstates skill on imbalanced labels — exactly this corpus).
  // Identical scoring pipeline and confusion derivation as q161
  // (logreg scores, median threshold); kappa and MCC are then single
  // fixed IEEE expressions over the four exact counts (kappa/MCC can
  // be negative, so integer div — which truncates differently across
  // engines below zero — is NOT used; po/pe stay exact ppm).
  private def q267(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    val scored = TrainOps.logregScore(docs, "doc_id", "text",
      (col("lang") === "en").cast("int"), iters = 3, lr = 0.5)
    val labeled = docs.select(col("doc_id"),
      (col("lang") === "en").cast("int").as("y"))
    val joined = scored.join(labeled, "doc_id").localCheckpoint(true)
    val cut = joined.agg(percentile(col("p4"), lit(0.5)).as("__cut"))
    val conf = joined.crossJoin(broadcast(cut))
      .select(col("y"), (col("p4") > col("__cut")).cast("int").as("pred"))
      .agg(
        sum((col("pred") * col("y")).cast("long")).as("tp"),
        sum((col("pred") * (lit(1) - col("y"))).cast("long")).as("fp"),
        sum(((lit(1) - col("pred")) * col("y")).cast("long")).as("fn"),
        sum(((lit(1) - col("pred")) * (lit(1) - col("y"))).cast("long"))
          .as("tn"))
    conf.select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)").as("po_ppm"),
        expr("((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) * 1000000" +
          " div ((tp + fp + fn + tn) * (tp + fp + fn + tn))").as("pe_ppm"),
        // kappa = (n·(tp+tn) − pe_num) / (n² − pe_num), exact-int inputs
        expr("""CAST((tp + fp + fn + tn) * (tp + tn)
            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)
          / CAST((tp + fp + fn + tn) * (tp + fp + fn + tn)
            - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)""")
          .as("kappa"),
        expr("""CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
          THEN CAST(tp * tn - fp * fn AS DOUBLE)
            / sqrt((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE))
              * (CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))
          END""").as("mcc"))
  }

  private val q267Oracle: String = {
    val scored = TrainOps.logregScoreSql("documents", "doc_id", "text",
      "CASE WHEN lang = 'en' THEN 1 ELSE 0 END", iters = 3, lr = 0.5)
    s"""WITH __scored AS ($scored),
       |__j AS (SELECT s.p4, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM __scored s JOIN documents d ON s.doc_id = d.doc_id),
       |__cut AS (SELECT quantile_cont(p4, 0.5) AS cut FROM __j),
       |__p AS (SELECT y, CASE WHEN p4 > cut THEN 1 ELSE 0 END AS pred
       |  FROM __j CROSS JOIN __cut),
       |__c AS (SELECT
       |    CAST(sum(pred * y) AS BIGINT) AS tp,
       |    CAST(sum(pred * (1 - y)) AS BIGINT) AS fp,
       |    CAST(sum((1 - pred) * y) AS BIGINT) AS fn,
       |    CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn
       |  FROM __p)
       |SELECT tp, fp, fn, tn,
       |  CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT)
       |    AS po_ppm,
       |  CAST(((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) * 1000000
       |    // ((tp + fp + fn + tn) * (tp + fp + fn + tn)) AS BIGINT)
       |    AS pe_ppm,
       |  CAST((tp + fp + fn + tn) * (tp + tn)
       |      - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)
       |    / CAST((tp + fp + fn + tn) * (tp + fp + fn + tn)
       |      - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) AS DOUBLE)
       |    AS kappa,
       |  CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
       |    THEN CAST(tp * tn - fp * fn AS DOUBLE)
       |      / sqrt((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE))
       |        * (CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))
       |    END AS mcc
       |FROM __c""".stripMargin
  }

  // -- q268: vocabulary-richness estimators (Chao1 / Good–Turing) -----------------
  // Corpus-saturation telemetry for tokenizer/dedup planning: how much
  // vocabulary is still unseen? Chao1 richness = V + f1(f1−1)/(2(f2+1))
  // (on a ×10 grid for the half-integer), Good–Turing unseen-mass
  // estimate = f1/N, singleton share = f1/V — all from ONE token
  // census (the frequency-of-frequencies frame is ≤ max-count rows).
  private def q268(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.read(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .where(length(col("t")) > 0)
      .groupBy("t").agg(count(lit(1)).as("c"))
    toks.agg(count(lit(1)).as("vocab"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("n_tokens"), col("f1"), col("f2"),
        expr("10 * vocab + 10 * f1 * (f1 - 1) div (2 * (f2 + 1))")
          .as("chao1_x10"),
        expr("f1 * 1000000 div n_tokens").as("gt_unseen_ppm"),
        expr("f1 * 1000000 div vocab").as("singleton_share_ppm"))
  }

  private val q268Oracle: String =
    s"""WITH toks AS (SELECT t, count(*) AS c FROM (
       |    SELECT unnest(${TextOps.tokensSql("text")}) AS t
       |    FROM documents) WHERE length(t) > 0 GROUP BY 1),
       |s AS (SELECT count(*) AS vocab,
       |    CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
       |  FROM toks)
       |SELECT vocab, n_tokens, f1, f2,
       |  CAST(10 * vocab + 10 * f1 * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT)
       |    AS chao1_x10,
       |  CAST(f1 * 1000000 // n_tokens AS BIGINT) AS gt_unseen_ppm,
       |  CAST(f1 * 1000000 // vocab AS BIGINT) AS singleton_share_ppm
       |FROM s""".stripMargin

  // -- q269: McNemar paired-classifier test ----------------------------------------
  // Are two quality gates interchangeable? Two deterministic document
  // classifiers (char-length gate vs whitespace-token gate) predict
  // lang = 'en'; McNemar looks ONLY at the discordant cells of the
  // paired confusion (b = A right / B wrong, c = A wrong / B right) —
  // the matched-pairs test an unpaired χ² gets wrong. Statistic is the
  // continuity-corrected (|b−c|−1)²/(b+c) on a 1e6 micro-grid.
  private val McLenCut = 300
  private val McTokCut = 50

  private def q269(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
      .select((col("lang") === "en").cast("int").as("y"),
        (col("n_chars") >= McLenCut).cast("int").as("pa"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          >= McTokCut).cast("int").as("pb"))
      .select(
        (col("pa") === col("y")).cast("long").as("ra"),
        (col("pb") === col("y")).cast("long").as("rb"))
    d.agg(
        sum(col("ra") * col("rb")).as("n11"),
        sum(col("ra") * (lit(1L) - col("rb"))).as("n10"),
        sum((lit(1L) - col("ra")) * col("rb")).as("n01"),
        sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("n00"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("n10") + col("n01") > 0,
          expr("(abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1000000" +
            " div (n10 + n01)")).as("chi2_u"))
  }

  private val q269Oracle: String =
    s"""WITH p AS (SELECT
       |    CASE WHEN (n_chars >= $McLenCut)
       |      = (lang = 'en') THEN 1 ELSE 0 END AS ra,
       |    CASE WHEN (length(text) - length(replace(text, ' ', ''))
       |      >= $McTokCut) = (lang = 'en') THEN 1 ELSE 0 END AS rb
       |  FROM documents),
       |c AS (SELECT
       |    CAST(sum(ra * rb) AS BIGINT) AS n11,
       |    CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
       |    CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
       |    CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
       |  FROM p)
       |SELECT n11, n10, n01, n00,
       |  CASE WHEN n10 + n01 > 0 THEN
       |    CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1000000
       |      // (n10 + n01) AS BIGINT) END AS chi2_u
       |FROM c""".stripMargin

  // -- q270: Davies–Bouldin cluster-quality index ----------------------------------
  // Grades q76's k-means (and by extension the q49/q230 IVF layout it
  // trains): per-cluster scatter vs pairwise centroid separation, all
  // distances on the proven n4+sqrt integer grid, everything past the
  // ONE k-group scatter aggregate riding k-row frames. See
  // [[SimilarityOps.daviesBouldin]].
  private def q270(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.daviesBouldin(
      Tables.read(spark, sfDir, "embeddings"), k = 4, iters = 2)

  private val q270Oracle: String =
    SimilarityOps.daviesBouldinSql("embeddings", k = 4, iters = 2)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q263_ndcg_eval", q263, Some(q263Oracle)),
    QueryDef("q264_link_predict", q264, Some(q264Oracle)),
    QueryDef("q265_assortativity", q265, Some(q265Oracle)),
    QueryDef("q266_clustering_coeff", q266, Some(q266Oracle)),
    QueryDef("q267_kappa_mcc", q267, Some(q267Oracle)),
    QueryDef("q268_vocab_richness", q268, Some(q268Oracle)),
    QueryDef("q269_mcnemar", q269, Some(q269Oracle)),
    QueryDef("q270_davies_bouldin", q270, Some(q270Oracle)))
}

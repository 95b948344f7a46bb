package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-13 sixteenth wave: LLM-watermark detection (q367 — green-list
  * token bias as an exact z² census), 1-D Wasserstein distance (q368 —
  * earth-mover between value distributions, exact on the merged value
  * spine), k-truss edge support (q369 — triangle support census over
  * the strong-edge co-supply graph), and a learning-curve harness
  * (q370 — nearest-centroid accuracy vs training fraction).
  */
object Round13pQueries {

  // -- q367: LLM-watermark detection ---------------------------------------------------------
  // The Kirchenbauer-style detector: a watermarking sampler biases
  // each token toward a "green list" seeded by the PREVIOUS token, so
  // detection asks whether green membership (here: packed bigram
  // fingerprint parity — exactly the seeded-by-context shape) beats
  // the 50% null. z² = (2g−n)²/n stays fully integer on the milli
  // grid; per-source censuses, tokens bound once (the q294 contract).
  private def q367(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = Tables.read(spark, sfDir, "documents")
      .select(col("source"),
        TextOps.bigramFpsOf(TextOps.tokens(col("text"))).as("fps"))
      .select(col("source"), explode(col("fps")).as("fp"))
    perDoc.groupBy("source").agg(count(lit(1)).as("n"),
      sum(when(col("fp") % 2 === 0, 1L).otherwise(0L)).as("g"))
      .select(col("source"), col("n"), col("g"),
        expr("g * 1000000 div n").as("green_ppm"),
        expr("CAST((2 * g - n) AS DECIMAL(38,0)) * (2 * g - n) * 1000" +
          " div n").as("z2_milli"))
      .withColumn("flagged", col("z2_milli") > 4000L) // |z| > 2
      .orderBy("source")
  }

  private val q367Oracle: String = {
    val th = TextOps.tokenHashesOfSql(TextOps.tokensSql("text"))
    s"""WITH th AS (SELECT source, $th AS hs FROM documents),
       |fps AS (SELECT source,
       |    unnest(${TextOps.bigramFpsOfSql("hs")}) AS fp FROM th),
       |census AS (SELECT source, count(*) AS n,
       |    count(CASE WHEN fp % 2 = 0 THEN 1 END) AS g
       |  FROM fps GROUP BY 1)
       |SELECT source, n, CAST(g AS BIGINT) AS g,
       |  CAST(g * 1000000 // n AS BIGINT) AS green_ppm,
       |  CAST(CAST(2 * g - n AS HUGEINT) * (2 * g - n) * 1000 // n
       |    AS BIGINT) AS z2_milli,
       |  CAST(2 * g - n AS HUGEINT) * (2 * g - n) * 1000 // n > 4000
       |    AS flagged
       |FROM census ORDER BY source""".stripMargin
  }

  // -- q368: 1-D Wasserstein distance ----------------------------------------------------------
  // Earth-mover between the 'click' value distribution and every other
  // type: W₁ = ∫|F_a − F_b| dv, evaluated EXACTLY on the merged
  // value-grain spine — |F_a − F_b| = |cumA·n_b − cumB·n_a|/(n_a·n_b)
  // keeps everything integer until one final milli-grid division.
  // Detects shape drift that mean/median tests miss; value-grain, so
  // the spine is bounded by distinct cents, not rows.
  private val WassBase = "click"

  private def q368(spark: SparkSession, sfDir: String): DataFrame = {
    val cens = Tables.read(spark, sfDir, "events")
      .select(col("event_type").as("ty"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .groupBy("ty", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds the totals AND every pair's spine
    val tot = cens.groupBy("ty").agg(sum(col("cnt")).as("nt"))
    val others = tot.where(col("ty") =!= WassBase)
      .select(col("ty").as("tyb"), col("nt").as("nb"))
    val base = tot.where(col("ty") === WassBase)
      .select(col("nt").as("na"))
    val merged = others.select(col("tyb"))
      .join(cens, col("ty") === WassBase || col("ty") === col("tyb"))
      .groupBy(col("tyb"), col("v"))
      .agg(sum(when(col("ty") === WassBase, col("cnt")).otherwise(0L))
        .as("ca"),
        sum(when(col("ty") =!= WassBase, col("cnt")).otherwise(0L))
          .as("cb"))
    val w = Window.partitionBy("tyb").orderBy("v")
    val cum = merged
      .withColumn("cuma", sum(col("ca")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumb", sum(col("cb")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dv", lead("v", 1).over(w) - col("v"))
      .where(col("dv").isNotNull)
    cum.join(broadcast(others), "tyb").crossJoin(broadcast(base))
      .withColumn("term",
        expr("CAST(abs(cuma * nb - cumb * na) AS DECIMAL(38,0)) * dv"))
      .groupBy("tyb", "na", "nb").agg(sum(col("term")).as("s"))
      .select(col("tyb"), col("na"), col("nb"),
        expr("CAST(s * 1000 div (CAST(na AS DECIMAL(38,0)) * nb)" +
          " AS BIGINT)").as("w1_milli_cents"))
      .orderBy("tyb")
  }

  private val q368Oracle: String =
    s"""WITH cens AS (SELECT event_type AS ty,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |tot AS (SELECT ty, CAST(sum(cnt) AS BIGINT) AS nt FROM cens
       |  GROUP BY 1),
       |oth AS (SELECT ty AS tyb, nt AS nb FROM tot WHERE ty <> '$WassBase'),
       |bs AS (SELECT nt AS na FROM tot WHERE ty = '$WassBase'),
       |mg AS (SELECT tyb, v,
       |    CAST(sum(CASE WHEN ty = '$WassBase' THEN cnt ELSE 0 END)
       |      AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN ty <> '$WassBase' THEN cnt ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM oth JOIN cens ON ty = '$WassBase' OR ty = tyb
       |  GROUP BY 1, 2),
       |cum AS (SELECT tyb, v,
       |    sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
       |    lead(v) OVER (PARTITION BY tyb ORDER BY v) - v AS dv
       |  FROM mg WINDOW w AS (PARTITION BY tyb ORDER BY v
       |    ROWS UNBOUNDED PRECEDING)),
       |terms AS (SELECT tyb, nb, na,
       |    CAST(abs(cuma * nb - cumb * na) AS HUGEINT) * dv AS term
       |  FROM cum JOIN oth USING (tyb) CROSS JOIN bs
       |  WHERE dv IS NOT NULL)
       |SELECT tyb, na, nb,
       |  CAST(sum(term) * 1000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
       |    AS w1_milli_cents
       |FROM terms GROUP BY tyb, na, nb ORDER BY tyb""".stripMargin

  // -- q369: k-truss edge support ----------------------------------------------------------------
  // Cohesion beyond triangles-per-node: every edge's SUPPORT (the
  // triangles containing it) over the strong co-supply graph, as a
  // support histogram with the reverse-cumulative k-truss membership
  // counts. "Strong" is a RANK cut — the top-K edges by weight — not
  // an absolute count threshold: a fixed `w ≥ c` cutoff silently
  // admits EVERY edge once volume grows (measured: 24% of edges at
  // sf0.1, 100% at 10×), the min-count scale trap; the top-K graph is
  // bounded at any data size. Triangle enumeration is the oriented
  // a<b<c join; each triangle credits its three edges via one explode.
  private val TrussTopEdges = 20000

  private def q369(spark: SparkSession, sfDir: String): DataFrame = {
    val os = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = os.join(os.select(col("ok"), col("sk").as("skb")), "ok")
      .where(col("sk") < col("skb"))
      .groupBy("sk", "skb").agg(count(lit(1)).as("w"))
      .orderBy(col("w").desc, col("sk"), col("skb"))
      .limit(TrussTopEdges)
      .select(col("sk").as("a"), col("skb").as("b"))
      .localCheckpoint(true) // feeds 3 triangle sides + the census
    val tri = edges
      .join(edges.select(col("a").as("b"), col("b").as("c")), "b")
      .join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val support = tri.select(explode(expr(
      "array(struct(a AS x, b AS y), struct(a AS x, c AS y)," +
        " struct(b AS x, c AS y))")).as("e"))
      .groupBy(col("e.x").as("a"), col("e.y").as("b"))
      .agg(count(lit(1)).as("support"))
    val perEdge = edges.join(support, Seq("a", "b"), "left")
      .select(coalesce(col("support"), lit(0L)).as("support"))
    val hist = perEdge.groupBy("support").agg(count(lit(1)).as("n_edges"))
    hist.withColumn("edges_with_ge",
      sum(col("n_edges")).over(Window.orderBy(col("support").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("support")
  }

  private val q369Oracle: String =
    s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
       |  FROM lineitem),
       |edges AS (SELECT sk AS a, skb AS b FROM (
       |  SELECT x.sk, y.sk AS skb, count(*) AS w
       |  FROM os x JOIN os y ON x.ok = y.ok AND x.sk < y.sk
       |  GROUP BY 1, 2) ORDER BY w DESC, sk, skb LIMIT $TrussTopEdges),
       |tri AS (SELECT e1.a, e1.b, e2.b AS c
       |  FROM edges e1 JOIN edges e2 ON e1.b = e2.a
       |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
       |sup AS (SELECT x, y, count(*) AS support FROM (
       |    SELECT a AS x, b AS y FROM tri
       |    UNION ALL SELECT a, c FROM tri
       |    UNION ALL SELECT b, c FROM tri) GROUP BY 1, 2),
       |per AS (SELECT coalesce(support, 0) AS support
       |  FROM edges LEFT JOIN sup ON a = x AND b = y),
       |hist AS (SELECT support, count(*) AS n_edges FROM per GROUP BY 1)
       |SELECT support, n_edges,
       |  CAST(sum(n_edges) OVER (ORDER BY support DESC
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS edges_with_ge
       |FROM hist ORDER BY support""".stripMargin

  // -- q370: learning-curve harness ----------------------------------------------------------------
  // Does more data still help? Nearest-centroid accuracy at 25/50/100%
  // of the training pool (hash-split so membership is a pure
  // projection; the eval 20% is FIXED across fractions), per fraction
  // — the eval-harness shape behind every "collect more data?"
  // decision. Centroid builds ride one dim census keyed by (fraction,
  // label); the eval scan broadcasts all 3 centroid sets at once.
  private val CurveFracs = Seq(25L, 50L, 100L)

  private def q370(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
          " * 10000 + 0.5) AS BIGINT))").as("xu"),
        expr("((((vec_id*1103515245 + 12345) % 2147483648) * 1103515245" +
          " + 54321) % 2147483648) % 100 AS h").as("h"))
      .localCheckpoint(true) // feeds train dims AND the eval scan
    val fracs = CurveFracs.toDF("frac")
    val train = g.where(col("h") < 80)
      .crossJoin(broadcast(fracs))
      .where(expr("h * 100 < 80 * frac")) // h < 80·frac/100, integer
    val cents = train
      .select(col("frac"), col("label"), posexplode(col("xu"))
        .as(Seq("dim", "v")))
      .groupBy("frac", "label", "dim")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("cu",
        expr("CASE WHEN s < 0 THEN -((-s) div n) ELSE s div n END"))
      .groupBy("frac", "label")
      .agg(expr("transform(sort_array(collect_list(struct(dim, cu)))," +
        " t -> t.cu)").as("c"))
    val nTrain = train.groupBy("frac").agg(count(lit(1)).as("n_train"))
    val evalSet = g.where(col("h") >= 80)
    val pred = evalSet.crossJoin(broadcast(cents
      .select(col("frac"), col("label").as("clabel"), col("c"))))
      .select(col("frac"), col("vec_id"), col("label"), col("clabel"),
        graft.ops.SimilarityOps.sqDistLong(col("xu"), col("c")).as("d2"))
      .withColumn("rk", row_number().over(Window.partitionBy("frac",
        "vec_id").orderBy(col("d2"), col("clabel"))))
      .where(col("rk") === 1)
    pred.groupBy("frac").agg(count(lit(1)).as("n_eval"),
      sum(when(col("label") === col("clabel"), 1L).otherwise(0L))
        .as("n_correct"))
      .join(broadcast(nTrain), "frac")
      .select(col("frac"), col("n_train"), col("n_eval"),
        expr("n_correct * 1000000 div n_eval").as("acc_ppm"))
      .orderBy("frac")
  }

  private val q370Oracle: String = {
    val fr = CurveFracs.map(f => s"($f)").mkString(",")
    val gridded = "list_transform(embedding, x -> CAST(floor(" +
      "CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"
    val dist = graft.ops.SimilarityOps.sqDistLongSql("xu", "c")
    s"""WITH g AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    $gridded AS xu,
       |    ((((vec_id*1103515245 + 12345) % 2147483648) * 1103515245
       |      + 54321) % 2147483648) % 100 AS h
       |  FROM embeddings),
       |fr AS (SELECT CAST(frac AS BIGINT) AS frac FROM (VALUES $fr)
       |  f(frac)),
       |train AS (SELECT frac, label, xu FROM g CROSS JOIN fr
       |  WHERE h < 80 AND h * 100 < 80 * frac),
       |dims AS (SELECT frac, label, generate_subscripts(xu, 1) AS dim,
       |    unnest(xu) AS v FROM train),
       |cu AS (SELECT frac, label, dim,
       |    CASE WHEN sum(v) < 0 THEN -((-CAST(sum(v) AS BIGINT)) // count(*))
       |      ELSE CAST(sum(v) AS BIGINT) // count(*) END AS cu
       |  FROM dims GROUP BY 1, 2, 3),
       |cents AS (SELECT frac, label AS clabel, list(cu ORDER BY dim) AS c
       |  FROM cu GROUP BY 1, 2),
       |ntr AS (SELECT frac, count(*) AS n_train FROM train GROUP BY 1),
       |ev AS (SELECT vec_id, label, xu FROM g WHERE h >= 80),
       |scored AS (SELECT frac, vec_id, label, clabel, $dist AS d2
       |  FROM ev CROSS JOIN cents),
       |best AS (SELECT frac, vec_id, label, clabel, row_number() OVER (
       |    PARTITION BY frac, vec_id ORDER BY d2, clabel) AS rk
       |  FROM scored)
       |SELECT frac, n_train, count(*) AS n_eval,
       |  CAST(count(CASE WHEN label = clabel THEN 1 END) * 1000000
       |    // count(*) AS BIGINT) AS acc_ppm
       |FROM best JOIN ntr USING (frac) WHERE rk = 1
       |GROUP BY frac, n_train ORDER BY frac""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q367_watermark_detect", q367, Some(q367Oracle)),
    QueryDef("q368_wasserstein_1d", q368, Some(q368Oracle)),
    QueryDef("q369_ktruss_support", q369, Some(q369Oracle)),
    QueryDef("q370_learning_curve", q370, Some(q370Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 wave: operability + distribution analytics a curation
  * pipeline runs on top of the existing censuses —
  *
  *  - q397: CUSUM changepoint with one binary-segmentation split
  *    (where did the daily revenue level shift, and where within each
  *    half) — exact integer cross-mult statistic on the calendar-grain
  *    census.
  *  - q398: k-anonymity / l-diversity audit over quasi-identifiers —
  *    the privacy census a dataset release runs before publication.
  *  - q399: Pareto frontier (skyline) of documents under two
  *    objectives, with the distributed two-level (local-frontier →
  *    merge) plan verified against the direct frontier.
  *  - q400: pairwise Jensen-Shannon divergence between source unigram
  *    distributions — the corpus-mix drift matrix, exact integer
  *    ratios under the q374 micro-nat grid discipline.
  */
object Round15Queries {

  // -- q397: CUSUM changepoint + binary segmentation ------------------------------------
  // Level-shift detection on the day-grain revenue census: the
  // centered CUSUM D_j = m*S_j - j*S_m (exact, DECIMAL) peaks at the
  // changepoint; the best split k then recurses once into [1,k] and
  // [k+1,m]. All windows run on the calendar-bounded day census
  // (~2.5k rows at ANY SF), never on row-grain data; ties break on
  // the earlier day. Segments shorter than 2 days emit no row.
  private def q397(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .as("rev"))
    val wd = Window.orderBy("day")
    val cum = daily
      .withColumn("i", row_number().over(wd).cast("long"))
      .withColumn("s", sum(col("rev")).over(wd))
      .localCheckpoint(true) // feeds root pick AND all three segments
    val tot = cum.agg(max(col("i")).as("n"), max(col("s")).as("st"))
    // root changepoint k = argmax |D| (tie -> earlier day)
    val rootd = cum.crossJoin(broadcast(tot)).where(col("i") < col("n"))
      .withColumn("d", expr("abs(CAST(n AS DECIMAL(38,0)) * s" +
        " - CAST(i AS DECIMAL(38,0)) * st)"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("d").desc, col("day"))))
    val rt = rootd.where(col("rn") === 1)
      .select(col("i").as("k"), col("s").as("sk"), col("n"), col("st"))
    // three segments as (seg, lo, hi, sp): sp = cumulative sum at lo-1
    val segs = rt.selectExpr("'root' AS seg", "CAST(1 AS BIGINT) AS lo",
        "n AS hi", "CAST(0 AS BIGINT) AS sp")
      .unionAll(rt.selectExpr("'left' AS seg", "CAST(1 AS BIGINT) AS lo",
        "k AS hi", "CAST(0 AS BIGINT) AS sp"))
      .unionAll(rt.selectExpr("'right' AS seg", "k + 1 AS lo", "n AS hi",
        "sk AS sp"))
    val segt = segs.join(cum.select(col("i").as("hi"), col("s").as("sh")),
        "hi")
      .select(col("seg"), col("lo"), col("hi"), col("sp"),
        (col("sh") - col("sp")).as("stot"),
        (col("hi") - col("lo") + 1).as("m"))
    val sc = cum.crossJoin(broadcast(segt))
      .where(col("i") >= col("lo") && col("i") <= col("hi"))
      .select(col("seg"), col("day"),
        (col("i") - col("lo") + 1).as("j"),
        (col("s") - col("sp")).as("ss"), col("m"), col("stot"))
      .where(col("j") < col("m"))
      .withColumn("d", expr("abs(CAST(m AS DECIMAL(38,0)) * ss" +
        " - CAST(j AS DECIMAL(38,0)) * stot)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("seg").orderBy(col("d").desc, col("day"))))
    sc.where(col("rn") === 1)
      .select(col("seg"), col("day").as("cp_day"),
        expr("CAST(d div m AS BIGINT)").as("cusum_c"),
        expr("ss div j").as("pre_mean_c"),
        expr("(stot - ss) div (m - j)").as("post_mean_c"))
      .orderBy("seg")
  }

  private[queries] val q397Oracle: String =
    """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |cum AS (SELECT day, rev,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
      |    CAST(sum(rev) OVER (ORDER BY day) AS BIGINT) AS s
      |  FROM daily),
      |tot AS (SELECT max(i) AS n, max(s) AS st FROM cum),
      |rootd AS (SELECT day, i, s, n, st,
      |    row_number() OVER (ORDER BY
      |      abs(CAST(n AS HUGEINT) * s - CAST(i AS HUGEINT) * st) DESC,
      |      day) AS rn
      |  FROM cum, tot WHERE i < n),
      |rt AS (SELECT i AS k, s AS sk, n, st FROM rootd WHERE rn = 1),
      |segs AS (SELECT 'root' AS seg, CAST(1 AS BIGINT) AS lo, n AS hi,
      |    CAST(0 AS BIGINT) AS sp FROM rt
      |  UNION ALL SELECT 'left', CAST(1 AS BIGINT), k, CAST(0 AS BIGINT)
      |    FROM rt
      |  UNION ALL SELECT 'right', k + 1, n, sk FROM rt),
      |segt AS (SELECT seg, lo, hi, sp, c.s - sp AS stot,
      |    hi - lo + 1 AS m
      |  FROM segs JOIN cum c ON c.i = segs.hi),
      |sc AS (SELECT seg, day, i - lo + 1 AS j, s - sp AS ss, m, stot
      |  FROM segt JOIN cum ON i >= lo AND i <= hi
      |  WHERE i - lo + 1 < m),
      |dd AS (SELECT seg, day, j, ss, m, stot,
      |    abs(CAST(m AS HUGEINT) * ss - CAST(j AS HUGEINT) * stot) AS d,
      |    row_number() OVER (PARTITION BY seg ORDER BY
      |      abs(CAST(m AS HUGEINT) * ss - CAST(j AS HUGEINT) * stot)
      |      DESC, day) AS rn
      |  FROM sc)
      |SELECT seg, day AS cp_day, CAST(d // m AS BIGINT) AS cusum_c,
      |  CAST(ss // j AS BIGINT) AS pre_mean_c,
      |  CAST((stot - ss) // (m - j) AS BIGINT) AS post_mean_c
      |FROM dd WHERE rn = 1 ORDER BY seg""".stripMargin

  // -- q398: k-anonymity / l-diversity audit ---------------------------------------------
  // The privacy census before a data release: quasi-identifiers
  // (nation, market segment, 1000-unit balance bucket) partition
  // customers into equivalence classes; k-anonymity is the class-size
  // profile, l-diversity the distinct sensitive values (order
  // priority) per class. Pure censuses — one QI groupBy plus one
  // key-partitioned customer-order join; nothing is per-row beyond
  // the first aggregation.
  private def q398(spark: SparkSession, sfDir: String): DataFrame = {
    val qi = Seq(col("c_nationkey").cast("long").as("nk"),
      col("c_mktsegment").as("seg"),
      expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("bb"))
    val cust = Tables.read(spark, sfDir, "customer")
    val cls = cust.groupBy(qi: _*).agg(count(lit(1)).as("k"))
    val prof = cls.agg(sum(col("k")).as("n_rows"),
      count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
      max(col("k")).as("max_k"),
      sum(when(col("k") < 5, col("k")).otherwise(0L)).as("rows_k_lt5"))
    val lp = cust.join(Tables.read(spark, sfDir, "orders"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(qi: _*)
      .agg(countDistinct(col("o_orderpriority")).as("l"))
    val lprof = lp.agg(min(col("l")).as("l_min"),
      count(when(col("l") < 2, 1)).as("n_classes_l_lt2"),
      count(lit(1)).as("n_classes_with_orders"))
    prof.crossJoin(broadcast(lprof))
      .select(col("n_rows"), col("n_classes"), col("min_k"), col("max_k"),
        col("rows_k_lt5"),
        expr("rows_k_lt5 * 1000 div n_rows").as("pct_k_lt5_milli"),
        col("l_min"), col("n_classes_l_lt2"), col("n_classes_with_orders"))
  }

  private[queries] val q398Oracle: String =
    """WITH cls AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bb,
      |    count(*) AS k
      |  FROM customer GROUP BY 1, 2, 3),
      |prof AS (SELECT CAST(sum(k) AS BIGINT) AS n_rows,
      |    count(*) AS n_classes, CAST(min(k) AS BIGINT) AS min_k,
      |    CAST(max(k) AS BIGINT) AS max_k,
      |    CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |      AS rows_k_lt5
      |  FROM cls),
      |lp AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bb,
      |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3),
      |lprof AS (SELECT min(l) AS l_min,
      |    CAST(count(CASE WHEN l < 2 THEN 1 END) AS BIGINT)
      |      AS n_classes_l_lt2,
      |    count(*) AS n_classes_with_orders
      |  FROM lp)
      |SELECT n_rows, n_classes, min_k, max_k, rows_k_lt5,
      |  rows_k_lt5 * 1000 // n_rows AS pct_k_lt5_milli,
      |  l_min, n_classes_l_lt2, n_classes_with_orders
      |FROM prof, lprof""".stripMargin

  // -- q399: document Pareto frontier (distributed skyline) ------------------------------
  // Non-dominated documents under two maximize-objectives (token
  // count, distinct-token count): keep (a, b) iff b is the maximum at
  // its own a AND strictly beats every b at larger a. The running max
  // rides the a-GRAIN census (bounded by the document length range,
  // ~90 values), never a row-grain window. The 100 TB plan is
  // two-level — each source computes its LOCAL frontier, the global
  // frontier is recomputed over the union (local dominance implies
  // global dominance, so no global-frontier doc is ever lost) — and
  // the query emits per-row agreement with the direct frontier as the
  // in_two_level gate.
  private def q399(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(trim(col("text")), "\\s+")).as("token"))
    val pts = docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("a"))
      .join(toks.groupBy("doc_id")
        .agg(countDistinct(col("token")).as("b")), "doc_id")
      .localCheckpoint(true) // feeds direct, local, and gate passes
    def frontier(in: DataFrame, part: Seq[String]): DataFrame = {
      val keys = part :+ "a"
      val grain = in.groupBy(keys.map(col): _*)
        .agg(max(col("b")).as("bmax"))
      // the global pass's prefix-max rides the bucketed census
      // machinery (round 17): on a token-count VALUE census an
      // unpartitioned Window.orderBy(a) grows with the length domain;
      // the per-source pass keeps its (source)-partitioned window —
      // its input is already the per-source a-grain census
      val dominated = if (part.isEmpty)
        graft.ops.LayoutOps.censusCumMax(grain, "a", Seq("bmax"),
            inclusive = false, desc = true)
          .withColumnRenamed("__cmax_bmax", "mprev")
      else {
        val w = Window.partitionBy(part.map(col): _*)
          .orderBy(col("a").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        grain.withColumn("mprev", max(col("bmax")).over(w))
      }
      // keep-side keys renamed: the grain frame derives from `in`, so
      // un-renamed columns would be lineage-ambiguous in the join
      val keep = dominated
        .where(col("mprev").isNull || col("bmax") > col("mprev"))
        .select(keys.map(n => col(n).as(s"__k_$n")) :+ col("bmax"): _*)
      in.join(keep, keys.map(n => col(n) === col(s"__k_$n"))
          .reduce(_ && _) && col("b") === col("bmax"))
        .select(col("doc_id"), col("source"), col("a"), col("b"))
    }
    val direct = frontier(pts, Nil)
    val twoLevel = frontier(frontier(pts, Seq("source")), Nil)
    direct.join(twoLevel.select(col("doc_id"), lit(true).as("in_two_level")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("a").as("n_tok"), col("b").as("n_distinct"),
        coalesce(col("in_two_level"), lit(false)).as("in_two_level"))
      .orderBy("doc_id")
  }

  private[queries] val q399Oracle: String =
    """WITH pts AS (SELECT d.doc_id, d.source,
      |    CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
      |      AS a,
      |    dis.b
      |  FROM documents d JOIN (SELECT doc_id,
      |      CAST(count(DISTINCT token) AS BIGINT) AS b
      |    FROM (SELECT doc_id,
      |        unnest(string_split_regex(trim(text), '\s+')) AS token
      |      FROM documents) GROUP BY 1) dis ON d.doc_id = dis.doc_id),
      |ag AS (SELECT a, max(b) AS bmax FROM pts GROUP BY 1),
      |am AS (SELECT a, bmax, max(bmax) OVER (ORDER BY a DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
      |  FROM ag),
      |fr AS (SELECT a, bmax FROM am WHERE mprev IS NULL OR bmax > mprev),
      |direct AS (SELECT p.doc_id, p.a, p.b FROM pts p
      |  JOIN fr ON p.a = fr.a AND p.b = fr.bmax),
      |lg AS (SELECT source, a, max(b) AS bmax FROM pts GROUP BY 1, 2),
      |lm AS (SELECT source, a, bmax, max(bmax) OVER (PARTITION BY source
      |    ORDER BY a DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
      |  FROM lg),
      |lf AS (SELECT source, a, bmax FROM lm
      |  WHERE mprev IS NULL OR bmax > mprev),
      |cand AS (SELECT p.doc_id, p.a, p.b FROM pts p
      |  JOIN lf ON p.source = lf.source AND p.a = lf.a AND p.b = lf.bmax),
      |cg AS (SELECT a, max(b) AS bmax FROM cand GROUP BY 1),
      |cm AS (SELECT a, bmax, max(bmax) OVER (ORDER BY a DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
      |  FROM cg),
      |cf AS (SELECT a, bmax FROM cm WHERE mprev IS NULL OR bmax > mprev),
      |lvl2 AS (SELECT DISTINCT c.doc_id FROM cand c
      |  JOIN cf ON c.a = cf.a AND c.b = cf.bmax)
      |SELECT direct.doc_id, a AS n_tok, b AS n_distinct,
      |  lvl2.doc_id IS NOT NULL AS in_two_level
      |FROM direct LEFT JOIN lvl2 ON direct.doc_id = lvl2.doc_id
      |ORDER BY direct.doc_id""".stripMargin

  // -- q400: pairwise Jensen-Shannon source divergence -----------------------------------
  // The corpus-mix drift matrix: JS(p, q) between every pair of
  // source unigram distributions. Everything reduces to exact integer
  // count ratios — for shared words, p_w/m_w = 2*c1*N2/(c1*N2+c2*N1)
  // (DECIMAL cross-mults cast once to DOUBLE; the ln lands on the
  // q374 micro-nat grid so last-ulp libm noise cannot surface);
  // words absent from the other source contribute exactly ln 2 per
  // unit mass, so their whole mass folds in via the shared-word count
  // totals — the word-grain join only ever sees the intersection.
  // Disjoint-vocabulary pairs (ADVICE r15): the pair spine is the
  // |sources|² self-join of the TINY per-source totals frame, left-
  // joined to the intersection aggregates with sums coalesced to 0 —
  // the same formula then yields the closed-form kl = js = ln 2, so a
  // maximally-divergent pair emits a row instead of silently vanishing.
  // Sign-safe trunc-div everywhere a sum can go negative.
  private val Ln2Micro = 693147L // floor(ln(2)*1e6 + 0.5)

  private def signDiv(x: String, d: String): String =
    s"CASE WHEN $x < 0 THEN -CAST((-($x)) div ($d) AS BIGINT)" +
      s" ELSE CAST(($x) div ($d) AS BIGINT) END"

  private def q400(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.read(spark, sfDir, "documents")
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // word census feeds pair join AND totals
    val ns = toks.groupBy("source").agg(sum(col("c")).as("n"))
    val a = toks.select(col("source").as("src_a"), col("token"),
      col("c").as("c1"))
      .join(broadcast(ns.select(col("source").as("src_a"),
        col("n").as("n1"))), "src_a")
    val b = toks.select(col("source").as("src_b"), col("token"),
      col("c").as("c2"))
      .join(broadcast(ns.select(col("source").as("src_b"),
        col("n").as("n2"))), "src_b")
    val lnA = "CAST(floor(ln(CAST(CAST(c1 AS DECIMAL(38,0)) * n2 * 2" +
      " AS DOUBLE) / CAST(CAST(c1 AS DECIMAL(38,0)) * n2" +
      " + CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE)) * 1000000 + 0.5)" +
      " AS BIGINT)"
    val lnB = "CAST(floor(ln(CAST(CAST(c2 AS DECIMAL(38,0)) * n1 * 2" +
      " AS DOUBLE) / CAST(CAST(c1 AS DECIMAL(38,0)) * n2" +
      " + CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE)) * 1000000 + 0.5)" +
      " AS BIGINT)"
    val inter = a.join(b, "token").where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(expr(s"CAST(c1 AS DECIMAL(38,0)) * ($lnA)")).as("sa"),
        sum(expr(s"CAST(c2 AS DECIMAL(38,0)) * ($lnB)")).as("sb"),
        sum(col("c1")).as("c1both"), sum(col("c2")).as("c2both"))
    val spine = ns.select(col("source").as("src_a"), col("n").as("n1"))
      .crossJoin(broadcast(
        ns.select(col("source").as("src_b"), col("n").as("n2"))))
      .where(col("src_a") < col("src_b"))
    val pairs = spine.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n1"), col("n2"),
        coalesce(col("sa"), lit(0L)).as("sa"),
        coalesce(col("sb"), lit(0L)).as("sb"),
        coalesce(col("c1both"), lit(0L)).as("c1both"),
        coalesce(col("c2both"), lit(0L)).as("c2both"))
    pairs.select(col("src_a"), col("src_b"),
        expr(signDiv(s"sa + CAST(n1 - c1both AS DECIMAL(38,0))" +
          s" * $Ln2Micro", "n1")).as("kl_a_micro"),
        expr(signDiv(s"sb + CAST(n2 - c2both AS DECIMAL(38,0))" +
          s" * $Ln2Micro", "n2")).as("kl_b_micro"))
      .withColumn("js_micro",
        expr(signDiv("kl_a_micro + kl_b_micro", "2")))
      .orderBy("src_a", "src_b")
  }

  private[queries] val q400Oracle: String = {
    def sdiv(x: String, d: String): String =
      s"CASE WHEN $x < 0 THEN -CAST((-($x)) // ($d) AS BIGINT)" +
        s" ELSE CAST(($x) // ($d) AS BIGINT) END"
    val lnA = "CAST(floor(ln(CAST(CAST(c1 AS HUGEINT) * n2 * 2" +
      " AS DOUBLE) / CAST(CAST(c1 AS HUGEINT) * n2" +
      " + CAST(c2 AS HUGEINT) * n1 AS DOUBLE)) * 1000000 + 0.5)" +
      " AS BIGINT)"
    val lnB = "CAST(floor(ln(CAST(CAST(c2 AS HUGEINT) * n1 * 2" +
      " AS DOUBLE) / CAST(CAST(c1 AS HUGEINT) * n2" +
      " + CAST(c2 AS HUGEINT) * n1 AS DOUBLE)) * 1000000 + 0.5)" +
      " AS BIGINT)"
    s"""WITH toks AS (SELECT source, token, count(*) AS c
       |  FROM (SELECT source,
       |      unnest(string_split_regex(trim(text), '\\s+')) AS token
       |    FROM documents) GROUP BY 1, 2),
       |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM toks
       |  GROUP BY 1),
       |p0 AS (SELECT x.source AS src_a, y.source AS src_b,
       |    x.c AS c1, y.c AS c2, na.n AS n1, nb.n AS n2
       |  FROM toks x JOIN toks y
       |    ON x.token = y.token AND x.source < y.source
       |  JOIN ns na ON na.source = x.source
       |  JOIN ns nb ON nb.source = y.source),
       |pr AS (SELECT src_a, src_b,
       |    sum(CAST(c1 AS HUGEINT) * ($lnA)) AS sa,
       |    sum(CAST(c2 AS HUGEINT) * ($lnB)) AS sb,
       |    CAST(sum(c1) AS BIGINT) AS c1both,
       |    CAST(sum(c2) AS BIGINT) AS c2both
       |  FROM p0 GROUP BY 1, 2),
       |ap AS (SELECT na.source AS src_a, nb.source AS src_b,
       |    na.n AS n1, nb.n AS n2
       |  FROM ns na JOIN ns nb ON na.source < nb.source),
       |pc AS (SELECT ap.src_a, ap.src_b, ap.n1, ap.n2,
       |    coalesce(sa, 0) AS sa, coalesce(sb, 0) AS sb,
       |    coalesce(c1both, 0) AS c1both, coalesce(c2both, 0) AS c2both
       |  FROM ap LEFT JOIN pr
       |    ON ap.src_a = pr.src_a AND ap.src_b = pr.src_b),
       |k AS (SELECT src_a, src_b,
       |    ${sdiv(s"sa + CAST(n1 - c1both AS HUGEINT) * $Ln2Micro",
                   "n1")} AS kl_a_micro,
       |    ${sdiv(s"sb + CAST(n2 - c2both AS HUGEINT) * $Ln2Micro",
                   "n2")} AS kl_b_micro
       |  FROM pc)
       |SELECT src_a, src_b, kl_a_micro, kl_b_micro,
       |  ${sdiv("kl_a_micro + kl_b_micro", "2")} AS js_micro
       |FROM k ORDER BY src_a, src_b""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q397_cusum_changepoint", q397, Some(q397Oracle)),
    QueryDef("q398_k_anonymity", q398, Some(q398Oracle)),
    QueryDef("q399_pareto_frontier", q399, Some(q399Oracle)),
    QueryDef("q400_js_divergence", q400, Some(q400Oracle)),
  )
}

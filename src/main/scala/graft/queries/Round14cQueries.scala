package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 third wave — inference + curation ops: Cramér-von Mises
  * two-sample test (q387 — pure ECDF census, no row-grain ranks),
  * exact higher-moment skewness/kurtosis census (q389), and the
  * delete-one-group jackknife for a ratio metric (q391). Doubles
  * appear only as ONE fixed IEEE expression over exact DECIMAL sums
  * (the corr/OLS discipline), everything else is integer grids.
  */
object Round14cQueries {

  // -- q387: Cramér-von Mises two-sample test -------------------------------------
  // Distribution equality between returned (R) and new (N) line items
  // on the exact cents grid, in the Anderson pooled-ECDF form:
  // T = sum_v cnt(v) * (ca(v)*m - cb(v)*n)^2 / (n*m*N^2) with ca/cb
  // cumulative per-side counts at value v. Needs only a VALUE-grain
  // census; the global cumulative runs two-level (intra-bucket window
  // + a bucket-grain prefix over ~170 price buckets) so no window
  // ever sees a data-sized single partition. The division runs in two
  // gridded stages (x1000 div nm, x1000 div N^2) so the DECIMAL
  // intermediate keeps 10^5 headroom at 10x.
  private def q387(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .where(col("l_returnflag").isin("R", "N"))
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .as("v"), col("l_returnflag").as("side"))
      .groupBy("v").agg(
        sum(when(col("side") === "R", 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === "N", 1L).otherwise(0L)).as("b"))
      .withColumn("bkt", expr("v div 65536"))
      .localCheckpoint(true) // intra-bucket pass AND the bucket prefix
    val wIn = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPre = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = census.groupBy("bkt")
      .agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
      .select(col("bkt"),
        coalesce(sum(col("ta")).over(wPre), lit(0L)).as("pa"),
        coalesce(sum(col("tb")).over(wPre), lit(0L)).as("pb"))
    val tot = census.agg(sum(col("a")).as("n"), sum(col("b")).as("m"))
    census
      .withColumn("ia", sum(col("a")).over(wIn))
      .withColumn("ib", sum(col("b")).over(wIn))
      .join(broadcast(prefix), "bkt")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("m"), col("a"), col("b"),
        ((col("ia") + col("pa")).cast("decimal(38,0)") * col("m") -
          (col("ib") + col("pb")).cast("decimal(38,0)") * col("n"))
          .as("d"))
      .groupBy("n", "m")
      .agg(sum(expr("CAST(a + b AS DECIMAL(38,0)) * d * d")).as("s"))
      .select(col("n"), col("m"),
        // div returns BIGINT in Spark — route the intermediate back
        // through DECIMAL or the *1000 overflows at 10x (caught by the
        // round-14 offset-key stress)
        expr("CAST(CAST((s * 1000) div (n * CAST(m AS DECIMAL(38,0)))" +
          " AS DECIMAL(38,0)) * 1000 div" +
          " (CAST(n + m AS DECIMAL(38,0)) * (n + m)) AS BIGINT)")
          .as("t_micro"))
  }

  private val q387Oracle: String =
    """WITH census AS (SELECT
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |    count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS a,
      |    count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS b
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      |cum AS (SELECT *,
      |    CAST(sum(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS HUGEINT) AS ca,
      |    CAST(sum(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS HUGEINT) AS cb
      |  FROM census),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n,
      |    CAST(sum(b) AS BIGINT) AS m FROM census),
      |s AS (SELECT n, m,
      |    sum(CAST(a + b AS HUGEINT) * (ca * m - cb * n)
      |      * (ca * m - cb * n)) AS s
      |  FROM cum, tot GROUP BY 1, 2)
      |SELECT n, m,
      |  CAST(((s * 1000) // (n * CAST(m AS HUGEINT))) * 1000
      |    // (CAST(n + m AS HUGEINT) * (n + m)) AS BIGINT) AS t_micro
      |FROM s""".stripMargin

  // -- q389: higher-moment skewness / kurtosis census ----------------------------------
  // Per returnflag on the exact cents grid: power sums S1..S4 in
  // DECIMAL(38,0) (one partial-aggregable census), then g1 = B/A^1.5
  // and g2 = C/A^2 - 3 with A/B/C the standard raw-sum cross-mults —
  // evaluated as ONE fixed IEEE double expression over the exact sums
  // (A/B/C themselves would overflow any fixed-precision integer at
  // n^3*S4 scale; identical expression trees on identical exact
  // inputs are bit-identical across engines, the corr/OLS parity
  // class). Mean stays exact (cents, trunc div).
  private val (skewExpr, kurtExpr): (String, String) = {
    val (nd, s1, s2, s3, s4) = ("CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)",
      "CAST(s2 AS DOUBLE)", "CAST(s3 AS DOUBLE)", "CAST(s4 AS DOUBLE)")
    val a = s"(($nd * $s2) - ($s1 * $s1))"
    val b = s"((($nd * $nd) * $s3) - ((3 * $nd) * ($s1 * $s2))" +
      s" + (2 * (($s1 * $s1) * $s1)))"
    val c = s"(((($nd * $nd) * $nd) * $s4)" +
      s" - (((4 * $nd) * $nd) * ($s1 * $s3))" +
      s" + ((6 * $nd) * (($s1 * $s1) * $s2))" +
      s" - (3 * ((($s1 * $s1) * $s1) * $s1)))"
    (s"CASE WHEN $a <= 0 THEN NULL ELSE CAST(floor(($b / ($a * sqrt($a)))" +
      s" * 1000000 + 0.5) AS BIGINT) END AS skew_ppm",
      s"CASE WHEN $a <= 0 THEN NULL ELSE CAST(floor((($c / ($a * $a)) - 3)" +
        s" * 1000000 + 0.5) AS BIGINT) END AS kurt_ppm")
  }

  private def q389(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("x"))
      .groupBy("flag").agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("s3"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("s4"))
      .selectExpr("flag", "n", "CAST(s1 div n AS BIGINT) AS mean_c",
        skewExpr, kurtExpr)
      .orderBy("flag")

  private val q389Oracle: String =
    s"""WITH c AS (SELECT l_returnflag AS flag, count(*) AS n,
       |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      AS HUGEINT)) AS s1,
       |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      AS HUGEINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT)) AS s2,
       |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      AS HUGEINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT)) AS s3,
       |    sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      AS HUGEINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5)
       |      AS BIGINT)) AS s4
       |  FROM lineitem GROUP BY 1)
       |SELECT flag, n, CAST(s1 // n AS BIGINT) AS mean_c,
       |  $skewExpr,
       |  $kurtExpr
       |FROM c ORDER BY flag""".stripMargin

  // -- q391: delete-one-group jackknife ---------------------------------------------------
  // Standard-error machinery for a ratio metric (cents per order)
  // whose rows are DEPENDENT within customers: groups are customer
  // hash-cells, theta_(i) leaves one group out, and
  // V = (g-1)*(g*sum(theta^2) - (sum theta)^2)/g^2 over the
  // milli-gridded thetas — one group census, then 32-row algebra. The
  // se lands via one fixed IEEE sqrt over the exact V.
  private val JkGroups = 32L

  private def q391(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "orders")
      .select((col("o_custkey") % JkGroups).as("g"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("g").agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"))
    val tot = cells.agg(sum(col("ng")).as("nn"), sum(col("sg")).as("ss"),
      count(lit(1)).as("ng_total"))
    // leave-one-out sums ride DECIMAL(38,0) before the x1000 scaling
    // (ADVICE r14): in BIGINT, ss * 1000 sits within a small factor of
    // Long.MAX at ~sf100+, where Spark wraps silently while DuckDB
    // raises; div lands the (small) quotient back in BIGINT
    cells.crossJoin(broadcast(tot))
      .select(col("nn"), col("ss"), col("ng_total"),
        expr("(CAST(ss AS DECIMAL(38,0)) - sg) * 1000 div (nn - ng)")
          .as("th"))
      .groupBy("nn", "ss", "ng_total")
      .agg(sum(col("th")).as("st"),
        sum(expr("CAST(th AS DECIMAL(38,0)) * th")).as("qt"))
      .select(col("ng_total").as("n_groups"),
        expr("CAST(ss AS DECIMAL(38,0)) * 1000 div nn").as("theta_milli"),
        expr("CAST((ng_total - 1) * (ng_total * qt" +
          " - CAST(st AS DECIMAL(38,0)) * st)" +
          " div (CAST(ng_total AS DECIMAL(38,0)) * ng_total) AS BIGINT)")
          .as("jk_var_milli2"))
      .withColumn("jk_se_milli", expr(
        "CAST(floor(sqrt(CAST(jk_var_milli2 AS DOUBLE)) + 0.5) AS BIGINT)"))
  }

  private val q391Oracle: String =
    s"""WITH cells AS (SELECT o_custkey % $JkGroups AS g,
       |    count(*) AS ng,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |      AS BIGINT) AS sg
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
       |    CAST(sum(sg) AS BIGINT) AS ss, count(*) AS ng_total
       |  FROM cells),
       |th AS (SELECT nn, ss, ng_total,
       |    CAST((CAST(ss AS HUGEINT) - sg) * 1000 // (nn - ng) AS BIGINT)
       |      AS th FROM cells, tot),
       |ag AS (SELECT nn, ss, ng_total, CAST(sum(th) AS BIGINT) AS st,
       |    sum(CAST(th AS HUGEINT) * th) AS qt
       |  FROM th GROUP BY 1, 2, 3)
       |SELECT ng_total AS n_groups,
       |  CAST(CAST(ss AS HUGEINT) * 1000 // nn AS BIGINT) AS theta_milli,
       |  CAST((ng_total - 1) * (ng_total * qt - CAST(st AS HUGEINT) * st)
       |    // (CAST(ng_total AS HUGEINT) * ng_total) AS BIGINT)
       |    AS jk_var_milli2,
       |  CAST(floor(sqrt(CAST(CAST((ng_total - 1) * (ng_total * qt
       |    - CAST(st AS HUGEINT) * st) // (CAST(ng_total AS HUGEINT)
       |    * ng_total) AS BIGINT) AS DOUBLE)) + 0.5) AS BIGINT)
       |    AS jk_se_milli
       |FROM ag""".stripMargin

  // -- q388: coarsened exact matching ATT ---------------------------------------------
  // Observational causal effect of order priority on order value:
  // treated = URGENT/HIGH, strata = (year, status) cells, only strata
  // holding BOTH groups match, and
  // ATT = sum_s n_ts * (mean_ts - mean_cs) / sum_s n_ts with the
  // per-stratum difference one exact cents-grain rational
  // (s_t*n_c - s_c*n_t) div (n_t*n_c). Pure cell censuses: the only
  // data-sized op is the first groupBy.
  private def q388(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "orders")
      .select(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("t"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("yr", "status", "t")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val matched = cells.where(col("t"))
      .select(col("yr"), col("status"), col("n").as("n_t"),
        col("s").as("s_t"))
      .join(cells.where(!col("t"))
        .select(col("yr"), col("status"), col("n").as("n_c"),
          col("s").as("s_c")), Seq("yr", "status"))
      .withColumn("diff_c", expr("CAST((CAST(s_t AS DECIMAL(38,0)) * n_c" +
        " - CAST(s_c AS DECIMAL(38,0)) * n_t) div" +
        " (CAST(n_t AS DECIMAL(38,0)) * n_c) AS BIGINT)"))
      .localCheckpoint(true) // stratum rows AND the ATT rollup
    val att = matched.agg(
      expr("CAST(sum(CAST(n_t AS DECIMAL(38,0)) * diff_c)" +
        " div sum(n_t) AS BIGINT)").as("att_c"))
    matched.crossJoin(broadcast(att))
      .select(col("yr"), col("status"), col("n_t"), col("n_c"),
        col("diff_c"), col("att_c"))
      .orderBy("yr", "status")
  }

  private val q388Oracle: String =
    """WITH cells AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
      |    o_orderstatus AS status,
      |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS t,
      |    count(*) AS n,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s
      |  FROM orders GROUP BY 1, 2, 3),
      |m AS (SELECT a.yr, a.status, a.n AS n_t, b.n AS n_c,
      |    CAST((CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)
      |      // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT) AS diff_c
      |  FROM cells a JOIN cells b ON a.yr = b.yr AND a.status = b.status
      |  WHERE a.t AND NOT b.t),
      |att AS (SELECT CAST(sum(CAST(n_t AS HUGEINT) * diff_c)
      |    // sum(n_t) AS BIGINT) AS att_c FROM m)
      |SELECT CAST(yr AS BIGINT) AS yr, status, n_t, n_c, diff_c, att_c
      |FROM m, att ORDER BY yr, status""".stripMargin

  // -- q390: deterministic contrastive negative sampling --------------------------------
  // The negative-sampling plan a contrastive trainer executes: each
  // anchor draws K hash-seeded candidates from the (contiguous) id
  // domain; candidates join back for their labels, and self-draws and
  // label collisions are FLAGGED, not resampled — the downstream loss
  // masks them, and flagging keeps the draw a pure per-row projection
  // (no iteration, no rejection loop to distribute). The only
  // data-sized ops are the K-way explode and one id-keyed join.
  private val NegK = 4

  private def q390(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .localCheckpoint(true) // anchors AND the label lookup
    val nTot = emb.agg(count(lit(1)).as("nn"))
    val js = (1 to NegK).map(j => lit(j.toLong))
    emb.crossJoin(broadcast(nTot))
      .withColumn("j", explode(array(js: _*)))
      .withColumn("neg_id", expr("((((vec_id * 53 + j * 1000003)" +
        " * 1103515245 + 12345) % 2147483648) * 1103515245 + 54321)" +
        " % 2147483648 % nn"))
      .join(emb.select(col("vec_id").as("neg_id"),
        col("label").as("neg_label")), Seq("neg_id"))
      .select(col("vec_id"), col("j"), col("neg_id"),
        (col("neg_id") === col("vec_id")).as("is_self"),
        (col("neg_label") === col("label")).as("label_collision"))
      .orderBy("vec_id", "j")
  }

  private val q390Oracle: String =
    s"""WITH emb AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |  FROM embeddings),
       |n AS (SELECT count(*) AS nn FROM emb),
       |draws AS (SELECT vec_id, label, j.j,
       |    ((((vec_id * 53 + j.j * 1000003) * 1103515245 + 12345)
       |      % 2147483648) * 1103515245 + 54321) % 2147483648 % nn
       |      AS neg_id
       |  FROM emb, n, (SELECT unnest(range(1, ${NegK + 1})) AS j) j)
       |SELECT d.vec_id, d.j, d.neg_id,
       |  d.neg_id = d.vec_id AS is_self,
       |  e.label = d.label AS label_collision
       |FROM draws d JOIN emb e ON d.neg_id = e.vec_id
       |ORDER BY d.vec_id, d.j""".stripMargin

  // -- q392: entity-resolution blocking quality ------------------------------------------
  // Grades a blocking scheme against brute truth on a BOUNDED probe:
  // the 128 smallest-hash docs (the q381 reservoir — fixed size at ANY
  // corpus scale) get exact pairwise token-Jaccard via an inverted
  // token join (never an array cross join); truth = Jaccard >= 0.2,
  // candidates = same (lang, length-bucket) block. Reduction ratio and
  // pairs completeness in ppm; completeness is NULL when the probe
  // holds no true pair (try_divide / NULLIF parity).
  private val BqSample = 128
  private val BqSeed = 23L

  private def q392(spark: SparkSession, sfDir: String): DataFrame = {
    val pr = ((col("doc_id") % 2147483647L + lit(BqSeed)) * lit(48271L)
      % 2147483647L + lit(1L)) * lit(69621L) % 2147483647L
    val sample = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        pr.as("__p"))
      .orderBy("__p", "doc_id").limit(BqSample)
      .withColumn("block", concat_ws("#", col("lang"),
        expr("CAST(n_chars div 50 AS STRING)")))
      .localCheckpoint(true) // token explode AND both pair frames
    val toks = sample.select(col("doc_id"),
      explode(array_distinct(graft.ops.TextOps.tokens(col("text"))))
        .as("tok"))
      .localCheckpoint(true) // sizes AND the inverted join
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.select(col("doc_id").as("i"), col("tok"))
      .join(toks.select(col("doc_id").as("jj"), col("tok")), "tok")
      .where(col("i") < col("jj"))
      .groupBy("i", "jj").agg(count(lit(1)).as("ix"))
    val truth = inter
      .join(broadcast(sizes.select(col("doc_id").as("i"),
        col("sz").as("szi"))), "i")
      .join(broadcast(sizes.select(col("doc_id").as("jj"),
        col("sz").as("szj"))), "jj")
      .where(col("ix") * 5 >= (col("szi") + col("szj") - col("ix")))
      .select(col("i"), col("jj"))
    val cand = sample.select(col("doc_id").as("i"), col("block"))
      .join(sample.select(col("doc_id").as("jj"), col("block")), "block")
      .where(col("i") < col("jj"))
      .select(col("i"), col("jj"))
      .localCheckpoint(true) // counted AND intersected with truth
    val nDocs = sample.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val found = truth.join(cand, Seq("i", "jj"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(lit(nDocs).as("n_sample"), col("n_true"), col("n_cand"),
        col("n_found"),
        expr(s"(($allPairs - n_cand) * 1000000) div $allPairs")
          .as("rr_ppm"),
        expr("CASE WHEN n_true = 0 THEN NULL" +
          " ELSE n_found * 1000000 div n_true END").as("pc_ppm"))
  }

  private val q392Oracle: String = {
    val tok = graft.ops.TextOps.tokensSql("text")
    s"""WITH pr AS (SELECT doc_id, text, lang, n_chars,
       |    ((doc_id % 2147483647 + $BqSeed) * 48271 % 2147483647 + 1)
       |      * 69621 % 2147483647 AS p
       |  FROM documents),
       |samp AS (SELECT doc_id, text,
       |    lang || '#' || CAST(n_chars // 50 AS VARCHAR) AS block
       |  FROM pr ORDER BY p, doc_id LIMIT $BqSample),
       |toks AS (SELECT doc_id, unnest(list_distinct($tok)) AS tok
       |  FROM samp),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
       |inter AS (SELECT a.doc_id AS i, b.doc_id AS jj, count(*) AS ix
       |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (SELECT i, jj FROM inter
       |  JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = jj
       |  WHERE ix * 5 >= si.sz + sj.sz - ix),
       |cand AS (SELECT a.doc_id AS i, b.doc_id AS jj FROM samp a
       |  JOIN samp b ON a.block = b.block AND a.doc_id < b.doc_id),
       |nd AS (SELECT count(*) AS n FROM samp),
       |f AS (SELECT count(*) AS n_found FROM truth t
       |  JOIN cand c ON t.i = c.i AND t.jj = c.jj)
       |SELECT CAST(n AS BIGINT) AS n_sample,
       |  (SELECT count(*) FROM truth) AS n_true,
       |  (SELECT count(*) FROM cand) AS n_cand,
       |  (SELECT n_found FROM f) AS n_found,
       |  ((n * (n - 1) // 2 - (SELECT count(*) FROM cand)) * 1000000)
       |    // (n * (n - 1) // 2) AS rr_ppm,
       |  CAST((SELECT n_found FROM f) * 1000000
       |    // NULLIF((SELECT count(*) FROM truth), 0) AS BIGINT) AS pc_ppm
       |FROM nd""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q387_cvm_test", q387, Some(q387Oracle)),
    QueryDef("q388_cem_att", q388, Some(q388Oracle)),
    QueryDef("q389_higher_moments", q389, Some(q389Oracle)),
    QueryDef("q390_negative_sampling", q390, Some(q390Oracle)),
    QueryDef("q391_jackknife", q391, Some(q391Oracle)),
    QueryDef("q392_blocking_quality", q392, Some(q392Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-13 fifth wave: grid-blocked spatial close-pair join (q323 —
  * the classic fixed-radius near-neighbor pattern, 9-cell neighborhood
  * expansion instead of all-pairs), count-min-sketch heavy-hitter
  * audit (q324 — fixed 4×256 sketch, estimates vs exact truth),
  * storage-encoding advisor (q325 — per-rowgroup RLE/delta/plain cost
  * model under the table's sort order), and exact Shapley-value
  * channel attribution (q326 — the 2^4 coalition lattice evaluated
  * set-algebraically on a ≤16-row census).
  */
object Round13eQueries {

  // -- q323: grid-blocked close-pair spatial join ----------------------------------
  // Fixed-radius pair finding without the O(n²) cross join: each point
  // lands in ONE home cell of side R; a pair within L2 radius R can
  // differ by at most one cell per axis, so expanding only the LEFT
  // side to its 3×3 neighborhood and joining against home cells finds
  // every qualifying pair EXACTLY ONCE (a pair (a,b), a<b, matches
  // only where b is home — the reverse candidate is killed by the
  // id order; no distinct needed). Shuffle is cell-keyed; candidate
  // volume is 9× points × local density, never n². Coordinates are a
  // deterministic two-round LCG scramble of the customer key kept
  // inside BIGINT (keys to ~8e9 before a*k would overflow — far past
  // any fixture; checked identically by both engines).
  private val GridR = 4000L

  private def q323(spark: SparkSession, sfDir: String): DataFrame = {
    val r2 = GridR * GridR
    val pts = Tables.read(spark, sfDir, "customer")
      .selectExpr("c_custkey AS id",
        "((((c_custkey*1103515245 + 12345) % 2147483648) * 1103515245 + 54321)" +
          " % 2147483648) % 100000 AS x",
        "((((c_custkey*69069 + 1) % 2147483648) * 69069 + 777)" +
          " % 2147483648) % 100000 AS y")
      .withColumn("cx", expr(s"x div $GridR"))
      .withColumn("cy", expr(s"y div $GridR"))
      .localCheckpoint(true) // feeds the home AND expanded sides
    val home = pts.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), (col("cx") * lit(1024L) + col("cy")).as("cell"))
    // HALF-PLANE probe (round 15): each unordered pair is produced
    // exactly once — the id order is only needed inside the self cell.
    // The old 3x3-probe-then-ida<idb plan materialized every candidate
    // twice before the filter (324M join rows at 10x density); the
    // half-window halves the join output with an identical pair set.
    val halfOffs = Seq((0L, 0L), (1L, 0L), (-1L, 1L), (0L, 1L), (1L, 1L))
    val ex = pts
      .withColumn("o", explode(array(halfOffs.map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)))
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        (col("o.dx") === 0 && col("o.dy") === 0).as("self"),
        ((col("cx") + col("o.dx")) * lit(1024L) + col("cy") + col("o.dy"))
          .as("cell"))
    ex.join(home.hint("shuffle_hash"), "cell")
      .where(!col("self") || col("ida") < col("idb"))
      .select(((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .where(col("d2") <= lit(r2))
      .groupBy(expr(s"d2 * 4 div ${r2 + 1}").as("band"))
      .agg(count(lit(1)).as("pairs"),
        min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
      .orderBy("band")
  }

  private val q323Oracle: String = {
    val r2 = GridR * GridR
    s"""WITH h AS (SELECT c_custkey AS id,
       |    (c_custkey*1103515245 + 12345) % 2147483648 AS h1,
       |    (c_custkey*69069 + 1) % 2147483648 AS g1 FROM customer),
       |pts AS (SELECT id,
       |    ((h1*1103515245 + 54321) % 2147483648) % 100000 AS x,
       |    ((g1*69069 + 777) % 2147483648) % 100000 AS y FROM h),
       |p2 AS (SELECT id, x, y, x // $GridR AS cx, y // $GridR AS cy FROM pts),
       |off AS (SELECT * FROM (VALUES (-1),(0),(1)) o(d)),
       |ex AS (SELECT id AS ida, x AS xa, y AS ya,
       |    (cx+ox.d)*1024 + (cy+oy.d) AS cell FROM p2, off ox, off oy),
       |hm AS (SELECT id AS idb, x AS xb, y AS yb, cx*1024 + cy AS cell FROM p2),
       |pr AS (SELECT (xa-xb)*(xa-xb)+(ya-yb)*(ya-yb) AS d2
       |  FROM ex JOIN hm USING (cell)
       |  WHERE ida < idb AND (xa-xb)*(xa-xb)+(ya-yb)*(ya-yb) <= $r2)
       |SELECT CAST(d2*4 // ${r2 + 1} AS BIGINT) AS band, count(*) AS pairs,
       |  CAST(min(d2) AS BIGINT) AS min_d2, CAST(max(d2) AS BIGINT) AS max_d2
       |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -- q324: count-min-sketch heavy-hitter audit -----------------------------------
  // The CMS invariant a pipeline relies on before swapping exact
  // censuses for sketches: estimates NEVER undercount (est = min over
  // d=4 rows of the w=256 cell the key hashes into; every cell sum ≥
  // the key's true count). The sketch is built FROM the key census —
  // identical to the streaming map-side build, since CMS is linear in
  // increments — and stays 4×256 cells whatever the data volume: the
  // sketch and the hash-parameter frame ride broadcasts, the only
  // data-sized operation is the key census itself. Hash family is
  // ((a·k + b) mod p) mod w with p = 2^31−1 and fixed odd (a, b)
  // literals, exact in BIGINT on both engines.
  private val CmsParams = Seq((0L, 1549L, 13007L), (1L, 3319L, 27091L),
    (2L, 7907L, 40503L), (3L, 15073L, 55001L))

  private def q324(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val params = CmsParams.toDF("i", "a", "b")
    val census = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds the sketch build AND the top-k
    val sketch = census.crossJoin(broadcast(params))
      .groupBy(col("i"), expr("((a*k + b) % 2147483647) % 256").as("cell"))
      .agg(sum(col("cnt")).as("cellsum")) // ≤ 4×256 rows
    val top = census.orderBy(col("cnt").desc, col("k")).limit(20)
    top.crossJoin(broadcast(params))
      .withColumn("cell", expr("((a*k + b) % 2147483647) % 256"))
      .join(broadcast(sketch), Seq("i", "cell"))
      .groupBy("k", "cnt").agg(min(col("cellsum")).as("est"))
      .select(col("k"), col("cnt").as("exact_cnt"), col("est"),
        (col("est") - col("cnt")).as("overest"))
      .orderBy(col("exact_cnt").desc, col("k"))
  }

  private val q324Oracle: String = {
    val vals = CmsParams.map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",")
    s"""WITH census AS (SELECT l_partkey AS k, count(*) AS cnt
       |  FROM lineitem GROUP BY 1),
       |par AS (SELECT * FROM (VALUES $vals) p(i,a,b)),
       |sk AS (SELECT i, ((a*k+b) % 2147483647) % 256 AS cell,
       |    CAST(sum(cnt) AS BIGINT) AS cellsum
       |  FROM census CROSS JOIN par GROUP BY 1,2),
       |top AS (SELECT k, cnt FROM census ORDER BY cnt DESC, k LIMIT 20),
       |est AS (SELECT t.k, t.cnt, min(s.cellsum) AS est
       |  FROM top t CROSS JOIN par p
       |  JOIN sk s ON s.i = p.i AND s.cell = ((p.a*t.k+p.b) % 2147483647) % 256
       |  GROUP BY 1,2)
       |SELECT k, CAST(cnt AS BIGINT) AS exact_cnt, est,
       |  CAST(est - cnt AS BIGINT) AS overest
       |FROM est ORDER BY exact_cnt DESC, k""".stripMargin
  }

  // -- q325: storage-encoding advisor ----------------------------------------------
  // The OPTIMIZE-time what-if a lakehouse runs before rewriting a
  // table: under the physical sort order (l_shipdate, key), estimate
  // per-column encoded size for PLAIN (8 B/value), RLE (12 B/run:
  // 8 B value + 4 B length) and DELTA (8 B base + ladder-width bytes
  // per delta, width from the bucket's max |Δ|), with runs and deltas
  // scoped to 16-day rowgroup buckets — runs never cross rowgroups,
  // exactly like parquet. One window pass computes all three columns'
  // lags (single exchange, partitioned by bucket, so the scan
  // parallelizes at any scale); the bucket-grain stats frame is
  // calendar-bounded. Ties prefer the simpler encoding
  // (plain ≺ rle ≺ delta).
  private def q325(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("b").orderBy("sd", "ok", "ln")
    val base = Tables.read(spark, sfDir, "lineitem").select(
      expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT)")
        .as("sd"),
      col("l_orderkey").as("ok"),
      (floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast(LongType) *
        lit(10000L)).as("pm"),
      (expr("CAST(year(l_shipdate) AS BIGINT)") * lit(12L) +
        month(col("l_shipdate"))).as("mo"),
      col("l_linenumber").as("ln"))
      // sign-safe: Spark div truncates, DuckDB // floors — agree on
      // trunc-toward-zero so pre-epoch shipdates bucket identically
      .withColumn("b",
        expr("CASE WHEN sd < 0 THEN -((-sd) div 16) ELSE sd div 16 END"))
    val lagged = base.select(col("b"), col("mo"), col("ok"), col("pm"),
      lag("mo", 1).over(w).as("lmo"), lag("ok", 1).over(w).as("lok"),
      lag("pm", 1).over(w).as("lpm"))
    def runs(c: String, l: String) =
      sum(when(col(l).isNull || col(c) =!= col(l), 1L).otherwise(0L))
    def dmax(c: String, l: String) =
      coalesce(max(abs(col(c) - col(l))), lit(0L))
    val bkt = lagged.groupBy("b").agg(count(lit(1)).as("n"),
      runs("mo", "lmo").as("r_mo"), dmax("mo", "lmo").as("d_mo"),
      runs("ok", "lok").as("r_ok"), dmax("ok", "lok").as("d_ok"),
      runs("pm", "lpm").as("r_pm"), dmax("pm", "lpm").as("d_pm"))
      .localCheckpoint(true) // rowgroup-grain; feeds the 3 column rows
    def width(d: String) = when(col(d) < 256L, 1L)
      .when(col(d) < 65536L, 2L).when(col(d) < 4294967296L, 4L).otherwise(8L)
    def row(name: String, r: String, d: String) = bkt.agg(
      sum(col("n")).as("n_rows"), sum(col(r)).as("runs"),
      sum(lit(8L) + (col("n") - 1L) * width(d)).as("delta_bytes"))
      .select(lit(name).as("col"), col("n_rows"), col("runs"),
        (col("n_rows") * 8L).as("plain_bytes"),
        (col("runs") * 12L).as("rle_bytes"), col("delta_bytes"),
        when(col("n_rows") * 8L <= col("runs") * 12L &&
          col("n_rows") * 8L <= col("delta_bytes"), "plain")
          .when(col("runs") * 12L <= col("delta_bytes"), "rle")
          .otherwise("delta").as("best"))
    row("order_key", "r_ok", "d_ok")
      .unionAll(row("price_micros", "r_pm", "d_pm"))
      .unionAll(row("ship_month", "r_mo", "d_mo"))
      .orderBy("col")
  }

  private val q325Oracle: String =
    """WITH base AS (SELECT
      |    CASE WHEN CAST(l_shipdate AS DATE) < DATE '1995-01-01'
      |      THEN -(CAST(DATE '1995-01-01' - CAST(l_shipdate AS DATE) AS BIGINT) // 16)
      |      ELSE CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) // 16
      |    END AS b,
      |    CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS sd,
      |    CAST(year(l_shipdate) AS BIGINT) * 12 + month(l_shipdate) AS mo,
      |    l_orderkey AS ok,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000 AS pm,
      |    l_linenumber AS ln
      |  FROM lineitem),
      |lagged AS (SELECT b, mo, ok, pm,
      |    lag(mo) OVER w AS lmo, lag(ok) OVER w AS lok, lag(pm) OVER w AS lpm
      |  FROM base WINDOW w AS (PARTITION BY b ORDER BY sd, ok, ln)),
      |bkt AS (SELECT b, count(*) AS n,
      |    sum(CASE WHEN lmo IS NULL OR mo <> lmo THEN 1 ELSE 0 END) AS r_mo,
      |    coalesce(max(abs(mo - lmo)), 0) AS d_mo,
      |    sum(CASE WHEN lok IS NULL OR ok <> lok THEN 1 ELSE 0 END) AS r_ok,
      |    coalesce(max(abs(ok - lok)), 0) AS d_ok,
      |    sum(CASE WHEN lpm IS NULL OR pm <> lpm THEN 1 ELSE 0 END) AS r_pm,
      |    coalesce(max(abs(pm - lpm)), 0) AS d_pm
      |  FROM lagged GROUP BY b),
      |wb AS (SELECT *,
      |    CASE WHEN d_mo < 256 THEN 1 WHEN d_mo < 65536 THEN 2
      |      WHEN d_mo < 4294967296 THEN 4 ELSE 8 END AS w_mo,
      |    CASE WHEN d_ok < 256 THEN 1 WHEN d_ok < 65536 THEN 2
      |      WHEN d_ok < 4294967296 THEN 4 ELSE 8 END AS w_ok,
      |    CASE WHEN d_pm < 256 THEN 1 WHEN d_pm < 65536 THEN 2
      |      WHEN d_pm < 4294967296 THEN 4 ELSE 8 END AS w_pm
      |  FROM bkt),
      |tot AS (
      |  SELECT 'order_key' AS col, sum(n) AS n_rows, sum(r_ok) AS runs,
      |    sum(8 + (n-1)*w_ok) AS delta_bytes FROM wb
      |  UNION ALL SELECT 'price_micros', sum(n), sum(r_pm),
      |    sum(8 + (n-1)*w_pm) FROM wb
      |  UNION ALL SELECT 'ship_month', sum(n), sum(r_mo),
      |    sum(8 + (n-1)*w_mo) FROM wb)
      |SELECT col, CAST(n_rows AS BIGINT) AS n_rows, CAST(runs AS BIGINT) AS runs,
      |  CAST(8*n_rows AS BIGINT) AS plain_bytes,
      |  CAST(12*runs AS BIGINT) AS rle_bytes,
      |  CAST(delta_bytes AS BIGINT) AS delta_bytes,
      |  CASE WHEN 8*n_rows <= 12*runs AND 8*n_rows <= delta_bytes THEN 'plain'
      |       WHEN 12*runs <= delta_bytes THEN 'rle' ELSE 'delta' END AS best
      |FROM tot ORDER BY col""".stripMargin

  // -- q326: exact Shapley-value channel attribution --------------------------------
  // Marketing/feature attribution with the axiomatic answer instead of
  // last-touch heuristics: channels are the four non-purchase event
  // types (a touchpoint = an event of that type with value ≥ 150 —
  // the engagement gate that keeps masks diverse), conversion = any
  // purchase. Coalition value v(S) = converting users whose touched
  // set ⊆ S, so v is monotone and every Shapley term is ≥ 0. The ONLY
  // data-sized operation is the per-user bit_or/max aggregate; the
  // 16-row mask census, the 2^4 lattice, and the 4-channel pair walk
  // are all broadcast literals — the exact-Shapley cost is 2^c over
  // the CENSUS, never over users. Weights |S|!·(c−1−|S|)! with c=4
  // give the fixed {6,2,2,6} ladder over denominator 4! = 24; both
  // ppm headline numbers are trunc-divs of the exact integer
  // numerator. share_ppm normalizes by v(full)−v(∅) (conversions
  // attributable to ANY channel), null if no channel was ever touched.
  private def q326(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.read(spark, sfDir, "events").groupBy("user_id").agg(
      expr("bit_or(CASE WHEN value >= 150 THEN " +
        "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 " +
        "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END " +
        "ELSE 0 END)").as("mask"),
      max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
    val census = users.where(col("conv") === 1).groupBy("mask")
      .agg(count(lit(1)).as("cu")).localCheckpoint(true) // ≤ 16 rows
    val lat = spark.range(16).select(col("id").as("s"))
      .join(broadcast(census), expr("(mask & s) = mask"), "left")
      .groupBy("s").agg(sum(coalesce(col("cu"), lit(0L))).as("v"))
      .localCheckpoint(true) // 16 rows; feeds terms AND both bounds
    val la = lat.select(col("s").as("sa"), col("v").as("va"))
    val lb = lat.select(col("s").as("sb"), col("v").as("vb"))
    val ch = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
      ("view", 8L)).toDF("channel", "bit")
    val vf = lat.where(col("s") === 15).select(col("v").as("v_full"))
    val v0 = lat.where(col("s") === 0).select(col("v").as("v_none"))
    ch.join(broadcast(la), expr("(sa & bit) = 0"))
      .join(broadcast(lb), expr("sb = sa + bit"))
      .withColumn("w", expr("CASE CAST(bit_count(sa) AS INT) " +
        "WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"))
      .groupBy("channel").agg(sum(expr("w * (vb - va)")).as("phi_num"))
      .crossJoin(broadcast(vf)).crossJoin(broadcast(v0))
      .select(col("channel"), col("phi_num"),
        expr("phi_num * 1000000 div 24").as("phi_users_ppm"),
        expr("phi_num * 1000000 div nullif(24 * (v_full - v_none), 0)")
          .as("share_ppm"))
      .orderBy("channel")
  }

  private val q326Oracle: String =
    """WITH u AS (SELECT user_id,
      |    bit_or(CASE WHEN value >= 150 THEN
      |      CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END
      |      ELSE 0 END) AS mask,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |census AS (SELECT mask, count(*) AS cu FROM u WHERE conv = 1 GROUP BY 1),
      |lat AS (SELECT s, CAST(sum(coalesce(cu, 0)) AS BIGINT) AS v
      |  FROM (SELECT range AS s FROM range(16)) t
      |  LEFT JOIN census ON (mask & s) = mask GROUP BY 1),
      |ch AS (SELECT * FROM (VALUES ('click',1),('error',2),('signup',4),
      |  ('view',8)) c(channel, bit)),
      |terms AS (SELECT channel,
      |    CASE CAST(bit_count(a.s) AS INTEGER) WHEN 0 THEN 6 WHEN 1 THEN 2
      |      WHEN 2 THEN 2 ELSE 6 END * (b.v - a.v) AS term
      |  FROM ch JOIN lat a ON (a.s & bit) = 0 JOIN lat b ON b.s = a.s + bit),
      |den AS (SELECT (SELECT v FROM lat WHERE s = 15)
      |  - (SELECT v FROM lat WHERE s = 0) AS d)
      |SELECT channel, CAST(sum(term) AS BIGINT) AS phi_num,
      |  CAST(sum(term) * 1000000 // 24 AS BIGINT) AS phi_users_ppm,
      |  CAST(sum(term) * 1000000 // nullif(24 * d, 0) AS BIGINT) AS share_ppm
      |FROM terms CROSS JOIN den GROUP BY channel, d ORDER BY channel""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q323_grid_close_pairs", q323, Some(q323Oracle)),
    QueryDef("q324_cms_audit", q324, Some(q324Oracle)),
    QueryDef("q325_storage_advisor", q325, Some(q325Oracle)),
    QueryDef("q326_shapley_attribution", q326, Some(q326Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.{MixOps, SimilarityOps}

/** Round-11 eighth wave: product-quantization codebooks, the
  * median-of-means robust estimator, and information-gain feature
  * scoring.
  */
object Round11hQueries {

  // -- q212: product-quantization codebook -----------------------------------
  // The memory side of vector search at 100 TB: PQ splits each
  // 64-dim embedding into two 32-dim subspaces and trains an
  // independent 4-cell codebook per subspace (the deterministic q76
  // Lloyd trainer on the SLICED vectors — init by vec_id, n4-gridded
  // trajectory), so every vector compresses to a 2×2-bit code. Output
  // is the joint code census with the q210 membership-digest trio —
  // code balance IS the codebook health metric (a collapsed cell
  // halves the effective bits). Training cost: per subspace,
  // `iters` map-side scans + k·d driver literals; the only joint
  // work is one vec_id-keyed join of two (id, cell) frames.
  private val PqK = 4
  private val PqIters = 2

  private def q212(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    def sub(from: Int) = emb.select(col("vec_id"),
      slice(col("embedding"), from, 32).as("embedding"))
    val lo = SimilarityOps.kmeansAssign(sub(1), PqK, PqIters)
      .withColumnRenamed("cell", "c_lo")
    val hi = SimilarityOps.kmeansAssign(sub(33), PqK, PqIters)
      .withColumnRenamed("cell", "c_hi")
    lo.join(hi, "vec_id")
      .select((col("c_lo").cast(LongType) * PqK + col("c_hi")).as("code"),
        col("vec_id"))
      .groupBy("code")
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("vid_sum"),
        min(col("vec_id")).as("vid_min"), max(col("vec_id")).as("vid_max"))
      .orderBy("code")
  }

  private val q212Oracle: String = {
    def sub(lo: Int, hi: Int) =
      s"(SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings)"
    s"""SELECT CAST(lo.cell * $PqK + hi.cell AS BIGINT) AS code,
       |  count(*) AS n_vecs, CAST(sum(vec_id) AS BIGINT) AS vid_sum,
       |  min(vec_id) AS vid_min, max(vec_id) AS vid_max
       |FROM (${SimilarityOps.kmeansSql(sub(1, 32), PqK, PqIters)}) lo
       |JOIN (${SimilarityOps.kmeansSql(sub(33, 64), PqK, PqIters)}) hi
       |  USING (vec_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -- q213: median-of-means robust estimator --------------------------------
  // The estimator that survives heavy tails where the plain mean
  // doesn't: rows hash into k buckets (two-round portable hash — one
  // Lehmer round is monotone on small domains), each bucket reports
  // its exact integer mean, the estimate is the MEDIAN of the k
  // means. One map-side-combining aggregate to k rows, then driver-
  // grade math on the k-row frame — at any scale the shuffle carries
  // exactly k partial (n, Σ) pairs. The plain mean rides along for
  // the robustness comparison.
  private val MomSeed = 59L
  private val MomK = 16

  private def q213(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "orders")
      .select(floor(col("o_totalprice")).as("x"),
        (MixOps.portableHash2(col("o_orderkey"), MomSeed) % MomK).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .withColumn("gmean", expr("s div n"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("k_groups"),
        sum(col("s")).as("__tot"),
        element_at(percentile(col("gmean"), array(lit(0.5))), 1).as("__med"),
        min(col("gmean")).as("gmean_min"), max(col("gmean")).as("gmean_max"))
      .select(col("n_rows"), col("k_groups"),
        expr("__tot div n_rows").as("mean_u"),
        Norm.n4(col("__med")).as("mom_u"),
        col("gmean_min"), col("gmean_max"))

  private val q213Oracle: String = {
    val h = s"((((o_orderkey % ${MixOps.P} + $MomSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH b AS (SELECT ($h) % $MomK AS g,
       |    CAST(floor(o_totalprice) AS BIGINT) AS x
       |  FROM orders),
       |m AS (SELECT g, count(*) AS n, CAST(sum(x) AS BIGINT) AS s
       |  FROM b GROUP BY 1),
       |m2 AS (SELECT n, s, s // n AS gmean FROM m)
       |SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS k_groups,
       |  CAST(sum(s) // sum(n) AS BIGINT) AS mean_u,
       |  ${graft.etl.OracleSql.n4("quantile_cont(gmean, 0.5)")} AS mom_u,
       |  min(gmean) AS gmean_min, max(gmean) AS gmean_max
       |FROM m2""".stripMargin
  }

  // -- q214: information-gain feature scores ---------------------------------
  // Feature selection for a categorical target: IG(f) = H(label) −
  // H(label | f) over orders, label = o_orderstatus, three candidate
  // features (priority, ISO weekday, 50k price bucket). Entropies
  // live on the q93/q116 micro-nat grid — every ln term is
  // `floor(−(n/N)·ln(n/d)·1e6 + 0.5)` with FIXED parenthesization,
  // integer-summed, so both engines agree bit-for-bit and no
  // >2^53 product ever meets IEEE.
  //
  // Scale shape: features MELT into one (feature, value, label)
  // census — ONE scan and ONE map-side-combining shuffle for all
  // features; everything after operates on the ≤ Σ|V_f|·|C| cell
  // frame (broadcast joins of one-row-per-feature totals).
  private def q214(spark: SparkSession, sfDir: String): DataFrame = {
    val feats: Column = explode(array(
      struct(lit("priority").as("f"),
        col("o_orderpriority").cast("string").as("v")),
      struct(lit("dow").as("f"),
        (weekday(to_date(col("o_orderdate"))) + 1).cast("string").as("v")),
      struct(lit("price_bucket").as("f"),
        expr("floor(o_totalprice) div 50000").cast("string").as("v"))))
    val joint = Tables.read(spark, sfDir, "orders")
      .select(feats.as("fv"), col("o_orderstatus").as("c"))
      .groupBy(col("fv.f").as("f"), col("fv.v").as("v"), col("c"))
      .agg(count(lit(1)).as("nvc"))
      .localCheckpoint(true) // tiny cell frame; feeds every rollup below
    val nv = joint.groupBy("f", "v").agg(sum(col("nvc")).as("nv"))
    val nc = joint.groupBy("f", "c").agg(sum(col("nvc")).as("nc"))
    val nTot = joint.groupBy("f").agg(sum(col("nvc")).as("nn"))
    def termU(num: Column, weightDen: Column, lnDen: Column): Column =
      floor((-(num.cast(DoubleType) / weightDen.cast(DoubleType)) *
        log(num.cast(DoubleType) / lnDen.cast(DoubleType))) *
        lit(1000000.0) + lit(0.5)).cast(LongType)
    val condU = joint.join(broadcast(nv), Seq("f", "v"))
      .join(broadcast(nTot), Seq("f"))
      .select(col("f"), termU(col("nvc"), col("nn"), col("nv")).as("u"))
      .groupBy("f").agg(sum(col("u")).as("h_cond_u"))
    val labelU = nc.join(broadcast(nTot), Seq("f"))
      .select(col("f"), termU(col("nc"), col("nn"), col("nn")).as("u"))
      .groupBy("f").agg(sum(col("u")).as("h_label_u"))
    val nVals = nv.groupBy("f").agg(count(lit(1)).as("n_values"))
    labelU.join(condU, "f").join(nVals, "f")
      .select(col("f").as("feature"), col("n_values"), col("h_label_u"),
        col("h_cond_u"), (col("h_label_u") - col("h_cond_u")).as("ig_u"))
      .orderBy("feature")
  }

  private val q214Oracle: String = {
    val term = (num: String, wden: String, lden: String) =>
      s"CAST(floor((-(CAST($num AS DOUBLE) / $wden) * ln(CAST($num AS DOUBLE) / $lden)) * 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH joint AS (
       |  SELECT u.f AS f, u.v AS v, o_orderstatus AS c, count(*) AS nvc
       |  FROM (SELECT unnest([
       |      {'f': 'priority', 'v': CAST(o_orderpriority AS VARCHAR)},
       |      {'f': 'dow', 'v': CAST(isodow(CAST(o_orderdate AS DATE)) AS VARCHAR)},
       |      {'f': 'price_bucket',
       |       'v': CAST(CAST(floor(o_totalprice) AS BIGINT) // 50000 AS VARCHAR)}
       |    ]) AS u, o_orderstatus FROM orders)
       |  GROUP BY 1, 2, 3),
       |nv AS (SELECT f, v, CAST(sum(nvc) AS BIGINT) AS nv
       |  FROM joint GROUP BY 1, 2),
       |nc AS (SELECT f, c, CAST(sum(nvc) AS BIGINT) AS nc
       |  FROM joint GROUP BY 1, 2),
       |nt AS (SELECT f, CAST(sum(nvc) AS BIGINT) AS nn FROM joint GROUP BY 1),
       |cond AS (SELECT j.f, CAST(sum(${term("j.nvc", "nt.nn", "nv.nv")}) AS BIGINT) AS h_cond_u
       |  FROM joint j JOIN nv ON j.f = nv.f AND j.v = nv.v
       |  JOIN nt ON j.f = nt.f GROUP BY 1),
       |lab AS (SELECT nc.f, CAST(sum(${term("nc.nc", "nt.nn", "nt.nn")}) AS BIGINT) AS h_label_u
       |  FROM nc JOIN nt ON nc.f = nt.f GROUP BY 1),
       |vals AS (SELECT f, count(*) AS n_values FROM nv GROUP BY 1)
       |SELECT lab.f AS feature, vals.n_values, lab.h_label_u, cond.h_cond_u,
       |  lab.h_label_u - cond.h_cond_u AS ig_u
       |FROM lab JOIN cond ON lab.f = cond.f JOIN vals ON lab.f = vals.f
       |ORDER BY feature""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q212_pq_codebook", q212, Some(q212Oracle)),
    QueryDef("q213_median_of_means", q213, Some(q213Oracle)),
    QueryDef("q214_info_gain", q214, Some(q214Oracle)))
}

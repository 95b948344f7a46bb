package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.MixOps

/** Round-14 second wave — training-pipeline ops the ledger lacked:
  * deterministic reservoir sampling (q381), cross-source quantile
  * alignment (q382 — the batch-effect corrector), Fleiss' kappa
  * multi-rater agreement (q383), a per-dimension embedding health
  * audit (q384), a data-loader shuffle-quality audit (q385), and a
  * distribution-matching resampler (q386). Every statistic is an
  * exact integer (ppm/milli grids, DECIMAL cross-mults, sign-safe
  * trunc div) so the DuckDB oracle hash-matches at every SF.
  */
object Round14bQueries {

  private val P = MixOps.P // 2^31 - 1, the Lehmer modulus

  // -- q381: deterministic stratified reservoir sample ---------------------------
  // Uniform k-per-stratum sampling without a global sort: each doc
  // draws a PORTABLE two-round Lehmer priority (one round is monotone
  // on small ids — the known trap), and the k smallest priorities per
  // source win. At 100 TB this is one map-side priority projection +
  // a per-stratum top-k (TakeOrdered shape), never a shuffle of the
  // corpus; adding data can only evict, never reshuffle, picks.
  private val ResSeed = 17L
  private val ResK = 5

  private def q381(spark: SparkSession, sfDir: String): DataFrame = {
    val pr = ((col("doc_id") % P + lit(ResSeed)) * lit(48271L) % P +
      lit(1L)) * lit(69621L) % P
    val w = Window.partitionBy("source").orderBy(col("priority"),
      col("doc_id"))
    Tables.read(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), pr.as("priority"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= ResK)
      .orderBy("source", "rk")
  }

  private val q381Oracle: String =
    s"""WITH pr AS (SELECT source, doc_id,
       |    ((doc_id % $P + $ResSeed) * 48271 % $P + 1) * 69621 % $P
       |      AS priority
       |  FROM documents),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY priority, doc_id) AS rk FROM pr)
       |SELECT source, doc_id, priority, rk FROM rk
       |WHERE rk <= $ResK ORDER BY source, rk""".stripMargin

  // -- q382: cross-source quantile alignment --------------------------------------
  // Batch-effect correction for a quality signal (n_chars) that
  // drifts between crawl sources: map each source's decile boundary
  // onto the GLOBAL decile boundary at the same rank fraction (lower
  // order statistic at rank ceil(p*n) — exact, no interpolation) and
  // report the per-decile shift a normalizer would apply. Scale
  // shape (round 17, the WindowInventory gate's first catch): the
  // r14 form ranked every ROW under a ()-/(source)-partitioned
  // row_number — one task per source and one for the globe. Both
  // passes now ride LayoutOps.censusCum over the (source, n_chars)
  // VALUE census: the order statistic at rank r is the value whose
  // cumulative-count range contains r, so no row-grain sort exists
  // anywhere and every window is bucket-partitioned.
  private def q382(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "documents")
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds both cumulative passes
    val deciles = (1 to 9).map(_.toLong)
    def cuts(cen: DataFrame, part: Seq[String]): DataFrame = {
      val cum = graft.ops.LayoutOps.censusCum(cen, "n_chars", Seq("cnt"),
        inclusive = true, partCols = part)
      val totals = if (part.isEmpty) cen.agg(sum(col("cnt")).as("__n"))
        else cen.groupBy(part.map(col): _*).agg(sum(col("cnt")).as("__n"))
      val joined = if (part.isEmpty) cum.crossJoin(broadcast(totals))
        else cum.join(broadcast(totals), part)
      joined
        .withColumn("__d", explode(array(deciles.map(lit): _*)))
        // the order statistic sits at rank rk = floor(d*n/10) (the
        // r14 row_number pick: rk*10 <= d*n < (rk+1)*10); value v
        // holds ranks (cum_excl, cum_incl], so v is the cut iff
        // d*n >= 10*(cum_excl+1) and d*n <= 10*cum_incl + 9
        .where(col("__d") * col("__n") >=
            (col("__cum_cnt") - col("cnt") + 1) * 10 &&
          col("__d") * col("__n") <= col("__cum_cnt") * 10 + 9)
        .select((part.map(col) :+ col("__d").as("decile") :+
          col("n_chars").as("cut")): _*)
    }
    val src = cuts(census, Seq("source"))
    val glob = cuts(census.groupBy(col("n_chars"))
        .agg(sum(col("cnt")).as("cnt")), Nil)
      .select(col("decile"), col("cut").as("glob_cut"))
    src.join(broadcast(glob), "decile")
      .select(col("source"), col("decile"), col("cut").as("src_cut"),
        col("glob_cut"), (col("glob_cut") - col("cut")).as("shift"))
      .orderBy("source", "decile")
  }

  private val q382Oracle: String =
    """WITH ranked AS (SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n,
      |    row_number() OVER (ORDER BY n_chars) AS grk,
      |    count(*) OVER () AS gn
      |  FROM documents),
      |d AS (SELECT unnest(range(1, 10)) AS decile),
      |src AS (SELECT source, decile, n_chars AS src_cut
      |  FROM ranked, d
      |  WHERE rk * 10 - decile * n <= 0 AND (rk + 1) * 10 - decile * n > 0),
      |gcut AS (SELECT decile, n_chars AS glob_cut
      |  FROM ranked, d
      |  WHERE grk * 10 - decile * gn <= 0
      |    AND (grk + 1) * 10 - decile * gn > 0)
      |SELECT source, decile, src_cut, glob_cut,
      |  glob_cut - src_cut AS shift
      |FROM src JOIN gcut USING (decile)
      |ORDER BY source, decile""".stripMargin

  // -- q383: Fleiss' kappa multi-rater agreement ------------------------------------
  // Chance-corrected agreement for the q377 synthetic annotator panel
  // (5 raters, hash-seeded noise, labels 0..9): P_i from per-item
  // vote-count squares, P_e from category totals, and
  // kappa = (A*D2 - B*D1) / (D1*(D2 - B)) with A = sum(sum n_ij^2) - Nn,
  // D1 = Nn(n-1), B = sum C_j^2, D2 = (Nn)^2 — one exact rational on
  // DECIMAL products, ppm-gridded. Everything is census-grain after
  // the one vote scan.
  private val FkNoise = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L),
    (5L, 50L))

  private def q383(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ann = FkNoise.toDF("j", "nz")
    val votes = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("truth"))
      .crossJoin(broadcast(ann))
      .withColumn("h", expr("((((vec_id * 31 + j * 1000003)" +
        " * 1103515245 + 12345) % 2147483648) * 1103515245 + 54321)" +
        " % 2147483648"))
      .withColumn("vote", expr("CASE WHEN h % 100 < nz" +
        " THEN (truth + 1 + (h div 100) % 9) % 10 ELSE truth END"))
    val cells = votes.groupBy("vec_id", "vote")
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint(true) // feeds A, the category totals, and N
    val a = cells.groupBy("vec_id")
      .agg(sum(expr("nij * nij")).as("sq"), sum(col("nij")).as("n"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("sq - n")).as("a_num"))
    val b = cells.groupBy("vote").agg(sum(col("nij")).as("cj"))
      .agg(sum(expr("CAST(cj AS DECIMAL(38,0)) * cj")).as("b_num"))
    a.crossJoin(broadcast(b))
      .withColumn("nn", expr(s"n_items * ${FkNoise.size}L"))
      .withColumn("d1", expr(s"CAST(nn AS DECIMAL(38,0))" +
        s" * ${FkNoise.size - 1}L"))
      .withColumn("d2", expr("CAST(nn AS DECIMAL(38,0)) * nn"))
      .select(col("n_items"), lit(FkNoise.size.toLong).as("n_raters"),
        expr("CAST(CAST(a_num AS DECIMAL(38,0)) * 1000000 div d1" +
          " AS BIGINT)").as("pbar_ppm"),
        expr("CAST(b_num * 1000000 div d2 AS BIGINT)").as("pe_ppm"),
        expr("CAST((CAST(a_num AS DECIMAL(38,0)) * d2 - b_num * d1)" +
          " * 1000000 div (d1 * (d2 - b_num)) AS BIGINT)")
          .as("kappa_ppm"))
  }

  private val q383Oracle: String = {
    val n = FkNoise.size
    val vals = FkNoise.map { case (j, nz) => s"($j, $nz)" }.mkString(",")
    s"""WITH ann AS (SELECT * FROM (VALUES $vals) a(j, nz)),
       |v AS (SELECT vec_id, CAST(label AS BIGINT) AS truth, j, nz,
       |    ((((vec_id * 31 + j * 1000003) * 1103515245 + 12345)
       |      % 2147483648) * 1103515245 + 54321) % 2147483648 AS h
       |  FROM embeddings, ann),
       |votes AS (SELECT vec_id,
       |    CASE WHEN h % 100 < nz
       |      THEN (truth + 1 + (h // 100) % 9) % 10 ELSE truth END AS vote
       |  FROM v),
       |cells AS (SELECT vec_id, vote, count(*) AS nij FROM votes
       |  GROUP BY 1, 2),
       |ai AS (SELECT vec_id, sum(nij * nij) AS sq, sum(nij) AS n
       |  FROM cells GROUP BY 1),
       |a AS (SELECT count(*) AS n_items,
       |    CAST(sum(sq - n) AS HUGEINT) AS a_num FROM ai),
       |b AS (SELECT sum(CAST(cj AS HUGEINT) * cj) AS b_num FROM
       |  (SELECT vote, sum(nij) AS cj FROM cells GROUP BY 1)),
       |k AS (SELECT n_items, a_num, b_num,
       |    CAST(n_items * $n AS HUGEINT) AS nn FROM a, b)
       |SELECT n_items, CAST($n AS BIGINT) AS n_raters,
       |  CAST(a_num * 1000000 // (nn * ${n - 1}) AS BIGINT) AS pbar_ppm,
       |  CAST(b_num * 1000000 // (nn * nn) AS BIGINT) AS pe_ppm,
       |  CAST((a_num * (nn * nn) - b_num * (nn * ${n - 1})) * 1000000
       |    // ((nn * ${n - 1}) * (nn * nn - b_num)) AS BIGINT)
       |    AS kappa_ppm
       |FROM k""".stripMargin
  }

  // -- q384: per-dimension embedding health audit -----------------------------------
  // The "is this embedding column usable" checklist, per dimension on
  // the 1e-4 grid: mean (sign-safe — sums can be negative), variance
  // via the computational identity on DECIMAL squares, max |value|,
  // and a dead-dimension flag (variance 0). One posexplode + one
  // dimension-grain census; the corpus never shuffles at data grain.
  private def q384(spark: SparkSession, sfDir: String): DataFrame = {
    val flat = Tables.read(spark, sfDir, "embeddings")
      .select(posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
          " * 10000 + 0.5) AS BIGINT))")).as(Seq("dim", "v")))
    flat.groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("q"),
        max(abs(col("v"))).as("maxabs_u"))
      .select(col("dim"), col("n"),
        expr("CASE WHEN s < 0 THEN -((-s) div n) ELSE s div n END")
          .as("mean_u"),
        expr("CAST((q - CAST(s AS DECIMAL(38,0)) * s div n) div n" +
          " AS BIGINT)").as("var_u2"),
        col("maxabs_u"),
        expr("q - CAST(s AS DECIMAL(38,0)) * s div n = 0").as("dead"))
      .orderBy("dim")
  }

  private val q384Oracle: String =
    """WITH flat AS (SELECT
      |    unnest(list_transform(embedding, (x, i) -> {'dim': i - 1,
      |      'v': CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)}),
      |      recursive := true)
      |  FROM embeddings),
      |c AS (SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
      |    sum(CAST(v AS HUGEINT) * v) AS q, max(abs(v)) AS maxabs_u
      |  FROM flat GROUP BY 1)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mean_u,
      |  CAST((q - CAST(s AS HUGEINT) * s // n) // n AS BIGINT) AS var_u2,
      |  maxabs_u,
      |  q - CAST(s AS HUGEINT) * s // n = 0 AS dead
      |FROM c ORDER BY dim""".stripMargin

  // -- q385: data-loader shuffle-quality audit ---------------------------------------
  // Did the shuffle actually decorrelate the stream? Documents get the
  // portable seeded shard+position (MixOps.shuffleShard shape inlined
  // as expressions so the oracle replays it), then per shard: the
  // lag-1 autoregression slope of n_chars in position order
  // (milli grid, sign-safe — a good shuffle drives it to ~0) and the
  // count of mean-crossings between adjacent positions (runs signal;
  // compares x*n vs sum cross-multiplied, no division). One window
  // pass per shard, shard frames are constants.
  private val ShufSeed = 29L
  private val ShufShards = 4

  private def q385(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = (col("doc_id") % P + lit(ShufSeed)) * lit(48271L) % P
    val h2 = (h1 + lit(1L)) * lit(69621L) % P
    val w = Window.partitionBy("shard").orderBy(col("pos"), col("doc_id"))
    val seq0 = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars").as("x"),
        (h1 % ShufShards).as("shard"), h2.as("pos"))
      .withColumn("lx", lag("x", 1).over(w))
      .localCheckpoint(true) // feeds the moment census AND the runs pass
    val mom = seq0.groupBy("shard").agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(when(col("lx").isNotNull,
        expr("CAST(x AS DECIMAL(38,0)) * lx")).otherwise(lit(0L)))
        .as("sxy"),
      count(col("lx")).as("np"))
    val runs = seq0.join(broadcast(
      seq0.groupBy(col("shard").as("__s"))
        .agg(count(lit(1)).as("__n"), sum(col("x")).as("__sx"))),
      col("shard") === col("__s"))
      .groupBy("shard")
      .agg(sum(when(col("lx").isNotNull &&
        ((col("x") * col("__n") - col("__sx")) *
          (col("lx") * col("__n") - col("__sx")) < 0), 1L)
        .otherwise(0L)).as("mean_crossings"))
    mom.join(runs, "shard")
      .select(col("shard"), col("n"), col("mean_crossings"),
        // AR(1) slope over the np lagged pairs: treat x/lx sums as the
        // full-shard sums (end effects are 1/n — fine for an audit,
        // and EXACTLY replayed by the oracle)
        expr("CASE WHEN np * sxx - CAST(sx AS DECIMAL(38,0)) * sx <= 0" +
          " THEN 0L ELSE CAST(CASE WHEN np * sxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sx < 0" +
          " THEN -((-(np * sxy - CAST(sx AS DECIMAL(38,0)) * sx)) * 1000" +
          " div (np * sxx - CAST(sx AS DECIMAL(38,0)) * sx))" +
          " ELSE (np * sxy - CAST(sx AS DECIMAL(38,0)) * sx) * 1000" +
          " div (np * sxx - CAST(sx AS DECIMAL(38,0)) * sx) END" +
          " AS BIGINT) END").as("ar1_milli"))
      .orderBy("shard")
  }

  private val q385Oracle: String =
    s"""WITH b AS (SELECT doc_id, n_chars AS x,
       |    (doc_id % $P + $ShufSeed) * 48271 % $P AS h1
       |  FROM documents),
       |s AS (SELECT doc_id, x, h1 % $ShufShards AS shard,
       |    (h1 + 1) * 69621 % $P AS pos FROM b),
       |l AS (SELECT *, lag(x) OVER (PARTITION BY shard
       |    ORDER BY pos, doc_id) AS lx FROM s),
       |mom AS (SELECT shard, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    CAST(sum(CASE WHEN lx IS NOT NULL
       |      THEN CAST(x AS HUGEINT) * lx ELSE 0 END) AS HUGEINT) AS sxy,
       |    count(lx) AS np
       |  FROM l GROUP BY 1),
       |runs AS (SELECT l.shard,
       |    count(CASE WHEN lx IS NOT NULL AND
       |      (CAST(x AS HUGEINT) * m.n - m.sx) *
       |      (CAST(lx AS HUGEINT) * m.n - m.sx) < 0 THEN 1 END)
       |      AS mean_crossings
       |  FROM l JOIN mom m ON l.shard = m.shard GROUP BY 1)
       |SELECT mom.shard, n, mean_crossings,
       |  CASE WHEN np * sxx - CAST(sx AS HUGEINT) * sx <= 0 THEN 0
       |    ELSE CAST(CASE WHEN np * sxy - CAST(sx AS HUGEINT) * sx < 0
       |      THEN -((-(np * sxy - CAST(sx AS HUGEINT) * sx)) * 1000
       |        // (np * sxx - CAST(sx AS HUGEINT) * sx))
       |      ELSE (np * sxy - CAST(sx AS HUGEINT) * sx) * 1000
       |        // (np * sxx - CAST(sx AS HUGEINT) * sx) END AS BIGINT)
       |  END AS ar1_milli
       |FROM mom JOIN runs ON mom.shard = runs.shard
       |ORDER BY mom.shard""".stripMargin

  // -- q386: distribution-matching resampler ------------------------------------------
  // Make every source's length distribution match the corpus: per
  // (source, length bucket), accept ratio = min(1, target_share /
  // source_share) as one exact rational (n_b*n_s vs N*n_sb
  // cross-mult), with the expected kept count — the plan a quota
  // resampler executes. One census; everything after is
  // bucket-grain.
  private def q386(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("source"), least(expr("n_chars div 200"), lit(10L))
        .as("bucket"))
    val cells = docs.groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_sb"))
      .localCheckpoint(true) // feeds all three rollups
    val bySrc = cells.groupBy("source").agg(sum(col("n_sb")).as("n_s"))
    val byBkt = cells.groupBy("bucket").agg(sum(col("n_sb")).as("n_b"))
    val tot = cells.agg(sum(col("n_sb")).as("nn"))
    cells.join(broadcast(bySrc), "source").join(broadcast(byBkt), "bucket")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("bucket"), col("n_sb"),
        expr("CAST(n_sb AS DECIMAL(38,0)) * 1000000 div n_s")
          .cast("long").as("src_share_ppm"),
        expr("CAST(n_b AS DECIMAL(38,0)) * 1000000 div nn")
          .cast("long").as("tgt_share_ppm"),
        expr("least(1000000L, CAST(CAST(n_b AS DECIMAL(38,0)) * n_s" +
          " * 1000000 div (CAST(nn AS DECIMAL(38,0)) * n_sb) AS BIGINT))")
          .as("accept_ppm"))
      .withColumn("expected_kept",
        expr("n_sb * accept_ppm div 1000000"))
      .orderBy("source", "bucket")
  }

  private val q386Oracle: String =
    """WITH d AS (SELECT source, least(n_chars // 200, 10) AS bucket
      |  FROM documents),
      |cells AS (SELECT source, bucket, count(*) AS n_sb FROM d
      |  GROUP BY 1, 2),
      |bs AS (SELECT source, sum(n_sb) AS n_s FROM cells GROUP BY 1),
      |bb AS (SELECT bucket, sum(n_sb) AS n_b FROM cells GROUP BY 1),
      |t AS (SELECT sum(n_sb) AS nn FROM cells)
      |SELECT source, bucket, n_sb,
      |  CAST(CAST(n_sb AS HUGEINT) * 1000000 // n_s AS BIGINT)
      |    AS src_share_ppm,
      |  CAST(CAST(n_b AS HUGEINT) * 1000000 // nn AS BIGINT)
      |    AS tgt_share_ppm,
      |  least(1000000, CAST(CAST(n_b AS HUGEINT) * n_s * 1000000
      |    // (CAST(nn AS HUGEINT) * n_sb) AS BIGINT)) AS accept_ppm,
      |  CAST(n_sb * least(1000000, CAST(CAST(n_b AS HUGEINT) * n_s
      |    * 1000000 // (CAST(nn AS HUGEINT) * n_sb) AS BIGINT))
      |    // 1000000 AS BIGINT) AS expected_kept
      |FROM cells JOIN bs USING (source) JOIN bb USING (bucket)
      |CROSS JOIN t
      |ORDER BY source, bucket""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q381_reservoir_sample", q381, Some(q381Oracle)),
    QueryDef("q382_quantile_align", q382, Some(q382Oracle)),
    QueryDef("q383_fleiss_kappa", q383, Some(q383Oracle)),
    QueryDef("q384_embedding_dim_audit", q384, Some(q384Oracle)),
    QueryDef("q385_shuffle_audit", q385, Some(q385Oracle)),
    QueryDef("q386_dist_match", q386, Some(q386Oracle)),
  )
}

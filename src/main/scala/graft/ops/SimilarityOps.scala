package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross
  *    join of the (small) query set against the corpus. This is the
  *    correctness baseline and, with a broadcast query side, also the
  *    right 100 TB shape for "few queries vs huge corpus" (one scan,
  *    no shuffle of the corpus; per-partition top-k then a tiny final
  *    merge via the window).
  *  - [[annTopK]] — random-hyperplane LSH: bucket signatures per
  *    table, candidates = bucket collisions, exact cosine re-rank.
  *    At scale this replaces the full scan with a (bucket, table)
  *    shuffle join — the classic sub-linear ANN trade.
  *
  * All float math is done in DOUBLE after an explicit element cast
  * (DuckDB promotes float lists differently), and ranking happens on
  * cosine ROUNDED to 4 decimals with an id tiebreak, so both engines
  * rank identically despite last-ulp summation differences.
  */
object SimilarityOps {

  /** Elementwise float→double cast. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** HOF forms: the executable spec of the vector math (interpreted
    * per element — hot paths use the [[VectorKernels]] StaticInvoke
    * twins below; OpsSpec pins kernel == HOF).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Kernel-backed dot product (inputs must already be array<double>). */
  def dot(a: Column, b: Column): Column = ExprBridge.column(StaticInvoke(
    VectorKernels.getClass, DoubleType, "dot",
    Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
    Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
    propagateNull = true, returnNullable = true))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Kernel-backed one-pass cosine. Zero-norm inputs are outside the
    * contract: the kernel's Java division yields NaN where the HOF
    * spec form throws under ANSI mode.
    */
  def cosine(a: Column, b: Column): Column = ExprBridge.column(StaticInvoke(
    VectorKernels.getClass, DoubleType, "cosine",
    Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
    Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
    propagateNull = true, returnNullable = true))

  /** Kernel-backed JL ±1 projection on the 1e-4 grid (input must be
    * array<double>; returns array<bigint> of length `outDims`). The
    * sign stream is the two-round Lehmer hash over (i·outDims + j) —
    * see [[VectorKernels.jlProject]].
    */
  def jlProject(v: Column, outDims: Int, seed: Long): Column =
    ExprBridge.column(StaticInvoke(
      VectorKernels.getClass, ArrayType(LongType), "jlProject",
      Seq(ExprBridge.expression(v), Literal(outDims), Literal(seed)),
      Seq(ArrayType(DoubleType), IntegerType,
        org.apache.spark.sql.types.LongType),
      propagateNull = true, returnNullable = true))

  /** Kernel-backed squared distance on the 1e-4 grid (exact long). */
  def gridSqDist(a: Column, b: Column): Column =
    ExprBridge.column(StaticInvoke(
      VectorKernels.getClass, LongType, "gridSqDist",
      Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
      Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true))

  /** Kernel-backed squared distance between long vectors. */
  def sqDistLong(a: Column, b: Column): Column =
    ExprBridge.column(StaticInvoke(
      VectorKernels.getClass, LongType, "sqDistLong",
      Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
      Seq(ArrayType(LongType), ArrayType(LongType)),
      propagateNull = true, returnNullable = true))

  private val LehmerP = 2147483647L

  /** [[jlProject]] oracle rendering (identical integer formula). */
  def jlProjectSql(vE: String, outDims: Int, seed: Long): String =
    s"list_transform(range(0, $outDims), __j -> " +
      s"list_sum(list_transform(range(1, len($vE) + 1), __i -> " +
      s"CAST(floor(CAST(($vE)[__i] AS DOUBLE) * 10000 + 0.5) AS BIGINT)" +
      s" * (1 - 2 * (((((((__i - 1) * $outDims + __j) % $LehmerP + $seed)" +
      s" * 48271) % $LehmerP + 1) * 69621) % $LehmerP % 2)))))"

  /** [[gridSqDist]] oracle rendering ((d)*(d), never `**` — DuckDB's
    * power operator returns DOUBLE and would break integer exactness).
    */
  def gridSqDistSql(a: String, b: String): String = {
    def g(e: String) =
      s"CAST(floor(CAST(($e)[__i] AS DOUBLE) * 10000 + 0.5) AS BIGINT)"
    s"list_sum(list_transform(range(1, len($a) + 1), __i -> " +
      s"(${g(a)} - ${g(b)}) * (${g(a)} - ${g(b)})))"
  }

  /** [[sqDistLong]] oracle rendering. */
  def sqDistLongSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), __i -> " +
      s"(($a)[__i] - ($b)[__i]) * (($a)[__i] - ($b)[__i])))"

  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), __i -> ($a)[__i] * ($b)[__i])) AS DOUBLE)"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Rounded cosine used for ranking (see class doc). */
  private def cos4(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)

  /** Exact cosine top-k: for every query vector, the k nearest corpus
    * vectors (self excluded). Query side is broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  // ---- random-hyperplane LSH -------------------------------------------

  /** Deterministic pseudo-random hyperplane coefficient for
    * (table t, bit b, dim i): exact integer mixing, then one exact
    * division — bit-identical in any IEEE engine.
    */
  def planeCoef(t: Int, b: Int, i: Int, dims: Int, bits: Int): Double = {
    val x = (((t.toLong * bits + b) * dims + i + 1L) * 2654435761L) % 2147483647L
    x.toDouble / 2147483647.0 - 0.5
  }

  /** Bucket signature for one LSH table: an int whose bit b is the
    * sign of the projection onto hyperplane (t, b). HOF spec form.
    */
  def bucketHof(v: Column, t: Int, dims: Int, bits: Int): Column =
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(v, array((0 until dims).map(i => lit(planeCoef(t, b, i, dims, bits))): _*),
          (x, p) => x * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Kernel-backed bucket signature (input must be array<double>). */
  def bucket(v: Column, t: Int, dims: Int, bits: Int): Column =
    ExprBridge.column(StaticInvoke(
      VectorKernels.getClass, LongType, "bucket",
      Seq(ExprBridge.expression(v), Literal(t), Literal(dims), Literal(bits)),
      Seq(ArrayType(DoubleType), IntegerType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  def bucketSql(vE: String, t: Int, dims: Int, bits: Int): String = {
    val terms = (0 until bits).map { b =>
      val planes = (0 until dims).map(i => planeCoef(t, b, i, dims, bits)).mkString("[", ", ", "]")
      s"CASE WHEN CAST(list_sum(list_transform(range(1, $dims + 1), __i -> ($vE)[__i] * ($planes)[__i])) AS DOUBLE) > 0 THEN ${1L << b} ELSE 0 END"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Result of [[nearDupPairsWithStats]]: the verified pairs plus the
    * skipped hot-bucket counts as a queryable `(t, bk, n)` frame.
    */
  final case class EmbNearDupResult(pairs: DataFrame, skippedBuckets: DataFrame)

  /** A production-reasonable `maxBucketSize` (the parameter itself
    * defaults to uncapped so the exact-oracle queries stay bit-true):
    * 2^16 members ≈ 2·10^9 candidate pairs from one degenerate bucket —
    * past this the self-join cost is pathological, not similarity.
    * Twin of [[DedupOps.defaultMaxBandSize]].
    */
  val defaultMaxBucketSize: Int = 1 << 16

  /** Embedding near-duplicate pairs: hyperplane-LSH bucket candidates
    * self-joined per table, verified with exact rounded cosine >=
    * `threshold`. Identical vectors share identical signatures, so
    * exact duplicates are found with guaranteed recall; near-dups
    * follow the usual LSH recall curve.
    */
  def nearDupPairs(
      corpus: DataFrame, threshold: Double,
      tables: Int = 2, bits: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = Int.MaxValue): DataFrame =
    nearDupPairsWithStats(corpus, threshold, tables, bits, dims,
      idCol, vecCol, maxBucketSize).pairs

  /** [[nearDupPairs]] plus the skipped-hot-bucket counts. Same scale
    * shape as the text twin [[DedupOps.nearDupPairsWithStats]]:
    *
    *  - the (t, bk) self-join carries ONLY 8-byte ids — the 64-dim
    *    double vectors are joined back BY ID after the candidate set
    *    is deduped, so a pair colliding in several tables ships its
    *    vectors exactly once, never through the bucket exchange;
    *  - `maxBucketSize` drops degenerate buckets (e.g. near-constant
    *    embeddings collapsing every row into one signature) BEFORE the
    *    O(bucket²) self-join; skipped buckets are surfaced as data
    *    rather than silently truncated. Pairs appearing only in a
    *    skipped bucket are lost — the other `tables-1` signatures
    *    usually recover real near-dups, and a bucket that holds a
    *    macroscopic corpus fraction is pathological by construction.
    */
  def nearDupPairsWithStats(
      corpus: DataFrame, threshold: Double,
      tables: Int = 2, bits: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = Int.MaxValue): EmbNearDupResult = {
    // MEMORY_AND_DISK: the vector frame is read once for signatures and
    // twice for verification; callers consume eagerly, then it's evictable
    val vecs = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBuckets = vecs
      .select(col("vec_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucket(col("v"), t, dims, bits).as("bk"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val (bucketsDf, skipped) =
      if (maxBucketSize == Int.MaxValue) {
        // empty frame from the SAME aggregate as the capped branch so the
        // schemas can never drift; Filter(false) folds to LocalRelation
        val none = allBuckets.groupBy("t", "bk").agg(count(lit(1)).as("n"))
          .where(lit(false))
        (allBuckets, none)
      } else {
        // checkpoint: the hot-bucket aggregate feeds the warning probe,
        // the anti-join, AND the returned stats frame
        val hot = allBuckets.groupBy("t", "bk").agg(count(lit(1)).as("n"))
          .where(col("n") > maxBucketSize)
          .localCheckpoint(true)
        val hotRows = hot.limit(20).collect()
        if (hotRows.nonEmpty) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"nearDupPairs: skipping ${hotRows.length}+ LSH buckets over " +
              s"$maxBucketSize members, e.g. " +
              hotRows.take(3).map(r => s"(t=${r.get(0)},bk=${r.get(1)},n=${r.getLong(2)})")
                .mkString(", "))
        }
        (allBuckets.join(hot.select("t", "bk"), Seq("t", "bk"), "left_anti"), hot)
      }
    // ids-only candidate generation: ONE shuffle on (t, bk), pairs
    // deduped BEFORE any vector moves
    val cand = bucketsDf.select(col("t"), col("bk"), col("vec_id").as("id_a"))
      .join(bucketsDf.select(col("t"), col("bk"), col("vec_id").as("id_b")),
        Seq("t", "bk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val out = cand
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cos4(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
    // materialize the (small) verified set while the vector cache is hot,
    // then release it so repeated calls don't accumulate blocks
    val checkpointed = out.localCheckpoint(true)
    vecs.unpersist()
    EmbNearDupResult(checkpointed, skipped)
  }

  /** IVF-style ANN: the first `nCentroids` corpus vectors (by id) act
    * as a deterministic coarse quantizer. Assignment is ONE map-side
    * projection — the centroids are collected (bounded by
    * `nCentroids`) and inlined as literals, so each row costs
    * `nCentroids` kernel cosines and the corpus never shuffles for
    * assignment. Queries probe their `nprobe` nearest cells;
    * candidates = cell collisions; exact rounded-cosine re-rank.
    *
    * vs [[annTopK]] (random hyperplanes): IVF cells adapt to the data
    * distribution — the classic trade is better recall per probe on
    * clustered embeddings, at the cost of a (tiny) training/collect
    * step. Ties and ranking use the same rounded-cosine + id ordering
    * as the rest of the module, so the DuckDB oracle replicates cell
    * assignment bit-for-bit.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 8, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cents: Array[(Long, Seq[Double])] = c.orderBy("vec_id").limit(nCentroids)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def cellStructs(vec: Column) = array(cents.map { case (cid, cv) =>
      struct((-cos4(vec, typedLit(cv))).as("nc"), lit(cid).as("cid"))
    }: _*)
    val assigned = c.select(col("vec_id"), col("v"),
      element_at(array_sort(cellStructs(col("v"))), 1).getField("cid").as("cell"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(slice(array_sort(cellStructs(col("qv"))), 1, nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cid").as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  // ---- k-means (Lloyd) --------------------------------------------------

  /** Round-half-up to 4 decimals, driver-side — MUST stay the exact
    * formula of `Norm.n4`/`OracleSql.n4` (floor(x·10⁴ + 0.5)/10⁴): the
    * k-means parity contract is that both engines round centroids and
    * distances to the same rationals at every step.
    */
  private def n4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Lloyd's k-means over an embedding column — the training step that
    * PRODUCES the coarse quantizer [[ivfTopK]] consumes. Deterministic
    * end-to-end: init = the `k` lowest-id vectors; every centroid
    * coordinate and every assignment distance is rounded to 4 decimals
    * with a cell-index tiebreak, so any IEEE engine (and the DuckDB
    * oracle) reproduces identical cells at every iteration. `iters` is
    * the number of ASSIGNMENT passes (iters-1 centroid updates).
    *
    * Scale shape: assignment is a pure map-side projection against
    * k·d inlined centroid literals (the corpus never shuffles); each
    * update is ONE partial+final aggregate over (cell, dim) — k·d
    * groups — whose k·d means flow driver-ward and come back as next
    * round's literals. The classic distributed-k-means layout: per-
    * iteration cost is one scan, driver state is O(k·d), independent
    * of corpus size. Squared-L2 argmin drops the per-row ‖v‖² term
    * (constant within a row), so each distance is one kernel dot.
    *
    * An empty cell is dropped (its index simply stops being assigned)
    * — mirrored by the oracle, which re-derives surviving cells per
    * round.
    */
  def kmeansAssign(df: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, _) = kmeansTrain(df, k, iters, idCol, vecCol)
    assigned.select(col("id").as(idCol), col("cell"))
  }

  /** Shared Lloyd trainer: the final-assignment frame (id, v, cell)
    * plus the final (n4-rounded) centroid literals it was assigned
    * against. Consumed by [[kmeansAssign]] and [[kmeansOutliers]].
    */
  private def kmeansTrain(df: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): (DataFrame, Seq[(Int, Array[Double])]) = {
    require(k > 0 && iters > 0, s"k/iters must be positive: $k/$iters")
    // MEMORY_AND_DISK: every Lloyd iteration re-scans `base` (init probe +
    // iters assignment passes) — at 100 TB an un-persisted base would pay
    // `iters` full source scans. Callers consume the returned assignment
    // frame eagerly; the cache is released after the final assignment is
    // checkpointed below.
    val base = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def assign(cents: Seq[(Int, Array[Double])]): DataFrame = {
      val scored = cents.map { case (j, c) =>
        val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
        val s = floor((lit(cc) - lit(2.0) * dot(col("v"), typedLit(c.toSeq)))
          * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
        struct(s.as("s"), lit(j).as("j"))
      }
      base.withColumn("cell", array_min(array(scored: _*)).getField("j"))
    }
    var cents: Seq[(Int, Array[Double])] = base.orderBy("id").limit(k).collect()
      .toSeq.zipWithIndex.map { case (r, j) =>
        j -> r.getSeq[Double](1).map(n4d).toArray }
    for (_ <- 1 until iters)
      cents = assign(cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("m"))
        .collect().groupBy(_.getInt(0))
        .toSeq.map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(r => n4d(r.getDouble(2))).toArray
        }.sortBy(_._1)
    // The cached blocks have served the init probe + iters-1 update
    // passes; the returned FINAL assignment is a pure map-side projection
    // the caller consumes once, so release the cache now (one fresh
    // source scan) rather than leaking blocks past the call.
    val finalAssign = assign(cents)
    base.unpersist()
    (finalAssign, cents)
  }

  /** Embedding-space outlier gate: flag the farthest `100 - pct`% of
    * vectors WITHIN each k-means cell (distance to own centroid) — the
    * standard "drop embedding-space noise" curation filter, cluster-
    * relative so a dense topic cluster doesn't mask outliers in a
    * sparse one. Returns (idCol, cell, d4, is_out).
    *
    * The cut is PURE INTEGER: rank within cell by (n4 distance, id)
    * and flag `rank·100 > pct·cellCount` — no float threshold exists
    * anywhere, so there is no interpolated-percentile boundary for two
    * engines to disagree on (d4 itself is the proven q76 rounding
    * contract: true squared L2 on the n4 grid).
    *
    * Scale shape: training is [[kmeansAssign]]'s map-side loop; the
    * distance is one kernel dot against the row's own centroid literal
    * (map-side CASE over k entries); the rank is ONE hash shuffle on
    * `cell` — k large groups, the same layout class as the q66 shard
    * window.
    */
  def kmeansOutliers(df: DataFrame, k: Int, iters: Int, pct: Int = 95,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(pct > 0 && pct < 100, s"pct must be in (0, 100): $pct")
    val (assigned, cents) = kmeansTrain(df, k, iters, idCol, vecCol)
    val ccCol = cents.foldLeft(lit(null).cast(DoubleType)) {
      case (els, (j, c)) =>
        when(col("cell") === j,
          lit(c.foldLeft(0.0)((acc, x) => acc + x * x))).otherwise(els)
    }
    val dotCol = cents.foldLeft(lit(null).cast(DoubleType)) {
      case (els, (j, c)) =>
        when(col("cell") === j, dot(col("v"), typedLit(c.toSeq))).otherwise(els)
    }
    val d4 = floor((dot(col("v"), col("v")) + ccCol - lit(2.0) * dotCol)
      * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
    val w = Window.partitionBy("cell").orderBy(col("d4"), col("id"))
    val wc = Window.partitionBy("cell")
    assigned.select(col("id"), col("cell"), d4.as("d4"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("nc", count(lit(1)).over(wc))
      .select(col("id").as(idCol), col("cell"), col("d4"),
        (col("rk") * 100L > lit(pct.toLong) * col("nc")).cast("int").as("is_out"))
  }

  /** [[kmeansAssign]] oracle rendering (same init, rounding, and
    * tiebreak; one CTE pair per round).
    */
  def kmeansSql(table: String, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): String =
    kmeansCte(table, k, iters, idCol, vecCol) +
      s"\nSELECT $idCol, CAST(cell AS INTEGER) AS cell FROM a$iters ORDER BY $idCol"

  /** Shared WITH-prefix for the k-means oracles: ends at the final
    * assignment CTE `a<iters>` (columns idCol, v, cell); the final
    * centroids it was assigned against are `c<iters-1>`. Append
    * further CTEs with a leading comma.
    */
  private def kmeansCte(table: String, k: Int, iters: Int,
      idCol: String, vecCol: String): String = {
    def n4(e: String) = s"(floor(($e) * 10000 + 0.5) / 10000.0)"
    val init =
      s"""c0 AS (SELECT row_number() OVER (ORDER BY $idCol) - 1 AS j,
         |  list_transform(v, x -> ${n4("x")}) AS c
         |  FROM e ORDER BY $idCol LIMIT $k)""".stripMargin
    val rounds = (1 to iters).flatMap { i =>
      val assign =
        s"""a$i AS (SELECT $idCol, v, j AS cell FROM (
           |  SELECT e.$idCol, e.v, cw.j,
           |    row_number() OVER (PARTITION BY e.$idCol
           |      ORDER BY ${n4(s"cw.cc - 2 * ${dotSql("e.v", "cw.c")}")}, cw.j) AS rn
           |  FROM e CROSS JOIN (SELECT j, c, ${dotSql("c", "c")} AS cc FROM c${i - 1}) cw) t
           |  WHERE rn = 1)""".stripMargin
      val update =
        if (i == iters) None
        else Some(
          s"""c$i AS (SELECT cell AS j, list(m ORDER BY dim) AS c FROM (
             |  SELECT cell, u.i AS dim, ${n4("avg(u.x)")} AS m FROM (
             |    SELECT cell, unnest(list_transform(range(1, len(v) + 1),
             |      i -> {'i': i, 'x': v[i]})) AS u
             |    FROM a$i) GROUP BY cell, u.i) GROUP BY cell)""".stripMargin)
      Seq(assign) ++ update
    }
    s"WITH e AS (SELECT $idCol, list_transform($vecCol, x -> CAST(x AS DOUBLE)) AS v FROM $table),\n" +
      (Seq(init) ++ rounds).mkString(",\n")
  }

  /** [[kmeansOutliers]] oracle rendering (same trajectory, same n4
    * squared-L2, same integer rank cut).
    */
  def kmeansOutliersSql(table: String, k: Int, iters: Int, pct: Int = 95,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    def n4(e: String) = s"(floor(($e) * 10000 + 0.5) / 10000.0)"
    kmeansCte(table, k, iters, idCol, vecCol) +
      s""",
         |dd AS (SELECT a.$idCol, a.cell,
         |  ${n4(s"${dotSql("a.v", "a.v")} + cw.cc - 2 * ${dotSql("a.v", "cw.c")}")} AS d4
         |  FROM a$iters a JOIN (SELECT j, c, ${dotSql("c", "c")} AS cc
         |                       FROM c${iters - 1}) cw ON a.cell = cw.j),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cell ORDER BY d4, $idCol) AS rk,
         |         count(*) OVER (PARTITION BY cell) AS nc FROM dd)
         |SELECT $idCol, CAST(cell AS INTEGER) AS cell, d4,
         |  CAST(rk * 100 > $pct * nc AS INTEGER) AS is_out
         |FROM rk ORDER BY $idCol""".stripMargin
  }

  /** Davies–Bouldin cluster-quality index over [[kmeansAssign]]'s
    * clustering: per cluster i, scatter S_i = mean member→centroid
    * distance; separation M_ij = centroid→centroid distance;
    * R_i = max_{j≠i} (S_i+S_j)/M_ij; DB = mean_i R_i (lower =
    * tighter/better-separated). The cluster-quality grader the q76
    * trainer and its IVF consumers (q49/q230) owed.
    *
    * Exactness contract (the q76 discipline end-to-end): every
    * SQUARED distance lands on the n4 grid (the proven trainer
    * rounding), then `floor(sqrt·1e4+0.5)` fixes each distance as an
    * integer in 1e-4 units — sqrt is IEEE-correctly-rounded in both
    * engines, so identical inputs give identical integers. S_i is an
    * integer-div mean, every ratio an integer ppm pick, and DB the
    * integer-div mean of R_i — nothing order-sensitive anywhere.
    *
    * Scale shape: training is the map-side Lloyd loop; the member
    * distance is one kernel dot against the row's own centroid
    * literal; S is ONE k-group partial+final aggregate. Everything
    * after (pairwise M, R, DB) rides k-row frames — k², not data².
    *
    * Returns (cell, n_members, s_u, r_max_ppm, db_ppm) ordered by
    * cell; `r_max_ppm` is NULL for a cell with no positive-distance
    * peer (duplicate centroids).
    */
  def daviesBouldin(df: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, cents) = kmeansTrain(df, k, iters, idCol, vecCol)
    val ccCol = cents.foldLeft(lit(null).cast(DoubleType)) {
      case (els, (j, c)) =>
        when(col("cell") === j,
          lit(c.foldLeft(0.0)((acc, x) => acc + x * x))).otherwise(els)
    }
    val dotCol = cents.foldLeft(lit(null).cast(DoubleType)) {
      case (els, (j, c)) =>
        when(col("cell") === j, dot(col("v"), typedLit(c.toSeq))).otherwise(els)
    }
    val d4 = floor((dot(col("v"), col("v")) + ccCol - lit(2.0) * dotCol)
      * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
    val distU = floor(sqrt(d4) * lit(10000d) + lit(0.5d)).cast("long")
    val s = assigned.select(col("cell"), distU.as("dist_u"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        expr("sum(dist_u) div count(1)").as("s_u"))
      .localCheckpoint(true) // k-row frame read by both R joins + output
    // centroid pair separations: k² driver-side constants on the SAME
    // grid (sequential dot = the kernel/list_sum order)
    def seqDot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = (for {
      (i, ci) <- cents; (j, cj) <- cents if i != j
    } yield {
      val m24 = n4d(seqDot(ci, ci) + seqDot(cj, cj) - 2 * seqDot(ci, cj))
      (i, j, math.floor(math.sqrt(m24) * 10000 + 0.5).toLong)
    }).toDF("i", "j", "m_u")
    val r = pairs.where(col("m_u") > 0)
      .join(broadcast(s.select(col("cell").as("i"), col("s_u").as("si"))), "i")
      .join(broadcast(s.select(col("cell").as("j"), col("s_u").as("sj"))), "j")
      .groupBy(col("i").as("cell"))
      .agg(max(expr("(si + sj) * 1000000 div m_u")).as("r_max_ppm"))
    val db = r.agg(expr("sum(r_max_ppm) div count(1)").as("db_ppm"))
    s.join(broadcast(r), Seq("cell"), "left")
      .crossJoin(broadcast(db))
      .select(col("cell"), col("n_members"), col("s_u"),
        col("r_max_ppm"), col("db_ppm"))
      .orderBy("cell")
  }

  /** [[daviesBouldin]] oracle rendering (same trajectory, same n4
    * squared distances, same integer sqrt grid and ppm picks).
    */
  def daviesBouldinSql(table: String, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    def n4(e: String) = s"(floor(($e) * 10000 + 0.5) / 10000.0)"
    val cw = s"SELECT j, c, ${dotSql("c", "c")} AS cc FROM c${iters - 1}"
    kmeansCte(table, k, iters, idCol, vecCol) +
      s""",
         |dd AS (SELECT a.cell, CAST(floor(sqrt(
         |    ${n4(s"${dotSql("a.v", "a.v")} + cw.cc - 2 * ${dotSql("a.v", "cw.c")}")})
         |    * 10000 + 0.5) AS BIGINT) AS dist_u
         |  FROM a$iters a JOIN ($cw) cw ON a.cell = cw.j),
         |s AS (SELECT cell, count(*) AS n_members,
         |    CAST(sum(dist_u) // count(*) AS BIGINT) AS s_u
         |  FROM dd GROUP BY 1),
         |m AS (SELECT ci.j AS i, cj.j AS j2, CAST(floor(sqrt(
         |    ${n4(s"ci.cc + cj.cc - 2 * ${dotSql("ci.c", "cj.c")}")})
         |    * 10000 + 0.5) AS BIGINT) AS m_u
         |  FROM ($cw) ci, ($cw) cj WHERE ci.j <> cj.j),
         |r AS (SELECT m.i AS cell,
         |    CAST(max((si.s_u + sj.s_u) * 1000000 // m_u) AS BIGINT)
         |      AS r_max_ppm
         |  FROM m JOIN s si ON si.cell = m.i JOIN s sj ON sj.cell = m.j2
         |  WHERE m_u > 0 GROUP BY 1),
         |db AS (SELECT CAST(sum(r_max_ppm) // count(*) AS BIGINT)
         |    AS db_ppm FROM r)
         |SELECT CAST(s.cell AS INTEGER) AS cell, s.n_members, s.s_u,
         |  r.r_max_ppm, db.db_ppm
         |FROM s LEFT JOIN r ON r.cell = s.cell CROSS JOIN db
         |ORDER BY s.cell""".stripMargin
  }

  // ---- PCA (top principal component, power iteration) --------------------

  /** Top principal component of the embedding cloud via DETERMINISTIC
    * power iteration — the linear-algebra primitive behind embedding
    * whitening, drift monitoring, and low-rank debiasing. `iters`
    * fixed matrix-free iterations of v ← normalize(Cov·v), with
    * Cov·v never materializing the d×d covariance:
    * Cov·v = avg_rows((x−μ)·s) with s = (x−μ)·v, i.e. ONE scan per
    * iteration computing a per-row scalar and a per-dim aggregate
    * (the scaling by avg instead of sum is irrelevant to the
    * normalized direction).
    *
    * Determinism contract (the q76 k-means discipline): μ, every
    * per-row score s, every aggregated component, and every
    * normalized coordinate land on the n4 grid before reuse; the
    * per-row dot runs against inlined literals (left-to-right kernel
    * sum = the oracle's list_sum order); the driver-side norm is the
    * same left-to-right d-term fold the SQL computes. Init is the
    * uniform unit vector n4(1/√d) — data-independent, so both
    * engines start identically. The sign of the returned component
    * follows the init (power iteration preserves it deterministically
    * given identical arithmetic).
    *
    * Scale shape: per iteration ONE scan + one (dim)-keyed partial
    * aggregate (d groups); driver state is O(d) — the classic
    * distributed power-method layout. `base` is persisted across the
    * iters+1 passes like the k-means trainer.
    *
    * Returns (dim, loading) — d rows, the n4-rounded unit eigenvector.
    */
  def pcaTopComponent(df: DataFrame, dims: Int, iters: Int,
      vecCol: String = "embedding"): DataFrame = {
    val v = pcaComponentVector(df, dims, iters, vecCol)
    val spark = df.sparkSession
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (l, d) => (d.toLong, l) }
      .toDF("dim", "loading").orderBy("dim")
  }

  /** The raw component of [[pcaTopComponent]] as a driver-side array —
    * for composed consumers that project against it (drift monitors,
    * whitening) without round-tripping through a 64-row frame.
    */
  def pcaComponentVector(df: DataFrame, dims: Int, iters: Int,
      vecCol: String = "embedding"): Array[Double] = {
    require(dims > 0 && iters > 0, s"dims/iters must be positive: $dims/$iters")
    val base = df.select(asDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def seqDot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val mu: Array[Double] = base
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg(col("x")).as("m")).collect()
      .sortBy(_.getInt(0)).map(r => n4d(r.getDouble(1)))
    require(mu.length == dims, s"expected $dims dims, data has ${mu.length}")
    var v: Array[Double] = Array.fill(dims)(n4d(1.0 / math.sqrt(dims.toDouble)))
    for (_ <- 1 to iters) {
      val dmv = n4d(seqDot(mu, v))
      val s4 = floor((dot(col("v"), typedLit(v.toSeq)) - lit(dmv))
        * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
      val w4: Array[Double] = base.withColumn("s", s4)
        .select(col("s"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(avg(col("s") *
          (col("x") - element_at(typedLit(mu.toSeq), col("dim") + 1))).as("w"))
        .collect().sortBy(_.getInt(0)).map(r => n4d(r.getDouble(1)))
      val nrm = math.sqrt(seqDot(w4, w4))
      v = w4.map(x => n4d(x / nrm))
    }
    base.unpersist()
    v
  }

  /** [[pcaTopComponent]] oracle rendering: the identical trajectory as
    * CTE chains — μ and every iterate are re-derived from the table
    * (the oracle SQL is SF-independent), landing on the same n4 grid
    * at the same points.
    */
  def pcaTopComponentSql(table: String, dims: Int, iters: Int,
      vecCol: String = "embedding"): String =
    "WITH " + pcaCtes(table, dims, iters, vecCol) +
      s"""
         |SELECT CAST(__i - 1 AS BIGINT) AS dim, vl[__i] AS loading
         |FROM __vl$iters, range(1, $dims + 1) t(__i) ORDER BY dim""".stripMargin

  /** The [[pcaTopComponentSql]] CTE chain WITHOUT the leading WITH or
    * final SELECT — ends at `__vl<iters>` (a 1-row CTE holding the
    * final component as list `vl`), so composed oracles (projection,
    * drift) can embed the trajectory via their `extraCtes` hooks.
    */
  def pcaCtes(table: String, dims: Int, iters: Int,
      vecCol: String = "embedding"): String = {
    def n4(e: String) = s"(floor(($e) * 10000 + 0.5) / 10000.0)"
    def listDot(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, $dims + 1), __i -> ($a)[__i] * ($b)[__i])) AS DOUBLE)"
    val v0 = {
      val x = math.floor(1.0 / math.sqrt(dims.toDouble) * 10000 + 0.5) / 10000
      "[" + Seq.fill(dims)(s"CAST('$x' AS DOUBLE)").mkString(", ") + "]"
    }
    val head =
      s"""__b AS (SELECT list_transform($vecCol, __x -> CAST(__x AS DOUBLE)) AS v
         |  FROM $table),
         |__mu AS (SELECT i AS dim, ${n4("avg(v[i + 1])")} AS m
         |  FROM __b, range($dims) t(i) GROUP BY 1),
         |__ml AS (SELECT list(m ORDER BY dim) AS ml FROM __mu),
         |__vl0 AS (SELECT $v0 AS vl)""".stripMargin
    val rounds = (1 to iters).map { j =>
      s"""__dmv$j AS (SELECT ${n4(listDot("ml", "vl"))} AS dmv
         |  FROM __ml, __vl${j - 1}),
         |__s$j AS (SELECT v, ${n4(s"${listDot("v", "vl")} - dmv")} AS s
         |  FROM __b, __vl${j - 1}, __dmv$j),
         |__w$j AS (SELECT i AS dim, ${n4("avg(s * (v[i + 1] - ml[i + 1]))")} AS w
         |  FROM __s$j, __ml, range($dims) t(i) GROUP BY 1),
         |__wl$j AS (SELECT list(w ORDER BY dim) AS wl FROM __w$j),
         |__n$j AS (SELECT sqrt(${listDot("wl", "wl")}) AS nrm FROM __wl$j),
         |__vl$j AS (SELECT list_transform(range(1, $dims + 1),
         |    __i -> ${n4("wl[__i] / nrm")}) AS vl FROM __wl$j, __n$j)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n")
  }

  /** ANN top-k: LSH-bucket candidates (any of `tables` tables), exact
    * cosine re-rank. Recall < 1 by design; the oracle replicates the
    * same buckets so results still match exactly.
    */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 2, bits: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String) = {
      val base = df.select(col(idCol).as(id), asDouble(col(vecCol)).as(vec))
      base.select(col(id), col(vec), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucket(col(vec), t, dims, bits).as("bk"))): _*)).as("tb"))
        .select(col(id), col(vec), col("tb.t").as("t"), col("tb.bk").as("bk"))
    }
    val c = withBuckets(corpus, "vec_id", "v")
    val q = withBuckets(queries, "query_id", "qv")
    val cand = c.join(broadcast(q), Seq("t", "bk"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  // ---- int8 scalar quantization -----------------------------------------

  /** Symmetric per-dimension int8 quantization of an embedding
    * column — the standard 4x vector-store compression:
    * `scale(d) = max|v_d| / 127`, `code = clamp(⌊v/scale + 0.5⌋, ±127)`.
    * Emitted flat as (vec_id, dim, code) integer rows (0-based dim),
    * the layout a columnar code store scans. All-zero dimensions
    * quantize to 0 (not a division error). Parity: max/abs over raw
    * floats involve NO arithmetic, and the one division + round is a
    * fixed double expression — bit-identical across engines.
    *
    * Scale shape: one posexplode + a 1-row-per-dimension partial-
    * aggregable max; the d-row scale frame broadcasts back, so
    * quantization itself is map-side — the corpus never shuffles. At
    * 100 TB the codes write out partition-aligned with the input.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val flat = emb.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
    val scales = flat.groupBy("dim")
      .agg(max(abs(col("v"))).as("ma"))
      .select(col("dim"), (col("ma").cast(DoubleType) / lit(127.0)).as("scale"))
    flat.join(broadcast(scales), "dim")
      // BIGINT dim like DuckDB's list_transform index (posexplode: INT)
      .select(col(idCol), col("dim").cast("long").as("dim"),
        when(col("scale") === 0d, 0L)
          .otherwise(greatest(lit(-127L), least(lit(127L),
            floor(col("v").cast(DoubleType) / col("scale") + lit(0.5)))))
          .as("code"))
      .orderBy(idCol, "dim")
  }

  /** [[quantizeInt8]] oracle rendering (indexed-lambda unnest). */
  def quantizeInt8Sql(table: String, idCol: String, vecCol: String): String =
    s"""WITH flat AS (SELECT $idCol,
       |    unnest(list_transform($vecCol, (v, i) -> {'dim': i - 1, 'v': v}),
       |           recursive := true)
       |  FROM $table),
       |scales AS (SELECT dim, CAST(max(abs(v)) AS DOUBLE) / 127.0 AS scale
       |  FROM flat GROUP BY 1)
       |SELECT $idCol, dim,
       |  CASE WHEN scale = 0 THEN 0
       |       ELSE greatest(-127, least(127,
       |         CAST(floor(CAST(v AS DOUBLE) / scale + 0.5) AS BIGINT))) END AS code
       |FROM flat JOIN scales USING (dim)
       |ORDER BY $idCol, dim""".stripMargin
}

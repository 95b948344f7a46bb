package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators: Morton (Z-order) curve
  * values for two-column locality clustering.
  *
  * Why it matters at 100 TB: a table sorted by ONE column skips
  * parquet row groups only for predicates on that column. Sorting by
  * the interleaved Z-value keeps rows that are close in BOTH
  * dimensions close on disk, so min/max row-group stats prune scans
  * for predicates on either column (the Delta/Iceberg OPTIMIZE ZORDER
  * recipe). Everything here is exact integer bit arithmetic — fully
  * codegen'd map-side projections, and the DuckDB renderings use the
  * identical operations, so both engines agree bit-for-bit.
  *
  * Write path at scale: `df.repartitionByRange(n, zValue(...))
  * .sortWithinPartitions(zValue(...))` then a parquet write — balanced
  * files, each covering a tight Z-range. The oracle-able form below
  * buckets by a FIXED Z-prefix (`zBucket`) instead: deterministic (no
  * range-boundary sampling) and map-side, at the cost of balance on
  * skewed key distributions.
  */
object LayoutOps {

  /** Spread the low 16 bits of `c` into the even bit positions of a
    * 32-bit value (the standard mask-and-shift Morton spreading).
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  def spread16Sql(e: String): String = {
    val x0 = s"(($e) & 65535)"
    val x1 = s"((($x0 | ($x0 << 8)) & 16711935))"
    val x2 = s"((($x1 | ($x1 << 4)) & 252645135))"
    val x3 = s"((($x2 | ($x2 << 2)) & 858993459))"
    s"((($x3 | ($x3 << 1)) & 1431655765))"
  }

  /** 32-bit Morton value interleaving the low 16 bits of `a` (even
    * positions) and `b` (odd positions).
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  def zValueSql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Fixed-prefix Z-bucket: the file/row-group id a row would land in
    * under a Z-sorted layout with 2^(32-shift) buckets. Pure map-side.
    */
  def zBucket(z: Column, shift: Int): Column = {
    require(shift > 0 && shift < 32, s"shift must be in (0, 32): $shift")
    shiftrightunsigned(z, shift)
  }

  def zBucketSql(z: String, shift: Int): String = s"($z >> $shift)"

  /** Write `df` as a bucketed+sorted catalog table at `path` —
    * Spark's hash-bucketed layout (`bucketBy`), the on-disk
    * pre-partitioning that lets every later equi-join or aggregate on
    * `bucketCol` run WITHOUT a shuffle: both sides of a join bucketed
    * by the key into the same bucket count are already co-located, so
    * the 100 TB fact table never crosses the network again for its
    * hottest join. `sortBy` additionally pre-sorts each bucket file,
    * feeding SortMergeJoin without a per-query sort. The caller picks
    * `nBuckets` to size bucket files to executor memory at the target
    * scale.
    */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
      path: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Global dense rank over (`valueCol`, `tieCol`) WITHOUT a
    * single-partition window — the two-level bucketed ranking every
    * "assign global ordinals to 100 TB" job needs (a bare
    * `row_number() OVER (ORDER BY ...)` funnels the whole table
    * through one task; Spark even warns).
    *
    * Level 1: rows are bucketed by comparing `valueCol` against
    * `nBuckets−1` exact interpolated percentile cuts (a one-row stats
    * literal — the q43/q148 parity class; strict `>` comparisons keep
    * value ties in one bucket). Level 2: per-bucket counts (a tiny
    * nBuckets-row frame) prefix-sum into bucket offsets, and
    * `rank = offset + row_number()` within each bucket — every window
    * is PARTITIONED by bucket. Equal-value rows order by `tieCol`,
    * making the rank total and layout-independent.
    *
    * PRECONDITION: `valueCol` must be non-NULL. `percentile` ignores
    * NULLs, the bucket fold would send NULL rows to bucket 1, and
    * Spark's NULLS FIRST default diverges from DuckDB's NULLS LAST —
    * engine-divergent ranks with no warning. NULL rows are therefore
    * rejected up front (filtered with a documented contract rather
    * than silently mis-ranked); callers that want NULLs ranked must
    * coalesce them to a sentinel first and own that ordering choice.
    *
    * Output: input columns + `rank` (1-based dense global ordinal)
    * for the `valueCol IS NOT NULL` rows.
    */
  def globalRank(df: org.apache.spark.sql.DataFrame, valueCol: String,
      tieCol: String, nBuckets: Int = 32,
      desc: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 1, s"nBuckets must exceed 1: $nBuckets")
    // `rank` is the output contract; a pre-existing `rank` (or an
    // internal scratch name) would be silently overwritten and dropped
    // — fail loudly instead (ADVICE r16)
    for (c <- Seq("rank", "__bkt", "__cuts", "__off", "__n"))
      require(!df.columns.contains(c),
        s"globalRank: input already has a `$c` column; rename it first")
    val df0 = df.where(col(valueCol).isNotNull)
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // SKETCH cuts (round 12, the q223/q231 note): ranks are exact for
    // ANY value-contiguous bucket placement, so the exact percentile's
    // single-reducer value map bought nothing here
    val cuts = df0.agg(percentile_approx(col(valueCol),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = df0.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until nBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col(valueCol).cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true) // feeds the offset census AND the rank pass
    // offsets: an nBuckets-row frame; the cumulative window is bounded
    // by the CONFIG constant, not the data (the day-grain argument).
    // Buckets are ascending in value, so a DESC rank just accumulates
    // the offsets from the top bucket down
    val bktOrd = if (desc) Window.orderBy(col("__bkt").desc)
      else Window.orderBy(col("__bkt").asc)
    val offsets = bucketed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(bktOrd
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val w = Window.partitionBy("__bkt")
      .orderBy(if (desc) col(valueCol).desc else col(valueCol).asc,
        col(tieCol).asc)
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn("rank", col("__off") + row_number().over(w))
      .drop("__bkt", "__off")
  }

  /** Exact `ntile(k)` over (`valueCol` [asc|desc], `tieCol` asc)
    * WITHOUT a single-partition window: the global ordinal comes from
    * [[globalRank]]'s bucketed machinery and the tile is pure
    * arithmetic on (rank, n) — the SQL-standard split where the first
    * `n mod k` tiles carry one extra row. Appends `tileCol` (LONG,
    * 1-based); same non-NULL `valueCol` contract as [[globalRank]].
    */
  def globalNtile(df: org.apache.spark.sql.DataFrame, valueCol: String,
      tieCol: String, k: Int, tileCol: String, desc: Boolean = false,
      nBuckets: Int = 32): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(!df.columns.contains("__ntot"),
      "globalNtile: input already has a `__ntot` column; rename it first")
    val ranked = globalRank(df, valueCol, tieCol, nBuckets, desc)
    val n = ranked.agg(count(lit(1)).as("__ntot"))
    // q = n div k rows per tile, the first m = n mod k tiles carry one
    // extra. All divisions are `div` on nonnegative BIGINTs (truncation
    // = floor); the q = 0 regime (n < k) never reaches the ELSE branch
    // because big·m = n there
    ranked.crossJoin(broadcast(n))
      .withColumn(tileCol, expr(
        s"CASE WHEN rank <= (__ntot div $k + 1) * (__ntot % $k)" +
          s" THEN (rank - 1) div (__ntot div $k + 1) + 1" +
          s" ELSE (__ntot % $k) + (rank - (__ntot div $k + 1)" +
          s" * (__ntot % $k) - 1) div (__ntot div $k) + 1 END")
        .cast("long"))
      .drop("__ntot", "rank")
  }

  /** Exact cumulative sums over a value-keyed CENSUS, decomposed into
    * percentile-cut value-contiguous buckets so no window ever runs on
    * a single partition of the value domain (the q223 Mann-Whitney /
    * q231 Kruskal-Wallis / q248 PR-AUC prefix machinery, generalized).
    * Appends, per requested sum column `c`, a `__cum_c` column = Σ of
    * `c` over census rows ordered by (`valueCol` [asc|desc]
    * [, `tieCol` asc]) up to and including (inclusive = true) or
    * strictly before (false) this row. Exact for ANY cut placement
    * since + is associative and buckets are value-contiguous (strict
    * `>` against the cuts keeps value ties in one bucket); the sketch
    * cuts only balance the buckets. The only unpartitioned window left
    * is the ≤nBuckets-row carry prefix — bounded by config, not data.
    *
    * `valueCol` must be numeric and non-NULL (the [[globalRank]]
    * contract). Pass `tieCol` when the census holds multiple rows per
    * value (e.g. a per-key frame cumulated by a measure); without it
    * the census must be one row per distinct value so the within-
    * bucket order is total. Sum columns must be integral/DECIMAL
    * (the empty prefix coalesces to 0).
    */
  def censusCum(census: org.apache.spark.sql.DataFrame, valueCol: String,
      sumCols: Seq[String], inclusive: Boolean, desc: Boolean = false,
      tieCol: Option[String] = None,
      nBuckets: Int = 32,
      partCols: Seq[String] = Nil,
      inputMaterialized: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 1, s"nBuckets must exceed 1: $nBuckets")
    require(sumCols.nonEmpty, "censusCum needs at least one sum column")
    // scratch names would be silently clobbered (the
    // pairSlopeMedianParts outer-bucket bug, round 17) — fail loudly
    for (c <- Seq("__bkt", "__cuts"))
      require(!census.columns.contains(c),
        s"censusCum: input already has a `$c` column; rename it first")
    // cuts probe + bucketed pass both read the census; callers that
    // already hold a materialized frame skip the redundant checkpoint
    // job (round 18 — one driver job per call site on the bench)
    val ck = if (inputMaterialized) census else census.localCheckpoint(true)
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = ck.agg(percentile_approx(col(valueCol).cast("double"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    // the non-NULL valueCol contract fails LOUDLY at execution (ADVICE
    // r16): percentile ignores NULLs and the bucket fold would have
    // silently sent NULL rows to bucket 1, diverging from both the
    // documented contract and DuckDB's NULLS LAST
    val guardedBase = when(col(valueCol).isNull,
      raise_error(lit(s"censusCum: NULL $valueCol violates the " +
        "non-NULL valueCol contract")).cast("int")).otherwise(lit(1))
    val bucketed = ck.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until nBuckets).foldLeft(guardedBase) {
        case (acc, i) => acc + when(col(valueCol).cast("double") >
          element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true) // carry census + windowed pass
    val carryAggs = sumCols.map(c => sum(col(c)).as(s"__bsum_$c"))
    val bktOrd = Window.partitionBy(partCols.map(col): _*)
      .orderBy(if (desc) col("__bkt").desc else col("__bkt").asc)
    val carryW = bktOrd.rowsBetween(Window.unboundedPreceding, -1)
    val carryKeys = partCols :+ "__bkt"
    val carried = sumCols.foldLeft(
        bucketed.groupBy(carryKeys.map(col): _*)
          .agg(carryAggs.head, carryAggs.tail: _*)) {
      (df, c) => df.withColumn(s"__carry_$c",
        coalesce(sum(col(s"__bsum_$c")).over(carryW), lit(0L)))
    }.select(carryKeys.map(col) ++ sumCols.map(c => col(s"__carry_$c")): _*)
    val ordCols = (if (desc) col(valueCol).desc else col(valueCol).asc) +:
      tieCol.map(t => col(t).asc).toSeq
    val w = Window.partitionBy(carryKeys.map(col): _*).orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
    sumCols.foldLeft(bucketed.join(broadcast(carried), carryKeys)) {
      (df, c) => df.withColumn(s"__cum_$c",
        col(s"__carry_$c") + coalesce(sum(col(c)).over(w), lit(0L)))
    }.drop("__bkt" +: sumCols.map(c => s"__carry_$c"): _*)
  }

  /** Exact running MAX over a value-keyed census — [[censusCum]]'s
    * machinery with max as the (equally associative) combiner, for
    * prefix-dominance shapes (Pareto frontiers, record-to-date
    * series). Appends, per column `c`, `__cmax_c` = max of `c` over
    * census rows ordered by `valueCol` [asc|desc] strictly before
    * (inclusive = false) or up to (true) this row; the empty prefix is
    * NULL (there is no identity element for max over an open domain —
    * Spark's null-skipping `greatest` folds the carry in). Same
    * non-NULL `valueCol` contract and one-row-per-value census
    * contract (pass `tieCol` otherwise) as [[censusCum]].
    */
  def censusCumMax(census: org.apache.spark.sql.DataFrame, valueCol: String,
      maxCols: Seq[String], inclusive: Boolean, desc: Boolean = false,
      tieCol: Option[String] = None,
      nBuckets: Int = 32): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets > 1, s"nBuckets must exceed 1: $nBuckets")
    require(maxCols.nonEmpty, "censusCumMax needs at least one column")
    for (c <- Seq("__bkt", "__cuts"))
      require(!census.columns.contains(c),
        s"censusCumMax: input already has a `$c` column; rename it first")
    val ck = census.localCheckpoint(true)
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = ck.agg(percentile_approx(col(valueCol).cast("double"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val guardedBase = when(col(valueCol).isNull,
      raise_error(lit(s"censusCumMax: NULL $valueCol violates the " +
        "non-NULL valueCol contract")).cast("int")).otherwise(lit(1))
    val bucketed = ck.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until nBuckets).foldLeft(guardedBase) {
        case (acc, i) => acc + when(col(valueCol).cast("double") >
          element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carryAggs = maxCols.map(c => max(col(c)).as(s"__bmax_$c"))
    val bktOrd = if (desc) Window.orderBy(col("__bkt").desc)
      else Window.orderBy(col("__bkt").asc)
    val carryW = bktOrd.rowsBetween(Window.unboundedPreceding, -1)
    val carried = maxCols.foldLeft(
        bucketed.groupBy("__bkt").agg(carryAggs.head, carryAggs.tail: _*)) {
      (df, c) => df.withColumn(s"__carry_$c",
        max(col(s"__bmax_$c")).over(carryW))
    }.select(col("__bkt") +: maxCols.map(c => col(s"__carry_$c")): _*)
    val ordCols = (if (desc) col(valueCol).desc else col(valueCol).asc) +:
      tieCol.map(t => col(t).asc).toSeq
    val w = Window.partitionBy("__bkt").orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
    maxCols.foldLeft(bucketed.join(broadcast(carried), "__bkt")) { (df, c) =>
      // greatest skips NULLs (Spark semantics): an absent carry or an
      // empty within-bucket prefix contributes nothing; both absent
      // yields NULL — the documented empty-prefix value
      df.withColumn(s"__cmax_$c",
        greatest(col(s"__carry_$c"), max(col(c)).over(w)))
    }.drop("__bkt" +: maxCols.map(c => s"__carry_$c"): _*)
  }
}

/** JVM kernel form of the Morton interleave, for the `graft_zvalue`
  * SQL function (StaticInvoke — same arithmetic as the Column form,
  * one implementation contract verified in Round7bSpec).
  */
object LayoutKernels {
  def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def zValue(a: Long, b: Long): Long = spread16(a) | (spread16(b) << 1)
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** The pipeline facade (reference: AutoETL.transform/run_etl,
  * ETL_PROJECT.py:228-349).
  *
  * Fixed stage order — the pipeline is order-sensitive (trap P11:
  * detection runs on RAW values; null ratios on CLEANED values):
  *
  *   1. profile (ONE aggregate pass)  -> logical types + cleaner gates
  *   2. categorical value counts      -> rare-fold sets (only for <50-distinct cols)
  *   3. clean (ONE projection)        -> persist
  *   4. null counts -> drop / impute decisions (median/mode aggregates)
  *   5. winsorize stats -> clamp projection
  *   6. exact dedup (the only full-width shuffle)
  *   7. summary aggregate
  *
  * Roughly 7 Spark jobs over a persisted cleaned frame, vs the
  * reference's O(columns) full-table passes.
  */
object AutoEtl {

  /** Rare-category fold threshold (reference: ETL_PROJECT.py:118):
    * values with count < max(2, 1% of total rows) fold to "Other".
    */
  def rareThreshold(totalRows: Long): Double = math.max(2.0, 0.01 * totalRows)

  def transform(raw: DataFrame, config: EtlConfig = EtlConfig.exact): EtlResult = {
    val report = mutable.Map.empty[String, Vector[Action]]
      .withDefaultValue(Vector.empty)
    def log(col: String, a: Action): Unit = report(col) = report(col) :+ a

    // -- stage 1: detect -------------------------------------------------
    // 100 TB mode: the detection ratios subsample well; total row count
    // stays exact (one cheap count scan vs the full stats pass)
    val effectiveSample: Option[Double] = config.detectionSample.orElse {
      config.autoSampleBytes.collect {
        case limit if raw.queryExecution.optimizedPlan.stats.sizeInBytes > limit =>
          0.01
      }
    }
    // sampleTotal: the profile's OWN row count — under sampling the
    // per-column stats are sample counts and must be ratioed against
    // this, never against the exact totalRows (mixing the two made the
    // stage-4 rawNull estimate ~= totalRows, i.e. garbage)
    var sampleTotal: Long = 0L
    val prof = effectiveSample match {
      case Some(f) =>
        val sampled = TypeDetector.profile(raw.sample(withReplacement = false, f, seed = 42L))
        sampleTotal = sampled.totalRows
        sampled.copy(totalRows = raw.count())
      case None =>
        val p = TypeDetector.profile(raw)
        sampleTotal = p.totalRows
        p
    }
    // raw (pre-clean) null count per column: exact when unsampled, a
    // ratio-scaled estimate when detection sampled
    def rawNullOf(c: String): Long =
      if (sampleTotal == 0) 0L
      else if (sampleTotal == prof.totalRows) prof.totalRows - prof.cols(c).nonNull
      else math.round(
        prof.totalRows * (1.0 - prof.cols(c).nonNull.toDouble / sampleTotal))
    val sampledTypes: Map[String, ColType] =
      prof.cols.map { case (c, p) => c -> TypeDetector.decide(p) }
    // Sampled-detection guard: the hard `< 50` categorical cutoff does
    // NOT subsample (a 1% sample of a skewed high-cardinality column
    // can show < 50 distinct values). Re-check every sampled-Categorical
    // candidate with an EXACT distinct count over just those columns and
    // demote failures — this also bounds stage 2's driver-side value
    // collect, which would otherwise pull every distinct value of a
    // mis-typed column.
    val types: Map[String, ColType] =
      if (effectiveSample.isEmpty) sampledTypes
      else {
        val cand = sampledTypes.collect { case (c, ColType.Categorical) => c }.toSeq
        if (cand.isEmpty) sampledTypes
        else {
          // HLL gate before the exact pass (ADVICE r3): an unconditional
          // exact distinct over the FULL raw frame negates autoSampleBytes
          // whenever the sample admits any categorical candidate. The
          // estimate decides clear cases; only candidates near the hard
          // 50 cutoff pay the exact Expand-free distinct pass. The
          // near-band lower edge is derived from the sketch's rsd
          // (50*(1-6*rsd), a 6-sigma margin — ADVICE r4), and a gate
          // miss is non-fatal regardless: stage 2's value collect is
          // rank-capped at 50 rows per column. Same string-cast value
          // space as distinctCounts.
          val rsd = 0.05
          val gateLo = math.ceil(50 * (1 - 6 * rsd)).toLong // = 35
          val approxRow = raw.select(cand.zipWithIndex.map { case (c, i) =>
            approx_count_distinct(col(c).cast("string"), rsd).as(s"__acd_$i") }: _*).head()
          val near = cand.zipWithIndex.collect {
            case (c, i) if approxRow.getLong(i) >= gateLo => c
          }
          val exactDistinct =
            if (near.isEmpty) Map.empty[String, Long]
            else TypeDetector.distinctCounts(raw, near)
          sampledTypes.map {
            case (c, ColType.Categorical) if exactDistinct.getOrElse(c, 0L) >= 50 =>
              c -> TypeDetector.decide(prof.cols(c), allowCategorical = false)
            case kv => kv
          }
        }
      }
    raw.columns.foreach(c => log(c, Action.DetectedType(types(c))))
    val totalRows = prof.totalRows

    // -- stage 2: rare-category sets (reference: ETL_PROJECT.py:114-121) --
    // ONE job for ALL categorical columns: (column, cleaned-value) pairs
    // stack through a map-explode and one groupBy. Bounded collect:
    // detection admits a column as categorical only with < 50 raw
    // distinct values, and cleaning (title-fold + null-map) can only
    // merge, so each column contributes < 50 groups. The reference's
    // own post-clean `nunique < 50` gate is re-checked per column.
    val catCols = types.collect { case (c, ColType.Categorical) => c }.toSeq
    val rareSets: Map[String, Seq[String]] =
      if (catCols.isEmpty) Map.empty
      else {
        val stacked = raw.select(
          explode(map(catCols.flatMap(c =>
            Seq(lit(c), Cleaners.cleanCategoricalBase(col(c)))): _*)).as(Seq("__c", "__v")))
          .where(col("__v").isNotNull)
        // rank-capped at 50 rows per column: detection admits only
        // <50-distinct columns, but under SAMPLED detection the HLL gate
        // has a small miss probability — the cap turns that miss into
        // "rare set skipped" (the >=50 branch below) instead of an
        // unbounded driver collect. The rank filter plans as a
        // WindowGroupLimit, so the cap applies below the final shuffle.
        import org.apache.spark.sql.expressions.Window
        val counts = stacked.groupBy("__c", "__v").agg(count(lit(1)).as("__n"))
          .withColumn("__r",
            row_number().over(Window.partitionBy("__c").orderBy("__v")))
          .where(col("__r") <= 50).drop("__r")
          .collect().groupBy(_.getString(0))
        val thr = rareThreshold(totalRows)
        catCols.map { c =>
          val rows = counts.getOrElse(c, Array.empty)
          val rare =
            if (rows.length >= 50) Seq.empty[String]
            else rows.filter(_.getLong(2) < thr).map(_.getString(1)).toSeq.sorted
          c -> rare
        }.toMap
      }

    // -- stage 3: clean (single projection) -------------------------------
    val collapseWs: Map[String, Boolean] =
      prof.cols.map { case (c, p) => c -> (p.avgTextCleanedLen > 20) }
    // localCheckpoint, not persist: stages 4-7 each submit a job whose
    // plan would otherwise re-analyze the full cleaning expression tree
    // (16-format date parse x columns — measured ~200 ms of driver-side
    // planning per job); the checkpoint truncates lineage to an RDD
    // scan. Blocks are MEMORY_AND_DISK and freed by ContextCleaner.
    val cleaned = raw
      .select(cleanedCols(raw.columns.toSeq, types, rareSets, collapseWs): _*)
      .localCheckpoint(true)

    // -- stage 4: missing values ------------------------------------------
    // one fused aggregate: null counts + numeric medians (separate
    // nullCounts and medians jobs were two full scans of the same frame)
    val (nulls, med) = Imputer.nullsAndMedians(cleaned, types, config)
    raw.columns.foreach { c =>
      val rawNull = rawNullOf(c)
      types(c) match {
        case ColType.Numeric =>
          // clamped: rawNull is an estimate under sampled detection,
          // and cleaning can only ADD nulls — never report negative
          log(c, Action.NumericCleaned(math.max(0L, nulls(c) - rawNull)))
        case ColType.Date =>
          log(c, Action.DateCleaned(totalRows - nulls(c), totalRows))
        case ColType.Categorical =>
          if (rareSets(c).nonEmpty) log(c, Action.RareFolded(rareSets(c).size))
          log(c, Action.CategoricalCleaned)
        case _ =>
          log(c, Action.TextCleaned)
      }
    }
    val decisions = Imputer.decideWith(cleaned, types, nulls, totalRows, med)
    decisions.toSeq.sortBy(_._1).foreach {
      case (c, Imputer.Drop) =>
        log(c, Action.DroppedHighNull(nulls(c).toDouble / math.max(totalRows, 1)))
      case (c, Imputer.FillMedian(v)) => log(c, Action.ImputedMedian(v))
      case (c, Imputer.FillMode(v))   => log(c, Action.ImputedMode(String.valueOf(v)))
      case _ =>
    }
    val droppedCols = raw.columns.filter(c => decisions.get(c).contains(Imputer.Drop)).toSeq
    if (droppedCols.nonEmpty) log("global", Action.DroppedColumns(droppedCols))
    val imputed = Imputer.apply(cleaned, decisions)

    // -- stage 5: winsorize ------------------------------------------------
    // The z-flag counts ride the NEXT action as an Observation (metrics
    // collected map-side during the dedup/summary pass) instead of
    // costing their own full scan; the dedup count comes from the
    // summary's own count(*) — two fewer table scans per transform.
    val numericCols = imputed.columns.filter(c => types.get(c).contains(ColType.Numeric)).toSeq
    val wstats = Winsorizer.stats(imputed, numericCols, config)
    val activeStats = wstats.filter(_._2.active).toSeq.sortBy(_._1)
    val obs = new org.apache.spark.sql.Observation()
    val imputedObserved =
      if (activeStats.isEmpty) imputed
      else {
        val aggs = activeStats.map { case (c, st) =>
          val z = abs((col(c) - lit(st.mean)) / lit(st.std))
          count(when(z > Winsorizer.zThreshold, 1)).as(c)
        }
        imputed.observe(obs, aggs.head, aggs.tail: _*)
      }
    val winsorized = Winsorizer.apply(imputedObserved, wstats)

    // -- stage 6: exact dedup ----------------------------------------------
    val deduped = winsorized.dropDuplicates().persist(StorageLevel.MEMORY_AND_DISK)

    // -- stage 7: summary (one action materializes dedup + observation) -----
    val summary = Summarizer.summarize(deduped, types)
    val removed = totalRows - summary.totalRows
    if (removed > 0) log("global", Action.DuplicatesRemoved(removed))
    if (activeStats.nonEmpty) {
      val metrics = obs.get
      activeStats.foreach { case (c, _) =>
        val n = metrics(c).asInstanceOf[Long]
        if (n > 0) log(c, Action.OutliersClamped(n))
      }
    }
    EtlResult(deduped, types, CleaningReport(report.toMap), summary,
      EtlModel(types, collapseWs, rareSets, decisions, wstats))
  }

  /** The stage-3 cleaning projection, shared by [[transform]] and
    * [[EtlModel.apply]] (text AND unknown both text-clean,
    * ETL_PROJECT.py:255-256). A column the model never saw (schema
    * drift on the serve path) is treated as Unknown — text-cleaned and
    * passed through, never a crash.
    */
  def cleanedCols(
      columns: Seq[String],
      types: Map[String, ColType],
      rareSets: Map[String, Seq[String]],
      collapseWs: Map[String, Boolean]): Seq[Column] =
    columns.map { c =>
      val e = types.getOrElse(c, ColType.Unknown) match {
        case ColType.Numeric => Cleaners.cleanNumeric(col(c))
        case ColType.Date    => Cleaners.cleanDate(col(c))
        case ColType.Categorical =>
          Cleaners.foldRare(Cleaners.cleanCategoricalBase(col(c)), rareSets(c))
        case _ =>
          Cleaners.cleanText(col(c),
            collapseWhitespace = collapseWs.getOrElse(c, false))
      }
      e.as(c)
    }

  /** Fit-only facade: runs the full stats pipeline (on `df` — pass a
    * sample at very large scale) and returns just the frozen
    * [[EtlModel]]; the fitted frame's cache is released.
    */
  def fit(df: DataFrame, config: EtlConfig = EtlConfig.exact): EtlModel = {
    val r = transform(df, config)
    r.unpersist()
    r.model
  }

  /** Streaming ETL with drift adaptation: every micro-batch is cleaned
    * by the current [[EtlModel]]; the model is re-fitted ON the batch
    * itself at batch 0 and every `refitEvery` batches after (pass 0 to
    * fit once and never again). `sink` receives each cleaned batch —
    * the `foreachBatch` escape hatch, because a fit is a multi-job
    * statistics pass that can't run inside a continuous plan. Empty
    * batches never trigger a refit (there is nothing to fit on).
    */
  def streamWithRefit(stream: DataFrame, refitEvery: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    @volatile var model: Option[EtlModel] = None
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val due = model.isEmpty || (refitEvery > 0 && id % refitEvery == 0)
      if (due && !batch.isEmpty) model = Some(fit(batch))
      model.foreach(m => sink(m(batch), id))
    }.start()
  }

  /** E1 — extract -> transform -> load (reference: ETL_PROJECT.py:326-349). */
  def run(spark: SparkSession, sourcePath: String, sinkPath: Option[String] = None): EtlResult = {
    val raw = Io.read(spark, sourcePath)
    val result = transform(raw)
    sinkPath.foreach(p => Io.write(result.data, p))
    result
  }
}

package graft.etl

/** Logical column types of the auto-cleaning engine.
  *
  * Mirrors the 5-way tag assigned by the reference's detector
  * (reference: ETL_PROJECT.py:16-41). The physical Spark schema is a
  * separate layer; every raw input column is treated as a string and
  * tagged with one of these.
  */
sealed abstract class ColType(val name: String)
object ColType {
  case object Date        extends ColType("date")
  case object Numeric     extends ColType("numeric")
  case object Categorical extends ColType("categorical")
  case object Text        extends ColType("text")
  case object Unknown     extends ColType("unknown")

  val all: Seq[ColType] = Seq(Date, Numeric, Categorical, Text, Unknown)
  def fromName(s: String): ColType =
    all.find(_.name == s).getOrElse(Unknown)
}

/** One recorded cleaning action with typed counters.
  *
  * The reference keeps these as human-readable strings
  * (ETL_PROJECT.py:11-14, 74, 100, 122-126, 139-168, 197-199, 270-271);
  * parity target is the counters, not the prose, so we keep a typed ADT
  * and render text on demand.
  */
sealed trait Action { def render: String }
object Action {
  case class DetectedType(t: ColType) extends Action {
    def render = s"detected column type: ${t.name}"
  }
  case class NumericCleaned(newInvalid: Long) extends Action {
    def render = s"cleaned numeric column, newly invalid values: $newInvalid"
  }
  case object TextCleaned extends Action { def render = "cleaned text column" }
  case class DateCleaned(parsed: Long, total: Long) extends Action {
    def render = s"parsed $parsed of $total values as dates"
  }
  case class RareFolded(nRare: Long) extends Action {
    def render = s"folded $nRare rare values into 'Other'"
  }
  case object CategoricalCleaned extends Action {
    def render = "cleaned categorical column"
  }
  case class DroppedHighNull(naRatio: Double) extends Action {
    def render = f"dropped column: ${naRatio * 100}%.1f%% missing"
  }
  case class ImputedMedian(median: Double) extends Action {
    def render = s"imputed missing values with median: $median"
  }
  case class ImputedMode(mode: String) extends Action {
    def render = s"imputed missing values with mode: $mode"
  }
  case class DroppedColumns(cols: Seq[String]) extends Action {
    def render = s"dropped columns: ${cols.mkString(", ")}"
  }
  case class OutliersClamped(n: Long) extends Action {
    def render = s"winsorized $n outlier values"
  }
  case class DuplicatesRemoved(n: Long) extends Action {
    def render = s"removed $n duplicate rows"
  }
}

/** Ordered per-column cleaning log (reference: ETL_PROJECT.py:230-236).
  * Key "global" collects table-level actions.
  */
case class CleaningReport(actions: Map[String, Vector[Action]]) {
  def render: String = {
    val sb = new StringBuilder
    sb ++= "Data cleaning report\n" ++= "=" * 50 ++= "\n"
    actions.toSeq.sortBy(_._1).foreach { case (col, as) =>
      if (as.nonEmpty) {
        sb ++= s"\ncolumn $col:\n"
        as.foreach(a => sb ++= s"  - ${a.render}\n")
      }
    }
    sb.toString
  }
}

case class NumericStats(mean: Double, std: Double, min: Double, max: Double)
case class DateStats(min: java.sql.Date, max: java.sql.Date)

/** Table summary (reference: ETL_PROJECT.py:279-302). */
case class DataSummary(
    totalRows: Long,
    totalColumns: Int,
    columnTypes: Map[String, ColType],
    missingValues: Map[String, Long],
    numericColumns: Map[String, NumericStats],
    dateColumns: Map[String, DateStats])

/** Frozen per-column decisions of one fitted transform — the
  * fit/apply split. Every field is a plain value (no DataFrames), so
  * the model serializes trivially and [[apply]] is a STATELESS
  * projection chain (clean -> impute -> winsorize): appliable to any
  * frame with the fitted columns — a 100 TB batch partitioned freely,
  * or every micro-batch of a stream (`readStream.transform(model.apply)`).
  *
  * Dedup is deliberately NOT part of the model: it is stateful. Batch
  * callers get it from [[AutoEtl.transform]]; streams should use
  * `dropDuplicates` within a watermark.
  */
case class EtlModel(
    types: Map[String, ColType],
    collapseWs: Map[String, Boolean],
    rareSets: Map[String, Seq[String]],
    decisions: Map[String, Imputer.Decision],
    wstats: Map[String, Winsorizer.Stats]) {

  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cleaned = df.select(AutoEtl.cleanedCols(df.columns.toSeq, types,
      rareSets, collapseWs): _*)
    Winsorizer.apply(Imputer.apply(cleaned, decisions), wstats)
  }
}

/** Result of a full transform: cleaned frame + metadata + the frozen
  * [[EtlModel]]. `data` is persisted (it fed the summary aggregates);
  * call [[unpersist]] once consumed.
  */
case class EtlResult(
    data: org.apache.spark.sql.DataFrame,
    columnTypes: Map[String, ColType],
    report: CleaningReport,
    summary: DataSummary,
    model: EtlModel) {
  def unpersist(): Unit = { data.unpersist(); () }
}

/** Scale knobs for [[AutoEtl.transform]] (SURVEY.md §4 north-star).
  *
  * The default is EXACT everywhere — that is the t2-oracle correctness
  * mode. At 100 TB the exact paths have two hot spots with principled
  * approximations:
  *
  *  - `detectionSample`: T1 type detection decides on RATIOS (>70%
  *    date-parse, ≤30% unique, ...) which subsample well; a 1%% sample
  *    of 100 TB still decides each column on ~1 B values. Total row
  *    count stays exact (a plain count is one cheap scan vs. the full
  *    stats pass). The `< 50 distinct` categorical gate is computed on
  *    the sample — any column with ≥50 distinct among millions of
  *    sampled rows is correctly rejected.
  *  - `approxPercentiles`: M2 median + M5 p05/p95 switch from Spark's
  *    exact interpolating `percentile` (a full sort-based aggregate)
  *    to `percentile_approx` (a mergeable t-digest-style sketch,
  *    single pass, bounded memory). `approxAccuracy` trades memory
  *    for error exactly as Spark documents.
  */
final case class EtlConfig(
    detectionSample: Option[Double] = None,
    approxPercentiles: Boolean = false,
    approxAccuracy: Int = 10000,
    /** When set (and `detectionSample` is empty — an explicit sample
      * fraction always wins), detection switches to a 1% sample
      * automatically once Catalyst's size estimate for the input
      * exceeds this many bytes — a zero-cost trigger (plan statistics,
      * no extra scan), so small inputs keep exact detection and a
      * 100 TB input samples without the caller having to know.
      * Under sampling, Categorical decisions are re-checked against an
      * EXACT distinct count (the `< 50` gate doesn't subsample) and
      * demoted when the full column fails it.
      */
    autoSampleBytes: Option[Long] = None)

object EtlConfig {
  /** t2 correctness mode: exact statistics everywhere. */
  val exact: EtlConfig = EtlConfig()
  /** 100 TB mode: sampled detection + sketch percentiles. */
  val atScale: EtlConfig =
    EtlConfig(detectionSample = Some(0.01), approxPercentiles = true)
  /** Exact until the input's size estimate crosses ~1 GiB, then
    * sampled detection (percentiles stay exact — flip
    * `approxPercentiles` separately when group cardinality demands).
    */
  val auto: EtlConfig = EtlConfig(autoSampleBytes = Some(1L << 30))
}

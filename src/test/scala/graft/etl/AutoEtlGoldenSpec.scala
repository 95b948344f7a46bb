package graft.etl

import org.apache.spark.sql.functions._
import java.sql.Date

/** End-to-end golden parity on the reference's own demo table
  * (ETL_PROJECT.py:373-382, ported per FIXTURES.md §B). Every expected
  * value below is hand-derived from the reference semantics in
  * SURVEY.md §2 — including the deliberately-surprising ones (trap P11:
  * numeric_col is detected `unknown` because detection runs on RAW
  * values and the comma-decimals fail pd.to_numeric).
  */
class AutoEtlGoldenSpec extends EtlSpecBase {
  import spark.implicits._

  private lazy val dirtyDemo = Seq(
    ("1",  "2023-01-01", "100.50", "  John  ", "A", "100"),
    ("2",  "2023/02/15", "200,75", "Mary",     "B", "200"),
    ("3",  "15-03-2023", "N/A",    "N/A",      "A", "text"),
    ("4",  "invalid",    "300.25", " Bob ",    "C", "300"),
    ("5",  "2023.05.20", "invalid","Alice",    "B", "400"),
    ("6",  "20230101",   "400.50", "None",     "A", "more text"),
    ("7",  "2023-07-04", "500.75", "Eve",      "D", "500"),
    ("8",  "07/08/2023", "600,25", "Charlie",  "B", "600"),
    ("9",  "2023-09-10", "700.50", "David",    "A", "700"),
    ("10", "2023-12-25", "800.75", "Frank",    "E", "800"),
  ).toDF("id", "date_col", "numeric_col", "text_col", "categorical_col", "mixed_col")

  private lazy val result = AutoEtl.transform(dirtyDemo)

  test("golden: detected column types (P11 — raw-value detection)") {
    assert(result.columnTypes == Map(
      "id" -> ColType.Numeric,
      "date_col" -> ColType.Date,
      "numeric_col" -> ColType.Unknown,   // 6/10 = 60% <= 70% on RAW values
      "text_col" -> ColType.Unknown,      // short + all-unique
      "categorical_col" -> ColType.Unknown, // unique_ratio 0.5 > 0.3
      "mixed_col" -> ColType.Numeric,     // 8/10
    ))
  }

  test("golden: cleaned cell values") {
    val rows = result.data.orderBy(col("id")).collect()
    assert(rows.length == 10) // dedup removed nothing

    def dates = rows.map(_.getAs[Date]("date_col").toString).toSeq
    // 'invalid' (id=4) imputed with mode 2023-01-01 (appears twice: rows 1,6)
    assert(dates == Seq("2023-01-01", "2023-02-15", "2023-03-15", "2023-01-01",
      "2023-05-20", "2023-01-01", "2023-07-04", "2023-08-07", "2023-09-10",
      "2023-12-25"))

    // numeric_col was TEXT-cleaned: "N/A"->null->mode-imputed with the
    // smallest all-unique value "100.50"; "200,75" and "invalid" survive.
    val numeric = rows.map(_.getAs[String]("numeric_col")).toSeq
    assert(numeric == Seq("100.50", "200,75", "100.50", "300.25", "invalid",
      "400.50", "500.75", "600,25", "700.50", "800.75"))

    // text_col: trim; N/A + None -> null -> mode "Alice" (smallest on tie)
    val text = rows.map(_.getAs[String]("text_col")).toSeq
    assert(text == Seq("John", "Mary", "Alice", "Bob", "Alice", "Alice",
      "Eve", "Charlie", "David", "Frank"))

    val cat = rows.map(_.getAs[String]("categorical_col")).toSeq
    assert(cat == Seq("A", "B", "A", "C", "B", "A", "D", "B", "A", "E"))

    // mixed_col: C1 strips "text"/"more text" to "" -> null -> median 450.0
    val mixed = rows.map(_.getAs[Double]("mixed_col")).toSeq
    assert(mixed == Seq(100.0, 200.0, 450.0, 300.0, 400.0, 450.0, 500.0,
      600.0, 700.0, 800.0))

    val ids = rows.map(_.getAs[Double]("id")).toSeq
    assert(ids == (1 to 10).map(_.toDouble))
  }

  test("golden: summary stats") {
    val s = result.summary
    assert(s.totalRows == 10 && s.totalColumns == 6)
    assert(s.missingValues.values.forall(_ == 0)) // all imputed
    assert(s.numericColumns.keySet == Set("id", "mixed_col"))
    assert(s.numericColumns("mixed_col").mean == 450.0)
    assert(s.dateColumns("date_col").min.toString == "2023-01-01")
    assert(s.dateColumns("date_col").max.toString == "2023-12-25")
  }

  test("golden: report counters") {
    val r = result.report.actions
    assert(r("date_col").contains(Action.DateCleaned(9, 10)))
    assert(r("mixed_col").contains(Action.NumericCleaned(2)))
    assert(r("mixed_col").contains(Action.ImputedMedian(450.0)))
    assert(r("text_col").contains(Action.ImputedMode("Alice")))
    assert(!r.contains("global") ||
      !r("global").exists(_.isInstanceOf[Action.DuplicatesRemoved]))
  }

  test("dedup removes exact duplicates and reports the count") {
    val dup = dirtyDemo.union(dirtyDemo.limit(3))
    val res = AutoEtl.transform(dup)
    assert(res.data.count() == 10)
    assert(res.report.actions("global").contains(Action.DuplicatesRemoved(3)))
  }
}

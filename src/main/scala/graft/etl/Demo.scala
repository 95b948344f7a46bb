package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's own demo table (ETL_PROJECT.py:373-382), ported
  * verbatim as the golden end-to-end fixture (FIXTURES.md §B). All
  * columns string-typed (SURVEY.md trap P7).
  */
object Demo {

  val columns: Seq[String] =
    Seq("id", "date_col", "numeric_col", "text_col", "categorical_col", "mixed_col")

  val rows: Seq[Seq[String]] = Seq(
    Seq("1",  "2023-01-01", "100.50", "  John  ", "A", "100"),
    Seq("2",  "2023/02/15", "200,75", "Mary",     "B", "200"),
    Seq("3",  "15-03-2023", "N/A",    "N/A",      "A", "text"),
    Seq("4",  "invalid",    "300.25", " Bob ",    "C", "300"),
    Seq("5",  "2023.05.20", "invalid","Alice",    "B", "400"),
    Seq("6",  "20230101",   "400.50", "None",     "A", "more text"),
    Seq("7",  "2023-07-04", "500.75", "Eve",      "D", "500"),
    Seq("8",  "07/08/2023", "600,25", "Charlie",  "B", "600"),
    Seq("9",  "2023-09-10", "700.50", "David",    "A", "700"),
    Seq("10", "2023-12-25", "800.75", "Frank",    "E", "800"),
  )

  def dirtyDemo(spark: SparkSession): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), schema)
  }
}

package graft.etl

import org.apache.spark.sql.functions._
import java.sql.Date

/** Golden pairs for the 16-format first-match-wins parser
  * (reference: ETL_PROJECT.py:43-61; SURVEY.md trap P1). Expected
  * values derived from CPython strptime semantics.
  */
class DateFormatsSpec extends EtlSpecBase {
  import spark.implicits._

  private val golden: Seq[(String, String)] = Seq(
    "2023-01-01"          -> "2023-01-01",
    "2023/02/15"          -> "2023-02-15",
    "15-03-2023"          -> "2023-03-15",
    "03-04-2023"          -> "2023-04-03", // d-M before M-d: April 3rd
    "03/04/2023"          -> "2023-04-03",
    "04-15-2023"          -> "2023-04-15", // d-M fails (month 15) -> M-d
    "04/15/2023"          -> "2023-04-15",
    "2023.05.20"          -> "2023-05-20",
    "20.05.2023"          -> "2023-05-20",
    "05.20.2023"          -> "2023-05-20", // d.M fails (month 20) -> M.d
    "20230101"            -> "2023-01-01", // compact: y-m-d first
    "01022023"            -> "2023-02-01", // ddMMyyyy before MMddyyyy
    "12252023"            -> "2023-12-25", // ddMM fails (month 25) -> MMdd
    "2023-01-01 10:30:00" -> "2023-01-01", // datetime variants truncate
    "2023/01/01 10:30:00" -> "2023-01-01",
    "15-03-2023 23:59:59" -> "2023-03-15",
    "15/03/2023 00:00:00" -> "2023-03-15",
    "2023-1-5"            -> "2023-01-05", // 1-2 digit month/day ok
    "  2023-01-01  "      -> "2023-01-01", // leading/trailing ws trimmed
    "invalid"             -> null,
    "2023-13-01"          -> null, // calendar-validated everywhere
    "2023-01-01 10:30"    -> null, // strict about leftover input
    "99"                  -> null,
    ""                    -> null,
  )

  test("16-format table: first match wins, CPython-golden pairs") {
    val df = golden.map(_._1).toDF("s")
      .select(col("s"), DateFormats.parseDate(col("s")).as("d"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getDate(1))).toMap
    golden.foreach { case (in, want) =>
      val expected = Option(want).map(Date.valueOf)
      assert(got(in) == expected, s"parseDate('$in')")
    }
  }

  test("kernel parse agrees with the expression formulation on edge shapes") {
    val battery = golden.map(_._1) ++ Seq(
      "1/2/2023", "2023.1.1", "31-12-1999 1:2:3", "00000000", "99999999",
      "12.13.2023", "29022023", "29-02-2023", "2023-02-29", "2020-02-29",
      "123-1-1", "12345-01-01", "2023-01-01  10:00:00", "2023-01-01 24:00:00",
      "2023-01-01 23:59:60", "1-1-1111", "11111111", "2023--01-01", "2023-01-",
      "2023:01:01", "2023 01 01", "0001-01-01", "9999-12-31")
    val rows = battery.toDF("s")
      .select(col("s"), DateFormats.parseDate(col("s")).as("k"),
        DateFormats.parseDateExpr(col("s")).as("e"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.getDate(1)) == Option(r.getDate(2)),
        s"kernel vs expr for '${r.getString(0)}'")
    }
  }

  test("spark SQL string rendering agrees with the Column rendering") {
    val df = golden.map(_._1).toDF("s")
    df.createOrReplaceTempView("t_dates")
    val got = spark
      .sql(s"SELECT s, ${DateFormats.sparkSqlParseDate("s")} AS d FROM t_dates")
      .collect().map(r => r.getString(0) -> Option(r.getDate(1))).toMap
    golden.foreach { case (in, want) =>
      assert(got(in) == Option(want).map(Date.valueOf), s"sql parse('$in')")
    }
  }
}

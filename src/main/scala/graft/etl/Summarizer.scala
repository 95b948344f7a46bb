package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType}

/** M7 — data summary (reference: ETL_PROJECT.py:279-302): one wide
  * aggregate pass produces total rows, per-column null counts, numeric
  * {mean, stddev_samp, min, max} and date {min, max}.
  */
object Summarizer {

  def summarize(df: DataFrame, types: Map[String, ColType]): DataSummary = {
    val fields = df.schema.fields.toSeq
    val numericCols = fields.collect {
      case f if types.get(f.name).contains(ColType.Numeric) && f.dataType == DoubleType => f.name
    }
    val dateCols = fields.collect {
      case f if types.get(f.name).contains(ColType.Date) && f.dataType == DateType => f.name
    }
    val aggs = count(lit(1)).as("__total") +:
      (fields.map { f =>
        val c = col(f.name)
        val miss = f.dataType match {
          case DoubleType => c.isNull || isnan(c)
          case _          => c.isNull
        }
        count(when(miss, 1)).as(s"${f.name}::na")
      } ++
        numericCols.flatMap { c =>
          Seq(avg(col(c)).as(s"$c::mean"), stddev_samp(col(c)).as(s"$c::std"),
            min(col(c)).as(s"$c::min"), max(col(c)).as(s"$c::max"))
        } ++
        dateCols.flatMap { c =>
          Seq(min(col(c)).as(s"$c::dmin"), max(col(c)).as(s"$c::dmax"))
        })
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def dbl(f: String): Double = {
      val i = row.fieldIndex(f)
      if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    }
    DataSummary(
      totalRows = row.getLong(row.fieldIndex("__total")),
      totalColumns = fields.size,
      columnTypes = types,
      missingValues =
        fields.map(f => f.name -> row.getLong(row.fieldIndex(s"${f.name}::na"))).toMap,
      numericColumns = numericCols.map { c =>
        c -> NumericStats(dbl(s"$c::mean"), dbl(s"$c::std"), dbl(s"$c::min"), dbl(s"$c::max"))
      }.toMap,
      dateColumns = dateCols.map { c =>
        val iMin = row.fieldIndex(s"$c::dmin"); val iMax = row.fieldIndex(s"$c::dmax")
        c -> DateStats(
          if (row.isNullAt(iMin)) null else row.getDate(iMin),
          if (row.isNullAt(iMax)) null else row.getDate(iMax))
      }.toMap)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation: pre-aggregate on
  * (key, salt) so a key owning 30% of a 100 TB table spreads over
  * `salts` reducers, then combine partials per key. Correct for any
  * associative aggregate (counts/sums here); verified equivalent to
  * the direct groupBy by the t2 oracle (q40).
  *
  * (AQE's skew handling covers JOINS; aggregation skew still wants the
  * salt when one group key dominates — partial aggregation helps only
  * until the map side runs out of distinct (key, salt) slots.)
  */
object SkewOps {

  def saltedAgg(df: DataFrame, key: String, salts: Int,
      sums: Seq[(String, String)]): DataFrame = {
    // deterministic salt (row-content based, not rand()) keeps the op
    // reproducible and restart-safe
    val salted = df.withColumn("__salt",
      pmod(hash(sums.map(c => col(c._1)) :+ col(key): _*), lit(salts)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sums.map { case (c, as) => sum(col(c)).as(s"__s_$as") }: _*)
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        sums.map { case (_, as) => sum(col(s"__s_$as")).as(as) }: _*)
  }
}

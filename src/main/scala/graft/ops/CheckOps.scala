package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the dbt-test / expectations
  * pattern): a rule set compiles into ONE aggregate pass over the
  * frame, reporting per-rule violation counts as data — the artifact
  * a pipeline gates a load on.
  *
  * Scale shape: every rule is a conditional-count expression inside a
  * single partial+final hash aggregate — one scan, map-side combine,
  * a one-row result exploded to (rule, column, n_violations) rows.
  * `unique` adds the one thing a projection can't express — a distinct
  * count — as `count(col) - approx?NO: count(DISTINCT col)` inside the
  * same aggregate (Spark plans the mixed distinct/non-distinct
  * aggregate with an Expand; with a handful of rules that 2x on an
  * 8-byte column is cheaper than a second scan of a 100 TB table).
  */
object CheckOps {

  sealed trait Rule {
    def ruleName: String
    def column: String
    private[CheckOps] def violations: Column
  }

  /** Nulls are violations. */
  final case class NotNull(column: String) extends Rule {
    val ruleName = "not_null"
    private[CheckOps] def violations: Column =
      count(lit(1)) - count(col(column))
  }

  /** Duplicated non-null values: rows beyond the first per value. */
  final case class Unique(column: String) extends Rule {
    val ruleName = "unique"
    private[CheckOps] def violations: Column =
      count(col(column)) - countDistinct(col(column))
  }

  /** Non-null values outside the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    require(values.nonEmpty, "accepted set must be non-empty")
    val ruleName = "accepted_values"
    private[CheckOps] def violations: Column =
      count(when(!col(column).isin(values: _*), lit(1)))
  }

  /** Non-null values outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    require(lo <= hi, s"empty range: [$lo, $hi]")
    val ruleName = "in_range"
    private[CheckOps] def violations: Column =
      count(when(col(column) < lo || col(column) > hi, lit(1)))
  }

  /** Run every rule in one aggregate; returns (rule, column,
    * n_violations) ordered by (rule, column).
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      r.violations.cast("long").as(s"__v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.ruleName).as("rule"), lit(r.column).as("column"),
        col(s"__v$i").as("n_violations"))
    }
    row.select(explode(array(pairs: _*)).as("c"))
      .select(col("c.rule"), col("c.column"), col("c.n_violations"))
      .orderBy("rule", "column")
  }

  /** [[validate]] oracle rendering over a table/CTE name. */
  def validateSql(table: String, rules: Seq[Rule]): String = {
    def branch(rule: String, c: String, expr: String): String =
      s"""SELECT '$rule' AS rule, '$c' AS "column", $expr AS n_violations FROM $table"""
    val branches = rules.map {
      case NotNull(c) => branch("not_null", c, s"count(*) - count($c)")
      case Unique(c) => branch("unique", c, s"count($c) - count(DISTINCT $c)")
      case AcceptedValues(c, vs) =>
        val set = vs.map(v => s"'$v'").mkString(", ")
        branch("accepted_values", c,
          s"count(CASE WHEN NOT ($c IN ($set)) THEN 1 END)")
      case InRange(c, lo, hi) =>
        branch("in_range", c, s"count(CASE WHEN $c < $lo OR $c > $hi THEN 1 END)")
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY rule, \"column\"")
  }
}

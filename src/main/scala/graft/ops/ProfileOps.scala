package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Data-profiling operators: functional-dependency discovery metrics
  * (the TANE/g3 family) — "does X determine Y in this table, and if
  * not, by how much is it off?". The workhorse of schema inference,
  * key detection, and denormalization audits over ingested data.
  *
  * Exactness: violation pairs and g3 are pure integer counts; the
  * pair sums route through DECIMAL(38,0) (HUGEINT on the oracle) so
  * an FD over 10^10 rows cannot wrap a BIGINT mid-sum (the q151 lift
  * discipline).
  */
object ProfileOps {

  /** One candidate FD: display name, LHS columns, RHS column. */
  final case class FdCandidate(name: String, lhs: Seq[String], rhs: String)

  /** Per-candidate FD violation metrics over `df`:
    *
    *  - `n_rows`, `n_lhs`: table size and distinct-LHS count.
    *  - `viol_pairs`: # row pairs sharing LHS but differing on RHS —
    *    `(Σ_g n_g(n_g−1) − Σ_{g,v} c_gv(c_gv−1)) / 2`, the g2-style
    *    pair count (0 iff the FD holds).
    *  - `viol_ppm`: viol_pairs per million same-LHS pairs (NULL when
    *    no LHS group has 2 rows).
    *  - `g3_rows`: minimum rows to delete for the FD to hold —
    *    `n_rows − Σ_g max_v c_gv`, the classic g3 measure.
    *
    * Scale shape: per candidate, ONE (lhs, rhs)-keyed aggregate (the
    * only data-sized shuffle, map-side combining), then an lhs-keyed
    * regroup of the already-collapsed cell frame, then a single-row
    * rollup; candidates union into one small frame. No joins, no
    * windows — the 100 TB profile pass is k× one aggregation scan.
    */
  def fdProfile(df: DataFrame, fds: Seq[FdCandidate]): DataFrame = {
    val dec = DecimalType(38, 0)
    fds.map { fd =>
      val cells = df
        .groupBy((fd.lhs :+ fd.rhs).map(col): _*)
        .agg(count(lit(1)).as("c"))
      val groups = cells
        .groupBy(fd.lhs.map(col): _*)
        .agg(sum(col("c")).as("n"), max(col("c")).as("cmax"),
          sum((col("c").cast(dec)) * (col("c") - 1).cast(dec)).as("ok2"))
      groups.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum(col("n").cast(dec) * (col("n") - 1).cast(dec)).as("all2"),
        sum(col("ok2")).as("ok2"),
        sum(col("cmax")).as("keep"))
        .select(lit(fd.name).as("fd"),
          col("n_rows"), col("n_lhs"),
          // `div` = integral divide on DECIMAL, truncating like the
          // oracle's `//` (a decimal cast would round HALF_UP)
          expr("(all2 - ok2) div 2").cast(LongType).as("viol_pairs"),
          when(col("all2") > 0,
            expr("((all2 - ok2) * 1000000) div all2").cast(LongType))
            .as("viol_ppm"),
          (col("n_rows") - col("keep")).as("g3_rows"))
    }.reduce(_ unionAll _).orderBy("fd")
  }

  /** [[fdProfile]] oracle rendering over a table name. */
  def fdProfileSql(table: String, fds: Seq[FdCandidate]): String = {
    val parts = fds.map { fd =>
      val lhs = fd.lhs.mkString(", ")
      s"""SELECT '${fd.name}' AS fd, n_rows, n_lhs,
         |  CAST((all2 - ok2) // 2 AS BIGINT) AS viol_pairs,
         |  CASE WHEN all2 > 0
         |    THEN CAST((all2 - ok2) * 1000000 // all2 AS BIGINT) END AS viol_ppm,
         |  n_rows - keep AS g3_rows
         |FROM (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_lhs,
         |    sum(CAST(n AS HUGEINT) * (n - 1)) AS all2,
         |    sum(ok2) AS ok2, CAST(sum(cmax) AS BIGINT) AS keep
         |  FROM (
         |    SELECT $lhs, CAST(sum(c) AS BIGINT) AS n, max(c) AS cmax,
         |      sum(CAST(c AS HUGEINT) * (c - 1)) AS ok2
         |    FROM (SELECT $lhs, ${fd.rhs}, count(*) AS c
         |          FROM $table GROUP BY ALL)
         |    GROUP BY ALL))""".stripMargin
    }
    parts.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY fd")
  }
}

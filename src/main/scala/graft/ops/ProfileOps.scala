package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * Scale shape: ALL candidates MELT into one (fd, lhs…, rhs) census
    * — ONE table scan and ONE map-side-combining shuffle no matter
    * how many FDs are profiled (the q214 information-gain shape; the
    * per-candidate formulation scanned the table k times, measured
    * 6.7× per 10×). Each row explodes into k cells tagged by
    * candidate name; every melt slot is TWIN-TYPED (`_l` BIGINT /
    * `_s` VARCHAR, the unused twin NULL) so integral keys shuffle as
    * 8-byte longs — a first cut that cast every key to string tripled
    * the 1× wall time on pure cast/allocation CPU. NULL pads group
    * consistently on both engines. Everything after the census
    * operates on the collapsed cell frame: an (fd, lhs)-keyed
    * regroup, then a per-fd rollup. No joins, no windows.
    */
  def fdProfile(df: DataFrame, fds: Seq[FdCandidate]): DataFrame = {
    val dec = DecimalType(38, 0)
    val width = fds.map(_.lhs.size).max
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, LongType)
    def isIntegral(name: String): Boolean =
      integral.contains(df.schema(name).dataType)
    // one (long, string) twin per slot; exactly one side non-null
    def slot(colName: Option[String], tag: String): Seq[Column] =
      colName match {
        case Some(n) if isIntegral(n) =>
          Seq(col(n).cast("long").as(s"${tag}_l"),
            lit(null).cast("string").as(s"${tag}_s"))
        case Some(n) =>
          Seq(lit(null).cast("long").as(s"${tag}_l"),
            col(n).cast("string").as(s"${tag}_s"))
        case None =>
          Seq(lit(null).cast("long").as(s"${tag}_l"),
            lit(null).cast("string").as(s"${tag}_s"))
      }
    // fd rides as a TINY int through the censuses (a constant string
    // key still hashes per cell row); the display name maps back on
    // the k-row result
    val melt = inline(array(fds.zipWithIndex.map { case (fd, id) =>
      val fields = lit(id).as("fd") +:
        ((0 until width).flatMap(i => slot(fd.lhs.lift(i), s"k$i")) ++
          slot(Some(fd.rhs), "rhs"))
      struct(fields: _*)
    }: _*))
    val kNames = (0 until width).flatMap(i => Seq(s"k${i}_l", s"k${i}_s"))
    val cellKeys = ("fd" +: kNames) ++ Seq("rhs_l", "rhs_s")
    val cells = df.select(melt)
      .groupBy(cellKeys.head, cellKeys.tail: _*)
      .agg(count(lit(1)).as("c"))
    val grouped = cells
      .groupBy("fd", kNames: _*)
      .agg(sum(col("c")).as("n"), max(col("c")).as("cmax"),
        sum((col("c").cast(dec)) * (col("c") - 1).cast(dec)).as("ok2"))
    val fdName = fds.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (fd, id)) => when(col("fd") === id, fd.name).otherwise(acc)
    }
    grouped
      .groupBy("fd")
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum(col("n").cast(dec) * (col("n") - 1).cast(dec)).as("all2"),
        sum(col("ok2")).as("ok2"),
        sum(col("cmax")).as("keep"))
      .select(fdName.as("fd"),
        col("n_rows"), col("n_lhs"),
        // `div` = integral divide on DECIMAL, truncating like the
        // oracle's `//` (a decimal cast would round HALF_UP)
        expr("(all2 - ok2) div 2").cast(LongType).as("viol_pairs"),
        when(col("all2") > 0,
          expr("((all2 - ok2) * 1000000) div all2").cast(LongType))
          .as("viol_ppm"),
        (col("n_rows") - col("keep")).as("g3_rows"))
      .orderBy("fd")
  }

  /** [[fdProfile]] oracle rendering over a table name (same melted
    * single-census shape; the oracle melts every key to VARCHAR —
    * integer→string casts are injective, so the cell counts are
    * identical to the twin-typed Spark census without the oracle
    * needing schema knowledge).
    */
  def fdProfileSql(table: String, fds: Seq[FdCandidate]): String = {
    val width = fds.map(_.lhs.size).max
    val kNames = (0 until width).map(i => s"k$i")
    val structs = fds.map { fd =>
      val ks = (0 until width).map { i =>
        val v = if (i < fd.lhs.size) s"CAST(${fd.lhs(i)} AS VARCHAR)"
          else "CAST(NULL AS VARCHAR)"
        s"'k$i': $v"
      }
      s"{'fd': '${fd.name}', ${ks.mkString(", ")}, " +
        s"'rhs': CAST(${fd.rhs} AS VARCHAR)}"
    }
    val kList = kNames.mkString(", ")
    val kSel = kNames.map(n => s"u.$n AS $n").mkString(", ")
    s"""WITH m AS (SELECT u.fd AS fd, $kSel, u.rhs AS rhs
       |  FROM (SELECT unnest([${structs.mkString(",\n      ")}]) AS u
       |        FROM $table)),
       |cells AS (SELECT fd, $kList, rhs, count(*) AS c FROM m GROUP BY ALL),
       |grp AS (SELECT fd, $kList, CAST(sum(c) AS BIGINT) AS n,
       |    max(c) AS cmax, sum(CAST(c AS HUGEINT) * (c - 1)) AS ok2
       |  FROM cells GROUP BY ALL)
       |SELECT fd, n_rows, n_lhs,
       |  CAST((all2 - ok2) // 2 AS BIGINT) AS viol_pairs,
       |  CASE WHEN all2 > 0
       |    THEN CAST((all2 - ok2) * 1000000 // all2 AS BIGINT) END AS viol_ppm,
       |  n_rows - keep AS g3_rows
       |FROM (
       |  SELECT fd, CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_lhs,
       |    sum(CAST(n AS HUGEINT) * (n - 1)) AS all2,
       |    sum(ok2) AS ok2, CAST(sum(cmax) AS BIGINT) AS keep
       |  FROM grp GROUP BY fd)
       |ORDER BY fd""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._

/** Driver-contract queries for the core ETL operator inventory
  * (SURVEY.md §2): one query per operator, each with an equivalent
  * DuckDB oracle. Dirty inputs are synthesized deterministically from
  * the shared fixture tables with expressions whose STRING RENDERINGS
  * are identical in both engines (ints and 2-decimal doubles < 1e7;
  * Spark switches to scientific notation outside [1e-3, 1e7), DuckDB
  * never does — generators stay inside that window).
  *
  * Every query ends in a total ORDER BY so the parquet dump is
  * row-order deterministic regardless of partitioning.
  */
object EtlQueries {

  import OracleSql._

  // -- q01: T1 type detection --------------------------------------------
  private val detectCols: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"))

  private def q01(spark: SparkSession, sfDir: String): DataFrame = {
    // per-table profiles are independent jobs that each underutilize
    // the cluster — submit them concurrently from the driver
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = detectCols.map { case (t, cols) =>
      Future {
        val df = Tables.read(spark, sfDir, t).select(cols.map(col): _*)
        val types = TypeDetector.detect(df)
        cols.map(c => (t, c, types(c).name))
      }
    }
    val rows = Await.result(Future.sequence(futures), 30.minutes).flatten
    spark.createDataFrame(rows)
      .toDF("table_name", "column_name", "detected")
      .orderBy("table_name", "column_name")
  }

  private val q01Oracle: String =
    detectCols.flatMap { case (t, cols) => cols.map(c => detectSql(t, c)) }
      .map(s => s"($s)")
      .mkString("", " UNION ALL ", " ORDER BY table_name, column_name")

  // -- q02: T2 multi-format date parse -----------------------------------
  /** (spark date_format pattern, duckdb strftime pattern) — both render
    * zero-padded, so the generated dirty strings are identical.
    */
  private val dirtyDateFmts: Seq[(String, String)] = Seq(
    "yyyy-MM-dd" -> "%Y-%m-%d",
    "yyyy/MM/dd" -> "%Y/%m/%d",
    "dd-MM-yyyy" -> "%d-%m-%Y",
    "MM/dd/yyyy" -> "%m/%d/%Y",     // round-trips through d/M first-match
    "yyyyMMdd"   -> "%Y%m%d",
    "dd.MM.yyyy" -> "%d.%m.%Y",
    "yyyy-MM-dd HH:mm:ss" -> "%Y-%m-%d %H:%M:%S")

  private def dirtyDateExpr(render: (String, String) => String): String = {
    val branches = dirtyDateFmts.zipWithIndex
      .map { case ((sp, du), i) => s"WHEN $i THEN ${render(sp, du)}" }
      .mkString(" ")
    "(CASE WHEN o_orderkey % 29 = 0 THEN 'not a date' " +
      s"ELSE CASE o_orderkey % 7 $branches END END)"
  }

  private def q02(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = dirtyDateExpr((sp, _) => s"date_format(o_orderdate, '$sp')")
    Tables.read(spark, sfDir, "orders")
      .withColumn("raw", expr(dirty))
      .select(col("o_orderkey"), col("raw"),
        DateFormats.parseDate(col("raw")).as("d"))
      .orderBy("o_orderkey")
  }

  private val q02Oracle: String = {
    val dirty = dirtyDateExpr((_, du) => s"strftime(o_orderdate, '$du')")
    s"""SELECT o_orderkey, raw, ${DateFormats.duckdbParseDate("raw")} AS d
       |FROM (SELECT o_orderkey, $dirty AS raw FROM orders) b
       |ORDER BY o_orderkey""".stripMargin
  }

  // -- q03: C1 numeric clean ---------------------------------------------
  private def dirtyNumExpr(castStr: String => String, intT: String): String =
    s"""(CASE l_linenumber % 6
       | WHEN 1 THEN concat('  ', ${castStr(s"CAST(l_quantity AS $intT)")}, '  ')
       | WHEN 2 THEN concat('$$', ${castStr("l_extendedprice")})
       | WHEN 3 THEN replace(${castStr("l_extendedprice")}, '.', ',')
       | WHEN 4 THEN 'N/A'
       | WHEN 5 THEN (CASE WHEN l_orderkey % 2 = 0 THEN 'abc' ELSE '1,234.56' END)
       | ELSE concat('-', ${castStr(s"CAST(l_quantity AS $intT)")})
       | END)""".stripMargin.replaceAll("\n", " ")

  private def q03(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = dirtyNumExpr(e => s"CAST($e AS STRING)", "INT")
    Tables.read(spark, sfDir, "lineitem")
      .withColumn("raw", expr(dirty))
      .select(col("l_orderkey"), col("l_linenumber"), col("raw"),
        Cleaners.cleanNumeric(col("raw")).as("v"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q03Oracle: String = {
    val dirty = dirtyNumExpr(e => s"CAST($e AS VARCHAR)", "INTEGER")
    s"""SELECT l_orderkey, l_linenumber, raw, ${cleanNumeric("raw")} AS v
       |FROM (SELECT l_orderkey, l_linenumber, $dirty AS raw FROM lineitem) b
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  // -- q04: C2 text clean (with the mean-length collapse gate) -----------
  private val dirtyTextExpr: String =
    "(CASE WHEN doc_id % 13 = 0 THEN 'N/A' " +
      "WHEN doc_id % 17 = 0 THEN '  None  ' " +
      "WHEN doc_id % 11 = 0 THEN concat('a', '   ', text) " +
      "ELSE concat('  ', text, ' ') END)"

  private def q04(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents").withColumn("raw", expr(dirtyTextExpr))
    // column-level gate, decided on the driver like the reference
    val gateRow = d.agg(avg(length(Cleaners.cleanText(col("raw"),
      collapseWhitespace = false)))).collect()(0)
    val gate = !gateRow.isNullAt(0) && gateRow.getDouble(0) > 20
    d.select(col("doc_id"),
        Cleaners.cleanText(col("raw"), collapseWhitespace = gate).as("t"))
      .orderBy("doc_id")
  }

  private val q04Oracle: String =
    s"""WITH b AS (SELECT doc_id, $dirtyTextExpr AS raw FROM documents),
       |g AS (SELECT avg(length(${cleanTextBase("raw")})) > 20 AS coll FROM b)
       |SELECT doc_id,
       |  CASE WHEN (SELECT coll FROM g)
       |       THEN ${collapseWs(cleanTextBase("raw"))}
       |       ELSE ${cleanTextBase("raw")} END AS t
       |FROM b ORDER BY doc_id""".stripMargin

  // -- q05: C4 categorical clean + rare fold -----------------------------
  private def dirtyCatExpr(str: String): String =
    s"(CASE WHEN event_id % 101 = 0 THEN concat('rare_', CAST(event_id % 5 AS $str)) " +
      "WHEN event_id % 103 = 0 THEN 'n/a' " +
      "WHEN event_id % 2 = 0 THEN upper(event_type) " +
      "ELSE concat(' ', event_type, ' ') END)"

  private def q05(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.read(spark, sfDir, "events")
    val base = ev.select(col("event_id"),
      Cleaners.cleanCategoricalBase(expr(dirtyCatExpr("STRING"))).as("c"))
    val total = ev.count()
    // post-clean <50-distinct gate + rare set, as in AutoEtl stage 2
    val counts = base.where(col("c").isNotNull)
      .groupBy("c").agg(count(lit(1)).as("n")).limit(50).collect()
    // fold only below 50 distinct (reference len(value_counts) < 50;
    // matches AutoEtl stage 2 and the oracle's count(DISTINCT c) < 50)
    val rare =
      if (counts.length >= 50) Seq.empty[String]
      else counts.filter(_.getLong(1) < AutoEtl.rareThreshold(total))
        .map(_.getString(0)).toSeq.sorted
    base.select(col("event_id"), Cleaners.foldRare(col("c"), rare).as("cat"))
      .orderBy("event_id")
  }

  private val q05Oracle: String =
    s"""WITH b AS (SELECT event_id, ${cleanCategoricalBase(dirtyCatExpr("VARCHAR"))} AS c FROM events)
       |SELECT event_id,
       |  CASE WHEN c IS NOT NULL
       |        AND (SELECT count(DISTINCT c) FROM b) < 50
       |        AND c IN (SELECT c FROM b WHERE c IS NOT NULL GROUP BY c
       |                  HAVING count(*) < (SELECT greatest(2.0, 0.01 * count(*)) FROM events))
       |       THEN 'Other' ELSE c END AS cat
       |FROM b ORDER BY event_id""".stripMargin

  // -- q06: M2 median imputation -----------------------------------------
  private def q06(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_orderkey") % 13 === 0, lit(null)).otherwise(col("l_quantity")).as("q"))
    val med = Imputer.medians(base, Seq("q"))("q")
    base.select(col("l_orderkey"), col("l_linenumber"),
        coalesce(col("q"), lit(med)).as("q"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q06Oracle: String =
    """WITH b AS (SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_quantity END AS q FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  COALESCE(q, (SELECT quantile_cont(q, 0.5) FROM b)) AS q
      |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin

  // -- q07: M3 deterministic mode imputation -----------------------------
  private def q07(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment")).as("seg"))
    val m = Imputer.mode(base, "seg").map(_.toString).getOrElse("Unknown")
    base.select(col("c_custkey"), coalesce(col("seg"), lit(m)).as("seg"))
      .orderBy("c_custkey")
  }

  private val q07Oracle: String =
    """WITH b AS (SELECT c_custkey,
      |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg FROM customer)
      |SELECT c_custkey,
      |  COALESCE(seg, (SELECT seg FROM b WHERE seg IS NOT NULL
      |                 GROUP BY seg ORDER BY count(*) DESC, seg ASC LIMIT 1)) AS seg
      |FROM b ORDER BY c_custkey""".stripMargin

  // -- q08: M1 high-null column drop decisions ---------------------------
  private val highnullSpecs: Seq[(String, Int)] =
    Seq(("hi85", 85), ("mid50", 50), ("lo0", 0))

  private def q08(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
    val derived = orders.select(highnullSpecs.map { case (n, pct) =>
      when(col("o_orderkey") % 100 < pct, lit(null)).otherwise(col("o_totalprice")).as(n)
    }: _*)
    val total = orders.count()
    val nulls = Imputer.nullCounts(derived)
    val rows = highnullSpecs.map { case (n, _) =>
      val ratio = if (total == 0) 0.0 else nulls(n).toDouble / total
      (n, math.floor(ratio * 10000 + 0.5) / 10000.0, ratio > Imputer.dropThreshold)
    }
    spark.createDataFrame(rows).toDF("column_name", "na_ratio", "dropped")
      .orderBy("column_name")
  }

  private val q08Oracle: String =
    highnullSpecs.map { case (n, pct) =>
      val ind = s"avg(CASE WHEN o_orderkey % 100 < $pct THEN 1.0 ELSE 0.0 END)"
      s"(SELECT '$n' AS column_name, ${n4(ind)} AS na_ratio, ($ind) > 0.8 AS dropped FROM orders)"
    }.mkString("", " UNION ALL ", " ORDER BY column_name")

  // -- q09: M5 winsorization ---------------------------------------------
  private def q09(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
    val sts = Winsorizer.stats(orders, Seq("o_totalprice"))
    orders.select(col("o_orderkey"),
        Norm.n4(Winsorizer.clampExpr(col("o_totalprice"), sts("o_totalprice"))).as("w"))
      .orderBy("o_orderkey")
  }

  private val q09Oracle: String = {
    val clamp =
      """CASE WHEN sd > 0 AND abs(o_totalprice - m) / sd > 3.0 AND o_totalprice > p95 THEN p95
        |     WHEN sd > 0 AND abs(o_totalprice - m) / sd > 3.0 AND o_totalprice < p05 THEN p05
        |     ELSE o_totalprice END""".stripMargin
    s"""WITH s AS (SELECT avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd,
       |  quantile_cont(o_totalprice, 0.05) AS p05, quantile_cont(o_totalprice, 0.95) AS p95
       |  FROM orders)
       |SELECT o_orderkey, ${n4(s"($clamp)")} AS w
       |FROM orders, s ORDER BY o_orderkey""".stripMargin
  }

  // -- q10: M6 exact dedup -----------------------------------------------
  private def q10(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("l_quantity").as("q"))
      .dropDuplicates()
      .orderBy("rf", "ls", "q")

  private val q10Oracle: String =
    """SELECT DISTINCT l_returnflag AS rf, l_linestatus AS ls, l_quantity AS q
      |FROM lineitem ORDER BY rf, ls, q""".stripMargin

  // -- q11: M7 summary (numeric stats, long format) ----------------------
  private val summaryCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def q11(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    val aggs = summaryCols.flatMap { c =>
      Seq(count(col(c)).cast("double").as(s"$c::n"),
        avg(col(c)).as(s"$c::mean"),
        stddev_samp(col(c)).as(s"$c::std"),
        min(col(c)).as(s"$c::min"),
        max(col(c)).as(s"$c::max"))
    }
    val row = li.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = summaryCols.flatMap { c =>
      Seq("n", "mean", "std", "min", "max").map { st =>
        val v = row.getDouble(row.fieldIndex(s"$c::$st"))
        (c, st, math.floor(v * 10000 + 0.5) / 10000.0)
      }
    }
    spark.createDataFrame(rows).toDF("column_name", "stat", "value")
      .orderBy("column_name", "stat")
  }

  private val q11Oracle: String =
    summaryCols.flatMap { c =>
      Seq(
        s"(SELECT '$c' AS column_name, 'n' AS stat, ${n4(s"CAST(count($c) AS DOUBLE)")} AS value FROM lineitem)",
        s"(SELECT '$c', 'mean', ${n4(s"avg($c)")} FROM lineitem)",
        s"(SELECT '$c', 'std', ${n4(s"stddev_samp($c)")} FROM lineitem)",
        s"(SELECT '$c', 'min', ${n4(s"min($c)")} FROM lineitem)",
        s"(SELECT '$c', 'max', ${n4(s"max($c)")} FROM lineitem)")
    }.mkString("", " UNION ALL ", " ORDER BY column_name, stat")

  // -- q12: M7 summary (date ranges) -------------------------------------
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .agg(min(col("l_shipdate").cast("date")).as("dmin"),
        max(col("l_shipdate").cast("date")).as("dmax"))
      .withColumn("column_name", lit("l_shipdate"))
    val ord = Tables.read(spark, sfDir, "orders")
      .agg(min(col("o_orderdate").cast("date")).as("dmin"),
        max(col("o_orderdate").cast("date")).as("dmax"))
      .withColumn("column_name", lit("o_orderdate"))
    li.unionByName(ord).select("column_name", "dmin", "dmax").orderBy("column_name")
  }

  private val q12Oracle: String =
    """(SELECT 'l_shipdate' AS column_name, CAST(min(l_shipdate) AS DATE) AS dmin,
      |  CAST(max(l_shipdate) AS DATE) AS dmax FROM lineitem)
      |UNION ALL
      |(SELECT 'o_orderdate', CAST(min(o_orderdate) AS DATE), CAST(max(o_orderdate) AS DATE) FROM orders)
      |ORDER BY column_name""".stripMargin

  // -- q13: full-pipeline golden (reference demo, expected output as
  //         literal VALUES derived in FIXTURES.md §B) --------------------
  // localCheckpoint(eager) then unpersist: the transform's cache must
  // not outlive the query (blocks otherwise accumulate across a 45+
  // query bench run); checkpoint blocks are freed by ContextCleaner
  // once the returned frame is dropped.
  private def q13(spark: SparkSession, sfDir: String): DataFrame = {
    val r = AutoEtl.transform(Demo.dirtyDemo(spark))
    val out = r.data.orderBy(col("id")).localCheckpoint(true)
    r.unpersist()
    out
  }

  private val q13Oracle: String = {
    val expected = Seq(
      ("1",  "2023-01-01", "100.50", "John",    "A", "100"),
      ("2",  "2023-02-15", "200,75", "Mary",    "B", "200"),
      ("3",  "2023-03-15", "100.50", "Alice",   "A", "450"),
      ("4",  "2023-01-01", "300.25", "Bob",     "C", "300"),
      ("5",  "2023-05-20", "invalid","Alice",   "B", "400"),
      ("6",  "2023-01-01", "400.50", "Alice",   "A", "450"),
      ("7",  "2023-07-04", "500.75", "Eve",     "D", "500"),
      ("8",  "2023-08-07", "600,25", "Charlie", "B", "600"),
      ("9",  "2023-09-10", "700.50", "David",   "A", "700"),
      ("10", "2023-12-25", "800.75", "Frank",   "E", "800"))
    val values = expected.map { case (id, d, n, t, c, m) =>
      s"($id, DATE '$d', '$n', '$t', '$c', $m)"
    }.mkString(", ")
    s"""SELECT CAST(id AS DOUBLE) AS id, date_col, numeric_col, text_col,
       |  categorical_col, CAST(mixed_col AS DOUBLE) AS mixed_col
       |FROM (VALUES $values)
       |  AS t(id, date_col, numeric_col, text_col, categorical_col, mixed_col)
       |ORDER BY id""".stripMargin
  }

  // -- q36: CSV sink + source round-trip through the full pipeline -------
  // K1 (CSV write) -> S2 (all-strings CSV read, trap P7) -> transform;
  // the cleaned output must equal the same golden VALUES as q13.
  private def q36(spark: SparkSession, sfDir: String): DataFrame = {
    val tmp = s"/tmp/graft_q36_roundtrip.csv"
    Io.write(Demo.dirtyDemo(spark), tmp)
    val back = Io.read(spark, tmp)
    val r = AutoEtl.transform(back)
    val out = r.data.orderBy(col("id")).localCheckpoint(true)
    r.unpersist()
    out
  }

  // -- q48: JSONL sink + source round-trip (K3 + S4 oracle coverage) -----
  // Same golden contract as q36, through the JSON Lines path. The demo
  // frame is all-string, so JSON round-trips values verbatim; JSON
  // read returns columns alphabetically, re-selected to demo order.
  private def q48(spark: SparkSession, sfDir: String): DataFrame = {
    // per-session path: two concurrent runs on one host must not
    // clobber each other's round-trip data mid-read (ADVICE r3)
    val tmp = s"/tmp/graft_q48_${spark.sparkContext.applicationId}.jsonl"
    Io.write(Demo.dirtyDemo(spark), tmp)
    val back = Io.read(spark, tmp).select(Demo.columns.map(col): _*)
    val r = AutoEtl.transform(back)
    val out = r.data.orderBy(col("id")).localCheckpoint(true)
    r.unpersist()
    Io.deleteLocalTmp(tmp) // checkpoint is eager — safe to clean now
    out
  }

  // -- q61: ORC sink + source round-trip (columnar alternative to
  //         parquet; Spark-native reader/writer) — same golden contract
  //         as q36/q48.
  private def q61(spark: SparkSession, sfDir: String): DataFrame = {
    val tmp = s"/tmp/graft_q61_${spark.sparkContext.applicationId}.orc"
    Io.write(Demo.dirtyDemo(spark), tmp)
    val back = Io.read(spark, tmp).select(Demo.columns.map(col): _*)
    val r = AutoEtl.transform(back)
    val out = r.data.orderBy(col("id")).localCheckpoint(true)
    r.unpersist()
    Io.deleteLocalTmp(tmp) // checkpoint is eager — safe to clean now
    out
  }

  // -- q65: JDBC sink + partitioned source round-trip (K4) ---------------
  // The reference's SQLite `to_sql("cleaned_data", if_exists="replace")`
  // (ETL_PROJECT.py:318-322) executed for REAL against embedded Derby:
  // write the cleaned demo, read it back through a 3-partition range
  // read (the warehouse-ingest shape — an unpartitioned JDBC read is a
  // one-task bottleneck at scale), same golden contract as q36/q48/q61.
  // localCheckpoint materializes eagerly so the in-memory database can
  // be dropped before returning.
  private def q65(spark: SparkSession, sfDir: String): DataFrame = {
    val db = s"graft_q65_${spark.sparkContext.applicationId}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val r = AutoEtl.transform(Demo.dirtyDemo(spark))
    Io.writeJdbc(r.data, url, "cleaned_data")
    r.unpersist()
    val back = Io.readJdbc(spark, url, "cleaned_data",
      partitionColumn = Some(("id", 1L, 10L, 3)))
    val out = back.select(Demo.columns.map(col): _*).orderBy(col("id"))
      .localCheckpoint(true)
    Io.dropDerbyInMemory(db)
    out
  }

  // -- q50: fit/apply split ----------------------------------------------
  // AutoEtl.fit freezes the demo's statistics into an EtlModel; the
  // model's STATELESS projection (clean -> impute -> winsorize, no
  // dedup — the demo has no duplicates) must reproduce the same golden
  // VALUES as the full transform. This is the serve path a stream or a
  // 100 TB batch applies without re-fitting.
  private def q50(spark: SparkSession, sfDir: String): DataFrame = {
    val model = AutoEtl.fit(Demo.dirtyDemo(spark))
    model(Demo.dirtyDemo(spark)).orderBy(col("id"))
  }

  // -- q46: M8 cleaning-report counters as rows --------------------------
  // The report is driver-side metadata (bounded: columns x actions);
  // rendering it as rows lets the t2 oracle hash the counters against
  // the FIXTURES.md §B golden expectations.
  private def q46(spark: SparkSession, sfDir: String): DataFrame = {
    val r = AutoEtl.transform(Demo.dirtyDemo(spark))
    r.unpersist()
    val rows = r.report.actions.toSeq.flatMap { case (c, as) =>
      as.zipWithIndex.map { case (a, i) => (c, i, a.render) }
    }
    import spark.implicits._
    rows.toDF("col_name", "seq", "action").orderBy("col_name", "seq")
  }

  // Golden action log per FIXTURES.md §B (verified against the round-2
  // transform run; every counter is derivable from the reference
  // semantics: 9/10 dates parse, mixed_col loses 2 to C1, median 450.0,
  // all-unique mode ties -> smallest value).
  private val q46Oracle: String = {
    val expected = Seq(
      ("categorical_col", 0, "detected column type: unknown"),
      ("categorical_col", 1, "cleaned text column"),
      ("date_col", 0, "detected column type: date"),
      ("date_col", 1, "parsed 9 of 10 values as dates"),
      ("date_col", 2, "imputed missing values with mode: 2023-01-01"),
      ("id", 0, "detected column type: numeric"),
      ("id", 1, "cleaned numeric column, newly invalid values: 0"),
      ("mixed_col", 0, "detected column type: numeric"),
      ("mixed_col", 1, "cleaned numeric column, newly invalid values: 2"),
      ("mixed_col", 2, "imputed missing values with median: 450.0"),
      ("numeric_col", 0, "detected column type: unknown"),
      ("numeric_col", 1, "cleaned text column"),
      ("numeric_col", 2, "imputed missing values with mode: 100.50"),
      ("text_col", 0, "detected column type: unknown"),
      ("text_col", 1, "cleaned text column"),
      ("text_col", 2, "imputed missing values with mode: Alice"))
    val values = expected.map { case (c, i, a) => s"('$c', $i, '$a')" }
      .mkString(", ")
    s"""SELECT col_name, CAST(seq AS INTEGER) AS seq, action
       |FROM (VALUES $values) AS t(col_name, seq, action)
       |ORDER BY col_name, seq""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_detect_types", q01, Some(q01Oracle)),
    QueryDef("q02_clean_dates", q02, Some(q02Oracle)),
    QueryDef("q03_clean_numeric", q03, Some(q03Oracle)),
    QueryDef("q04_clean_text", q04, Some(q04Oracle)),
    QueryDef("q05_clean_categorical", q05, Some(q05Oracle)),
    QueryDef("q06_impute_median", q06, Some(q06Oracle)),
    QueryDef("q07_impute_mode", q07, Some(q07Oracle)),
    QueryDef("q08_drop_highnull", q08, Some(q08Oracle)),
    QueryDef("q09_winsorize", q09, Some(q09Oracle)),
    QueryDef("q10_dedup_exact", q10, Some(q10Oracle)),
    QueryDef("q11_summary_numeric", q11, Some(q11Oracle)),
    QueryDef("q12_summary_dates", q12, Some(q12Oracle)),
    QueryDef("q13_etl_demo_golden", q13, Some(q13Oracle)),
    QueryDef("q36_csv_roundtrip", q36, Some(q13Oracle)),
    QueryDef("q46_report_counters", q46, Some(q46Oracle)),
    QueryDef("q48_jsonl_roundtrip", q48, Some(q13Oracle)),
    QueryDef("q50_model_apply", q50, Some(q13Oracle)),
    QueryDef("q61_orc_roundtrip", q61, Some(q13Oracle)),
    QueryDef("q65_jdbc_roundtrip", q65, Some(q13Oracle)),
  )
}

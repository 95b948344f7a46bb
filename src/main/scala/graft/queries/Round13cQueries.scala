package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-13 third wave: storage-layout and pipeline-engineering ops —
  * zone-map skip audit (q316: which predicates prune which fraction
  * of row groups), incremental view maintenance (q317: merge a delta
  * aggregate into a base aggregate instead of rescanning), an
  * encoding-damage audit (q318: mojibake/replacement-char/non-ASCII
  * rates per source), and a fixed-width record roundtrip (q319: the
  * COBOL/mainframe feed layout, formatted and re-parsed exactly).
  */
object Round13cQueries {

  // -- q316: zone-map skip audit ---------------------------------------------
  // Parquet/iceberg data skipping works off per-row-group min/max
  // stats; BEFORE re-clustering 100 TB it pays to know how much each
  // candidate predicate could skip under the current layout. Row
  // groups are simulated as 64 key-range buckets; ONE census computes
  // each bucket's (min, max) for ship date and quantity, then every
  // audit predicate evaluates set-algebraically against the ≤64-row
  // stats frame: a group is SKIPPABLE when its [min, max] cannot
  // intersect the predicate. Output per predicate: groups, skippable
  // groups, skip ppm. Exact integers end to end (dates as epoch
  // days, quantity in integer units — the fixture's quantities are
  // whole numbers, pinned by the cast).
  private val ZmBuckets = 64

  private def q316(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
    val bs = li.agg(
      expr(s"(max(l_orderkey) + $ZmBuckets) div $ZmBuckets").as("bs"))
    val stats = li.crossJoin(broadcast(bs))
      .select(expr("l_orderkey div bs").as("g"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast(LongType).as("d"),
        col("l_quantity").cast(LongType).as("q"))
      .groupBy("g")
      .agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
        min(col("q")).as("qmin"), max(col("q")).as("qmax"))
      .localCheckpoint(true) // ≤64 rows; one pass per predicate
    // skippable iff the group's stats EXCLUDE the predicate
    val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      // d >= day(1995-06-01): day 1247 (pinned literal both engines)
      "ship_after_1995h2" -> (col("dmax") < 1247L),
      // 1993 spans days [366, 730] from the 1992-01-01 epoch
      "ship_in_1993" -> (col("dmax") < 366L || col("dmin") > 730L),
      "qty_over_45" -> (col("qmax") <= 45L),
      "qty_exactly_1" -> (col("qmin") > 1L || col("qmax") < 1L))
    preds.map { case (name, skip) =>
      stats.agg(count(lit(1)).as("n_groups"),
          sum(when(skip, 1L).otherwise(0L)).as("n_skippable"))
        .select(lit(name).as("predicate"), col("n_groups"),
          col("n_skippable"),
          expr("n_skippable * 1000000 div n_groups").as("skip_ppm"))
    }.reduce(_ unionAll _).orderBy("predicate")
  }

  private val q316Oracle: String = {
    val preds = Seq(
      ("ship_after_1995h2", "dmax < 1247"),
      ("ship_in_1993", "dmax < 366 OR dmin > 730"),
      ("qty_over_45", "qmax <= 45"),
      ("qty_exactly_1", "qmin > 1 OR qmax < 1"))
    val branches = preds.map { case (name, skip) =>
      s"""SELECT '$name' AS predicate, count(*) AS n_groups,
         |  CAST(sum(CASE WHEN $skip THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_skippable,
         |  CAST(sum(CASE WHEN $skip THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS skip_ppm
         |FROM stats""".stripMargin
    }
    s"""WITH bsz AS (SELECT (max(l_orderkey) + $ZmBuckets) // $ZmBuckets
       |    AS bs FROM lineitem),
       |stats AS (SELECT l_orderkey // bs AS g,
       |    min(CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01'
       |      AS BIGINT)) AS dmin,
       |    max(CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01'
       |      AS BIGINT)) AS dmax,
       |    min(CAST(l_quantity AS BIGINT)) AS qmin,
       |    max(CAST(l_quantity AS BIGINT)) AS qmax
       |  FROM lineitem, bsz GROUP BY 1)
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY predicate""".stripMargin
  }

  // -- q317: incremental view maintenance -------------------------------------
  // The nightly-refresh shape: a per-customer revenue view exists for
  // the base period; day-2 rows arrive; the refresh merges the DELTA
  // aggregate into the base instead of rescanning the base (at 100 TB
  // the base scan is the whole cost — the merge is delta-sized plus a
  // key-partitioned join). Both (sum, count) partials are
  // decomposable, so merged == full recompute EXACTLY — and the
  // oracle IS the full recompute, which makes the hash compare a
  // correctness proof of the maintenance algebra. Money rides the
  // integer cents grid. Output filtered to custkey % 50 = 0 to keep
  // the dump bounded.
  private val IvmCut = "1997-01-01"

  private def q317(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
    val orders = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        cents.as("c"))
    def agg(df: DataFrame): DataFrame = df.groupBy("o_custkey")
      .agg(sum(col("c")).as("rev_c"), count(lit(1)).as("n"))
    val base = agg(orders.where(col("d") < lit(IvmCut).cast("date")))
    val delta = agg(orders.where(col("d") >= lit(IvmCut).cast("date")))
    base.select(col("o_custkey"), col("rev_c").as("b_rev"),
        col("n").as("b_n"))
      .join(delta.select(col("o_custkey"), col("rev_c").as("d_rev"),
        col("n").as("d_n")), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("b_rev"), lit(0L)) + coalesce(col("d_rev"), lit(0L)))
          .as("rev_cents"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"))
      .where(col("o_custkey") % 50 === 0)
      .orderBy("o_custkey")
  }

  private val q317Oracle: String =
    s"""SELECT o_custkey,
       |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
       |    AS BIGINT) AS rev_cents,
       |  count(*) AS n_orders
       |FROM orders WHERE o_custkey % 50 = 0
       |GROUP BY 1 ORDER BY o_custkey""".stripMargin

  // -- q318: encoding-damage audit ---------------------------------------------
  // The ingest-quality gate a crawl pipeline runs before training:
  // per source, how many documents carry (a) any non-ASCII content
  // (byte length > char length — exact on both engines, no regex),
  // (b) the U+FFFD replacement character (a decoder already gave up),
  // (c) classic UTF-8-read-as-Latin-1 mojibake markers ("Ã©"-class
  // two-byte sequences, plus "â€"), (d) embedded NUL/TAB control
  // bytes. Rates in ppm of the source's docs.
  private def q318(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    // every marker as an explicit \u escape — a raw source literal
    // here would make behavior depend on this FILE's encoding
    val flags = Seq(
      "non_ascii" -> (octet_length(t) > length(t)),
      "replacement" -> t.contains(lit("\ufffd")),
      "mojibake" -> (t.contains(lit("\u00c3\u00a9")) ||
        t.contains(lit("\u00c3\u00a8")) ||
        t.contains(lit("\u00e2\u0080")) ||
        t.contains(lit("\u00c3\u00bc"))),
      "control" -> (t.contains(lit("\u0000")) || t.contains(lit("\t"))))
    val aggs = count(lit(1)).as("n_docs") +:
      flags.map { case (n, c) =>
        sum(when(c, 1L).otherwise(0L)).as(s"n_$n")
      }
    Tables.read(spark, sfDir, "documents")
      .groupBy("source")
      .agg(aggs.head, aggs.tail: _*)
      .select((col("source") +: col("n_docs") +:
        flags.map { case (n, _) =>
          expr(s"n_$n * 1000000 div n_docs").as(s"${n}_ppm")
        }): _*)
      .orderBy("source")
  }

  private val q318Oracle: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN strlen(text) > length(text)
      |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS non_ascii_ppm,
      |  CAST(sum(CASE WHEN contains(text, chr(65533))
      |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS replacement_ppm,
      |  CAST(sum(CASE WHEN contains(text, chr(195) || chr(169))
      |      OR contains(text, chr(195) || chr(168))
      |      OR contains(text, chr(226) || chr(128))
      |      OR contains(text, chr(195) || chr(188))
      |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS mojibake_ppm,
      |  CAST(sum(CASE WHEN contains(text, chr(0)) OR contains(text, chr(9))
      |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS control_ppm
      |FROM documents GROUP BY 1 ORDER BY source""".stripMargin

  // -- q319: fixed-width record roundtrip ---------------------------------------
  // The mainframe/COBOL feed layout: records are COLUMN OFFSETS, not
  // delimiters. Format each order into an 80-byte card (right-padded
  // key fields, LEFT-padded zero-filled numerics — the layout's
  // signature), then re-parse by offset with substring+trim+cast and
  // prove the roundtrip exactly. Both directions are per-row
  // projections inside whole-stage codegen; the oracle formats and
  // parses with the same offsets.
  private def q319(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
    val line = concat(
      rpad(col("o_custkey").cast("string"), 12, " "),
      lpad(col("o_orderkey").cast("string"), 12, "0"),
      lpad(cents.cast("string"), 15, "0"),
      rpad(col("o_orderpriority"), 15, " "),
      rpad(col("o_orderstatus"), 2, " "),
      date_format(to_date(col("o_orderdate")), "yyyyMMdd"))
    Tables.read(spark, sfDir, "orders")
      .select(line.as("card"))
      .select(col("card"), length(col("card")).as("card_len"))
      .select(
        trim(substring(col("card"), 1, 12)).cast(LongType).as("custkey"),
        substring(col("card"), 13, 12).cast(LongType).as("orderkey"),
        substring(col("card"), 25, 15).cast(LongType).as("cents"),
        trim(substring(col("card"), 40, 15)).as("priority"),
        trim(substring(col("card"), 55, 2)).as("status"),
        to_date(substring(col("card"), 57, 8), "yyyyMMdd").as("odate"),
        col("card_len"))
      .groupBy("priority", "status")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("odate")).as("d_min"), max(col("odate")).as("d_max"),
        max(col("card_len")).cast(LongType).as("max_len"),
        min(col("card_len")).cast(LongType).as("min_len"))
      .orderBy("priority", "status")
  }

  private val q319Oracle: String =
    """WITH card AS (SELECT
      |    rpad(CAST(o_custkey AS VARCHAR), 12, ' ')
      |    || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
      |    || lpad(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |         AS VARCHAR), 15, '0')
      |    || rpad(o_orderpriority, 15, ' ')
      |    || rpad(o_orderstatus, 2, ' ')
      |    || strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS card
      |  FROM orders),
      |parsed AS (SELECT
      |    CAST(trim(substring(card, 1, 12)) AS BIGINT) AS custkey,
      |    CAST(substring(card, 13, 12) AS BIGINT) AS orderkey,
      |    CAST(substring(card, 25, 15) AS BIGINT) AS cents,
      |    trim(substring(card, 40, 15)) AS priority,
      |    trim(substring(card, 55, 2)) AS status,
      |    strptime(substring(card, 57, 8), '%Y%m%d')::DATE AS odate,
      |    length(card) AS card_len
      |  FROM card)
      |SELECT priority, status, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  min(odate) AS d_min, max(odate) AS d_max,
      |  CAST(max(card_len) AS BIGINT) AS max_len,
      |  CAST(min(card_len) AS BIGINT) AS min_len
      |FROM parsed GROUP BY 1, 2 ORDER BY priority, status""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q316_zone_map_audit", q316, Some(q316Oracle)),
    QueryDef("q317_ivm_merge", q317, Some(q317Oracle)),
    QueryDef("q318_encoding_audit", q318, Some(q318Oracle)),
    QueryDef("q319_fixed_width", q319, Some(q319Oracle)),
  )
}

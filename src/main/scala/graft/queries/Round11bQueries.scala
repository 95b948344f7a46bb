package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-11 second wave: the quarantine channel as a STREAM, the
  * temporal (point-in-time) dimension join, and sentence-level text
  * statistics.
  */
object Round11bQueries {

  // -- q195: streaming quarantine channel --------------------------------------
  // q191's dead-letter router executed as a Structured Stream: file
  // source over the same lineitem feed -> the SAME routing projection
  // (Round11Queries.quarantineRouted — one definition, two execution
  // modes) -> complete-mode census -> memory sink. Streaming == batch
  // == oracle, the q47/q87 contract extended to the ETL reject path.
  private def q195(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.read(spark, sfDir, "lineitem").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(sfDir)
    val census = Round11Queries.quarantineCensus(
      Round11Queries.quarantineRouted(stream))
    val sink = "graft_q195_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = census.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("reason")
  }

  // -- q196: temporal (point-in-time) dimension join ----------------------------
  // The bitemporal lookup every fact-to-SCD-dimension join needs:
  // which attribute version was valid WHEN THE FACT HAPPENED. The
  // versioned dimension derives from each customer's own order
  // timeline (attribute = o_orderpriority, valid [order day, next
  // order day) in epoch days — ties on the same day close the earlier
  // version into an empty interval, deterministically); facts are the
  // same orders probed at +15 days (and at −1 day for every 5th order
  // key, which lands BEFORE the customer's first version and must
  // report UNMATCHED, never silently join to a later version).
  //
  // Plan shape: equi-join on the customer key with the range predicate
  // as a residual filter — per-key version counts are bounded by
  // per-customer order counts, so the fan-out is per-key-bounded (at
  // 100 TB both sides bucket on the key; no interval index needed).
  private def q196(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("d"),
        col("o_orderpriority").as("prio"))
      .localCheckpoint(true) // version build AND fact probe share it
    val w = Window.partitionBy("ck").orderBy(col("vf").asc, col("ok").asc)
    val versions = o.select(col("ck"), col("ok"), col("d").as("vf"), col("prio"))
      .withColumn("vt", lead(col("vf"), 1).over(w))
      .drop("ok")
    val facts = o.select(col("ck"), col("ok"),
      (col("d") + when(col("ok") % 5 === 0, -1).otherwise(15)).as("ts"))
    facts.join(versions,
        facts("ck") === versions("ck") && col("ts") >= col("vf") &&
          (col("vt").isNull || col("ts") < col("vt")), "left")
      .groupBy(coalesce(col("prio"), lit("UNMATCHED")).as("prio_at_ts"))
      .agg(count(lit(1)).as("n_facts"),
        countDistinct(facts("ck")).as("n_custs"))
      .orderBy("prio_at_ts")
  }

  private val q196Oracle: String =
    """WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |    o_orderpriority AS prio
      |  FROM orders),
      |v AS (SELECT ck, d AS vf, prio,
      |    lead(d) OVER (PARTITION BY ck ORDER BY d, ok) AS vt FROM o),
      |f AS (SELECT ck, ok,
      |    d + CASE WHEN ok % 5 = 0 THEN -1 ELSE 15 END AS ts FROM o)
      |SELECT coalesce(prio, 'UNMATCHED') AS prio_at_ts,
      |  count(*) AS n_facts,
      |  CAST(count(DISTINCT f.ck) AS BIGINT) AS n_custs
      |FROM f LEFT JOIN v ON f.ck = v.ck AND f.ts >= v.vf
      |  AND (v.vt IS NULL OR f.ts < v.vt)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q197: sentence-level text statistics -------------------------------------
  // The quality-scoring feature family one level above tokens: per
  // source, document/sentence/token counts and the tokens-per-sentence
  // ratio in exact milli units. Sentences = non-blank runs between
  // [.!?]+ enders — one regexp split per doc, all map-side; the only
  // exchange is the per-source census.
  private def q197(spark: SparkSession, sfDir: String): DataFrame = {
    val sents = size(filter(split(col("text"), "[.!?]+"),
      s => length(trim(s)) > 0)).cast("long")
    Tables.read(spark, sfDir, "documents")
      .select(col("source"), sents.as("ns"),
        TextOps.nTokens(col("text")).cast("long").as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ns")).as("n_sents"),
        sum(col("nt")).as("n_toks"))
      .select(col("source"), col("n_docs"), col("n_sents"), col("n_toks"),
        when(col("n_sents") > 0,
          expr("n_toks * 1000 div n_sents")).as("toks_per_sent_milli"))
      .orderBy("source")
  }

  private val q197Oracle: String = {
    val toks = TextOps.nTokensSql("text")
    s"""WITH d AS (SELECT source,
       |    len(list_filter(string_split_regex(text, '[.!?]+'),
       |      s -> len(trim(s)) > 0)) AS ns,
       |    $toks AS nt
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(ns) AS BIGINT) AS n_sents,
       |  CAST(sum(nt) AS BIGINT) AS n_toks,
       |  CASE WHEN sum(ns) > 0 THEN
       |    CAST(sum(nt) * 1000 // sum(ns) AS BIGINT) END
       |    AS toks_per_sent_milli
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q195_stream_quarantine", q195,
      Some(Round11Queries.q191Oracle)),
    QueryDef("q196_temporal_dim_join", q196, Some(q196Oracle)),
    QueryDef("q197_sentence_stats", q197, Some(q197Oracle)))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-6: the composed end-to-end training-data curation pipeline —
  * the artifact a data-curation user actually runs. Every stage is an
  * already-verified operator (q18/q20/q51/q58/q16/q60/q56/q66); q67
  * verifies their COMPOSITION (stage ordering, persist boundaries,
  * survivor-set threading) against one chained DuckDB oracle.
  */
object Round6Queries {

  import OracleHelpers._

  // -- q67: curate documents end-to-end -----------------------------------
  //
  //   corpus (docs + planted exact copies + planted near copies)
  //     └─ 1. exact dedup           keep min-id per identical text
  //     └─ 2. near-dup canonical    LSH pairs → clusters → quality-argmax
  //     └─ 3. quality filter        score >= 0.35 (drops ~2 deciles)
  //        + eval contamination     drop docs sharing >= 5 shingles with
  //                                 the held-out eval split (source src0)
  //     └─ 4. PII redaction         emit n_pii + fingerprint(redacted)
  //     └─ 5. seeded shuffleShard   reproducible (shard, pos) mix
  //
  // Scale shape: stages 1-3 are the bucketed shuffles of their source
  // operators (payload-free fingerprint shuffle; ONE band-key shuffle;
  // shingle-hash equi-join); stage 4 is a pure projection; stage 5 is
  // one hash shuffle + per-shard sort. The only materialization points
  // are the survivor frames reused by 2+ downstream subtrees.
  private val Seed = 42L
  private val NShards = 8
  private val QualityMin = 0.35
  private val MinSharedShingles = 5

  /** Planted-duplicate corpus: every 10th doc has an exact copy, every
    * (10k+5)th a near copy (3 appended tokens) — so stages 1 and 2 both
    * have real work. Rendered identically by both engines.
    */
  private def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    d.unionByName(d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
      .unionByName(d.where(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qq zz vv")).as("text"), col("source")))
  }

  private val corpusSql: String =
    """SELECT doc_id, text, source FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 10 = 0
      |UNION ALL
      |SELECT doc_id + 2000000, text || ' qq zz vv', source FROM documents WHERE doc_id % 10 = 5""".stripMargin

  /** Deterministic PII injection (q56's recipe, keyed on the survivor
    * id): one SQL string evaluated by BOTH engines (`expr` on the Spark
    * side), so the redaction stage has real matches to scrub.
    */
  private def dirtyPiiSql(str: String): String =
    s"""(CASE id % 4
       | WHEN 0 THEN concat(text, ' contact user', CAST(id % 50 AS $str), '@example.com now')
       | WHEN 1 THEN concat(text, ' call 555-', lpad(CAST(id % 900 AS $str), 3, '0'),
       |                    '-', lpad(CAST(id % 9000 AS $str), 4, '0'), ' today')
       | WHEN 2 THEN concat(text, ' from 10.', CAST(id % 250 AS $str),
       |                    '.0.', CAST(id % 200 AS $str))
       | ELSE text END)""".stripMargin.replaceAll("\n", " ")

  private def q67(spark: SparkSession, sfDir: String): DataFrame = {
    val train = corpus(spark, sfDir).where(col("source") =!= "src0")
      .select(col("doc_id").as("id"), col("text"))

    // 1. exact dedup — survivors carry text forward. localCheckpoint:
    // s1 feeds FOUR subtrees (LSH pairs, quality scores, the stage-2
    // anti-join, contamination shingles); without a materialization
    // boundary the dedup shuffle would re-run per subtree.
    val s1 = train
      .join(DedupOps.exactDedup(train, "id", "text").select(col("rep").as("id")),
        Seq("id"), "left_semi")
      .localCheckpoint(true)

    // 2. near-dup canonicalization: keep the quality-argmax member of
    // each LSH duplicate cluster (id tiebreak), drop the rest
    val clusters = DedupOps.dupClusters(
      DedupOps.nearDupPairs(s1, "id", "text",
        ExtQueries.MinHashes, ExtQueries.Bands, ExtQueries.JacThreshold))
    val qual = s1.select(col("id"),
      Norm.n4(TextOps.qualityScore(col("text"))).as("score"))
    val ranked = clusters
      .join(qual.withColumnRenamed("id", "member_id"), "member_id")
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_rep")
        .orderBy(col("score").desc, col("member_id").asc)))
    val s2 = s1.join(ranked.where(col("rn") > 1).select(col("member_id").as("id")),
      Seq("id"), "left_anti")

    // 3. quality floor + eval-split contamination (>= MinShared shared
    // token 3-grams with any held-out src0 doc)
    val s3q = s2.join(qual, "id").where(col("score") >= QualityMin)
      .select("id", "text")
    val evalShingles = Tables.read(spark, sfDir, "documents")
      .where(col("source") === "src0")
      .select(explode(DedupOps.shingleHashes(col("text"))).as("h"))
      .distinct()
    val contaminated = s3q
      .select(col("id"), explode(DedupOps.shingleHashes(col("text"))).as("h"))
      .join(evalShingles, Seq("h"))
      .groupBy("id").agg(count(lit(1)).as("n"))
      .where(col("n") >= MinSharedShingles)
      .select("id")
    val s3 = s3q.join(contaminated, Seq("id"), "left_anti")

    // 4. PII inject (test fixture) + redact; the fingerprint of the
    // redacted text rides into the output so the scrub is hash-verified
    val s4 = s3.withColumn("raw", expr(dirtyPiiSql("STRING")))
      .select(col("id"),
        TextOps.piiCount(col("raw")).as("n_pii"),
        TextOps.fingerprint(TextOps.redactPii(col("raw"))).as("redacted_fp"))

    // 5. reproducible mix. Materialize the (narrow, survivor-only) final
    // frame so s1's full-text checkpoint blocks can be released NOW
    // instead of living until session end (ADVICE r6) — repeated q67
    // invocations in one session no longer accumulate full-corpus blocks
    val out = MixOps.shuffleShard(s4, "id", Seed, NShards)
      .select(col("id").as("doc_id"), col("shard"), col("pos"),
        col("n_pii"), col("redacted_fp"))
      .orderBy("shard", "pos")
      .localCheckpoint(true)
    org.apache.spark.sql.graftbridge.RddBridge.unpersistCheckpoint(s1)
    out
  }

  private val q67Oracle: String = {
    val r = ExtQueries.MinHashes / ExtQueries.Bands
    s"""WITH RECURSIVE base AS ($corpusSql),
       |train AS (SELECT doc_id AS id, text FROM base WHERE source <> 'src0'),
       |s1 AS (SELECT t.id, t.text FROM train t
       |       JOIN (SELECT min(id) AS id FROM train GROUP BY text) k USING (id)),
       |hs AS (SELECT id, ${DedupOps.shingleHashesSql("text")} AS h FROM s1),
       |sigs AS (SELECT id, ${DedupOps.minhashSignatureSql("h", ExtQueries.MinHashes)} AS sig
       |         FROM hs WHERE len(h) > 0),
       |bands AS (SELECT id, unnest(${DedupOps.bandKeysSql("sig", ExtQueries.Bands, r)}) AS band FROM sigs),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
       |verified AS (SELECT id_a, id_b, ${n4(DedupOps.jaccardSql("ha.h", "hb.h"))} AS jac
       |  FROM cand JOIN hs ha ON cand.id_a = ha.id JOIN hs hb ON cand.id_b = hb.id),
       |pairs AS (SELECT id_a, id_b FROM verified WHERE jac >= ${ExtQueries.JacThreshold}),
       |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, rep) AS (
       |  SELECT DISTINCT a, a FROM sym
       |  UNION
       |  SELECT s.a, reach.rep FROM sym s JOIN reach ON s.b = reach.id),
       |clusters AS (SELECT id AS member_id, min(rep) AS cluster_rep FROM reach GROUP BY id),
       |qual AS (SELECT id, ${n4(TextOps.qualityScoreSql("text"))} AS score FROM s1),
       |ranked AS (SELECT c.member_id, row_number() OVER (PARTITION BY c.cluster_rep
       |             ORDER BY q.score DESC, c.member_id) AS rn
       |           FROM clusters c JOIN qual q ON c.member_id = q.id),
       |s2 AS (SELECT s1.id, s1.text FROM s1
       |       WHERE id NOT IN (SELECT member_id FROM ranked WHERE rn > 1)),
       |s3q AS (SELECT s2.id, s2.text FROM s2 JOIN qual USING (id)
       |        WHERE score >= CAST($QualityMin AS DOUBLE)),
       |evalh AS (SELECT DISTINCT unnest(${DedupOps.shingleHashesSql("text")}) AS h
       |          FROM documents WHERE source = 'src0'),
       |contam AS (SELECT id FROM (
       |    SELECT x.id, count(*) AS n
       |    FROM (SELECT s3q.id, unnest(hs.h) AS h FROM hs JOIN s3q USING (id)) x
       |    JOIN evalh USING (h) GROUP BY x.id)
       |  WHERE n >= $MinSharedShingles),
       |s3 AS (SELECT id, text FROM s3q WHERE id NOT IN (SELECT id FROM contam)),
       |red AS (SELECT id,
       |    CAST(${TextOps.piiCountSql("raw")} AS BIGINT) AS n_pii,
       |    ${TextOps.fingerprintSql(TextOps.redactPiiSql("raw"))} AS redacted_fp
       |  FROM (SELECT id, ${dirtyPiiSql("VARCHAR")} AS raw FROM s3)),
       |h1 AS (SELECT id, ((id % ${MixOps.P} + $Seed) * 48271) % ${MixOps.P} AS h1 FROM red),
       |sh AS (SELECT id, CAST(h1 % $NShards AS INTEGER) AS shard,
       |       ((h1 + 1) * 69621) % ${MixOps.P} AS h2 FROM h1)
       |SELECT red.id AS doc_id, sh.shard,
       |  CAST(row_number() OVER (PARTITION BY sh.shard ORDER BY sh.h2, red.id)
       |       AS INTEGER) AS pos,
       |  red.n_pii, red.redacted_fp
       |FROM red JOIN sh USING (id) ORDER BY shard, pos""".stripMargin
  }

  // -- q68: hot-band skip diagnostics as data ------------------------------
  // nearDupPairsWithStats over a corpus with a PLANTED degenerate band
  // group (26 identical texts): with the cap at 20, every band bucket
  // holding that group is skipped and must surface in the returned
  // (band, n) frame — the recall-cost observability a 100 TB dedup run
  // needs (VERDICT r5 #2: counts as data, not a log line). The oracle
  // recomputes the exact minhash band keys and sizes in SQL.
  private val HotCopies = 25
  private val HotCap = 20

  private def hotCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val doc0 = d.where(col("doc_id") === 0).select("text")
    d.select(col("doc_id").as("id"), col("text"))
      .unionByName(spark.range(HotCopies)
        .select((col("id") + 3000000L).as("id"))
        .crossJoin(doc0)) // 25 x 1 — the 1-row side broadcasts
  }

  private val hotCorpusSql: String =
    s"""SELECT doc_id AS id, text FROM documents
       |UNION ALL
       |SELECT 3000000 + i, (SELECT text FROM documents WHERE doc_id = 0)
       |FROM range($HotCopies) t(i)""".stripMargin

  private def q68(spark: SparkSession, sfDir: String): DataFrame =
    DedupOps.nearDupPairsWithStats(hotCorpus(spark, sfDir), "id", "text",
        ExtQueries.MinHashes, ExtQueries.Bands, ExtQueries.JacThreshold,
        maxBandSize = HotCap)
      .skippedBands
      .orderBy("band")

  private val q68Oracle: String = {
    val r = ExtQueries.MinHashes / ExtQueries.Bands
    s"""WITH corpus AS ($hotCorpusSql),
       |hs AS (SELECT id, ${DedupOps.shingleHashesSql("text")} AS h FROM corpus),
       |sigs AS (SELECT id, ${DedupOps.minhashSignatureSql("h", ExtQueries.MinHashes)} AS sig
       |         FROM hs WHERE len(h) > 0),
       |bands AS (SELECT id, unnest(${DedupOps.bandKeysSql("sig", ExtQueries.Bands, r)}) AS band FROM sigs)
       |SELECT band, count(*) AS n FROM bands
       |GROUP BY band HAVING count(*) > $HotCap ORDER BY band""".stripMargin
  }

  // -- q69: streaming near-duplicate suppression ---------------------------
  // The LLM-ingest shape: documents arrive as a STREAM (file source,
  // AvailableNow), every 10th doc arrives twice (planted re-crawl), and
  // dropDuplicatesWithinWatermark on the content fingerprint suppresses
  // the copies with watermark-bounded state. Streaming and batch share
  // the oracle (q47's contract): the admitted fingerprint set must equal
  // the batch DISTINCT — if a duplicate slipped through, rows differ.
  private def q69(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    // planted re-crawl: a per-row generator (explode) keeps the plant
    // inside the streaming plan (a static-union would not be streamable)
    val recrawled = stream.select(
      explode(when(col("doc_id") % 10 === 0,
          array(col("doc_id"), col("doc_id") + 1000000L))
        .otherwise(array(col("doc_id")))).as("id"),
      col("text"))
      .withColumn("ts", timestamp_micros(col("id")))
    val admitted = DedupOps.streaming.dedupByFingerprint(recrawled)
    val sink = "graft_q69_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = admitted.select("fp").writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("fp")
  }

  private val q69Oracle: String =
    s"""SELECT DISTINCT ${TextOps.fingerprintSql("text")} AS fp
       |FROM documents ORDER BY fp""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q67_curation_pipeline", q67, Some(q67Oracle)),
    QueryDef("q68_hot_band_stats", q68, Some(q68Oracle)),
    QueryDef("q69_stream_dedup", q69, Some(q69Oracle)),
  )
}

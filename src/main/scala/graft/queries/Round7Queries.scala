package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7: the remaining standard training-data curation primitives —
  * context-window chunking, token-budget sequence packing, day-2
  * incremental ingest dedup, and an exact blocklist filter with a
  * native Bloom prefilter. Each is beyond the reference surface
  * (SURVEY.md §7.5 north-star scope) with a full DuckDB oracle.
  */
object Round7Queries {

  // -- q70: overlapping context-window chunking ----------------------------
  // RAG/context prep: 200-char chunks every 150 chars (50-char overlap).
  // Pure generator projection — no shuffle; verified per (doc, chunk)
  // by index, length, and content fingerprint.
  private val ChunkSize = 200
  private val Stride = 150

  private def q70(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.charChunks(
        Tables.read(spark, sfDir, "documents"), "doc_id", "text",
        ChunkSize, Stride)
      .orderBy("doc_id", "chunk_idx")

  private val q70Oracle: String =
    s"""WITH ch AS (${TextOps.charChunksSql("documents", "doc_id", "text", ChunkSize, Stride)})
       |SELECT doc_id, chunk_idx,
       |  CAST(length(chunk) AS INTEGER) AS chunk_len,
       |  ${TextOps.fingerprintSql("chunk")} AS chunk_fp
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  // -- q71: token-budget sequence packing ----------------------------------
  // The pre-training batch layout: docs in seeded mix order, BPE token
  // counts prefix-summed per shard, stream cut every Budget tokens.
  // (doc_id, shard, pack, off) is a pure function of (id, seed) — the
  // reproducible-pack contract a trainer restart depends on.
  private val PackSeed = 7L
  private val PackShards = 4
  private val PackBudget = 512L

  private def q71(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), TextOps.nBpeTokens(col("text")).as("n_tok"))
    MixOps.packSequences(docs, "doc_id", "n_tok", PackBudget, PackSeed, PackShards)
      .select("doc_id", "shard", "pack", "off", "n_tok")
      .orderBy("shard", "pack", "off", "doc_id")
  }

  private val q71Oracle: String =
    s"""WITH toks AS (SELECT doc_id, ${TextOps.nBpeTokensSql("text")} AS n_tok
       |              FROM documents),
       |h1 AS (SELECT *, ((doc_id % ${MixOps.P} + $PackSeed) * 48271) % ${MixOps.P} AS h1
       |       FROM toks),
       |sh AS (SELECT doc_id, n_tok,
       |         CAST(h1 % $PackShards AS INTEGER) AS shard,
       |         ((h1 + 1) * 69621) % ${MixOps.P} AS h2 FROM h1),
       |cum AS (SELECT doc_id, shard, n_tok,
       |          CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard
       |            ORDER BY h2, doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |            AS strt
       |        FROM sh)
       |SELECT doc_id, shard, strt // $PackBudget AS pack, strt % $PackBudget AS "off",
       |  n_tok
       |FROM cum ORDER BY shard, pack, "off", doc_id""".stripMargin

  // -- q72: incremental (day-2) ingest dedup -------------------------------
  // Existing corpus = sources != src0; the arriving batch = src0 plus
  // planted re-crawls of corpus docs (doc_id % 7) and an in-batch
  // double-submission (doc_id % 9 of src0). Admitted = batch docs whose
  // fingerprint is new to BOTH the corpus and the earlier batch.
  private def q72(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val corpus = d.where(col("source") =!= "src0")
    val fresh = d.where(col("source") === "src0")
    val batch = fresh.select("doc_id", "text")
      .unionByName(corpus.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
      .unionByName(fresh.where(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 6000000L).as("doc_id"), col("text")))
    DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
      .orderBy("id")
  }

  private val q72Oracle: String =
    s"""WITH corpus AS (SELECT * FROM documents WHERE source <> 'src0'),
       |batch AS (
       |  SELECT doc_id, text FROM documents WHERE source = 'src0'
       |  UNION ALL
       |  SELECT doc_id + 5000000, text FROM corpus WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 6000000, text FROM documents
       |  WHERE source = 'src0' AND doc_id % 9 = 0),
       |brep AS (SELECT min(doc_id) AS id, text FROM batch GROUP BY text)
       |SELECT id, ${TextOps.fingerprintSql("text")} AS fp FROM brep
       |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = brep.text)
       |ORDER BY id""".stripMargin

  // -- q73: exact blocklist filter via native Bloom prefilter --------------
  // Blocklist = the text of every doc_id % 5 = 0 doc (a takedown
  // list). The Spark plan probes a BloomFilterAggregate-built bitmap
  // per row (no shuffle for the ~97% negatives) and text-verifies only
  // the positive sliver; the oracle states the exact text-level
  // semantics directly.
  private def q73(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    DedupOps.blocklistFilter(
        d.select("doc_id", "text"),
        d.where(col("doc_id") % 5 === 0), "doc_id", "text")
      .select("doc_id", "fp")
      .orderBy("doc_id")
  }

  private val q73Oracle: String =
    s"""WITH fps AS (SELECT doc_id, text, ${TextOps.fingerprintSql("text")} AS fp
       |             FROM documents),
       |blocked AS (SELECT DISTINCT text FROM documents WHERE doc_id % 5 = 0)
       |SELECT doc_id, fp FROM fps
       |WHERE NOT EXISTS (SELECT 1 FROM blocked b WHERE b.text = fps.text)
       |ORDER BY doc_id""".stripMargin

  // -- q74: unigram-logprob (perplexity-style) quality filter --------------
  // The corpus trains its own add-one unigram model; each doc scores
  // its mean token surprisal. One token shuffle + one doc aggregate;
  // (N, V) are driver literals. nll is n4-normalized on both engines.
  private def q74(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.unigramLogprob(
        Tables.read(spark, sfDir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tok"), Norm.n4(col("nll")).as("nll"))
      .orderBy("doc_id")

  private val q74Oracle: String =
    s"""SELECT doc_id, n_tok, ${OracleHelpers.n4("nll")} AS nll
       |FROM (${TextOps.unigramLogprobSql("documents", "doc_id", "text")}) t
       |ORDER BY doc_id""".stripMargin

  // -- q75: streaming session windows, oracle-hashed -----------------------
  // Completes the streaming portfolio's oracle coverage (q47 tumbling,
  // q69 dedup, q75 sessions): the same session_window aggregation as
  // batch q28, executed as a stream (file source, AvailableNow) into a
  // memory sink. Complete output mode emits every merged session
  // regardless of the final watermark position, so streaming == batch
  // == the gaps-and-islands oracle.
  private def q75(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val sess = EventOps.streaming.sessionize(stream)
    val sink = "graft_q75_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = sess.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("user_id", "session_start")
  }

  // -- q76: k-means over embeddings (Lloyd, deterministic) -----------------
  // The trainer for q49's IVF quantizer: 2 assignment passes / 1
  // centroid update, k = 4, everything rounded to the shared n4 grid
  // with cell-index tiebreaks so DuckDB replays the identical
  // trajectory. Assignment is map-side (centroid literals); each
  // update is one (cell, dim) aggregate.
  private def q76(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.kmeansAssign(
        Tables.read(spark, sfDir, "embeddings"), k = 4, iters = 2)
      .orderBy("vec_id")

  // -- q77: temperature-weighted source mixing -----------------------------
  // The multi-source pre-training mix: τ = 2 flattens the source
  // distribution, targeting ~30% of the corpus; membership is the
  // integer hash gate on per-source thresholds computed driver-side.
  // The oracle replays the whole rate computation step for step
  // (sorted-source weight sum, fixed parenthesization, n4 before the
  // threshold multiply).
  private val MixTau = 2.0
  private val MixSeed = 5L

  private def q77(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.temperatureSample(
        Tables.read(spark, sfDir, "documents"), "doc_id", "source",
        MixTau, targetNum = 3, targetDen = 10, seed = MixSeed)
      .select("doc_id", "source")
      .orderBy("doc_id")

  private val q77Oracle: String =
    s"""WITH counts AS (SELECT source, count(*) AS n FROM documents
       |                WHERE source IS NOT NULL GROUP BY source),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM counts),
       |w AS (SELECT source, n, pow(CAST(n AS DOUBLE) / nn, 1.0 / $MixTau) AS w
       |      FROM counts CROSS JOIN tot),
       |sw AS (SELECT list_sum(list(w ORDER BY source)) AS sumw FROM w),
       |thr AS (SELECT source,
       |  CAST(floor((floor(least(CAST(1.0 AS DOUBLE),
       |      ((nn * 3 // 10) * (w / sumw)) / n) * 10000 + 0.5) / 10000.0)
       |    * ${MixOps.P}) AS BIGINT) AS t
       |  FROM w CROSS JOIN sw CROSS JOIN tot)
       |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
       |WHERE ((((d.doc_id % ${MixOps.P} + $MixSeed) * 48271) % ${MixOps.P} + 1)
       |       * 69621) % ${MixOps.P} < thr.t
       |ORDER BY d.doc_id""".stripMargin

  // -- q78: Gopher-rule quality flags ---------------------------------------
  // Per-doc boolean audit of the five adapted Gopher rules plus the
  // conjunction; flags surface as 0/1 INTs (engine-portable hashing).
  // Pure projection — no shuffle.
  private def q78(spark: SparkSession, sfDir: String): DataFrame = {
    val f = TextOps.gopherFlags(
      Tables.read(spark, sfDir, "documents"), "doc_id", "text")
    f.select((Seq(col("doc_id"), col("n_tok")) ++
        Seq("r_ntok", "r_wlen", "r_alpha", "r_stop", "r_rep", "pass")
          .map(c => col(c).cast("int").as(c))): _*)
      .orderBy("doc_id")
  }

  private val q78Oracle: String =
    s"""SELECT doc_id, n_tok,
       |  CAST(r_ntok AS INTEGER) AS r_ntok, CAST(r_wlen AS INTEGER) AS r_wlen,
       |  CAST(r_alpha AS INTEGER) AS r_alpha, CAST(r_stop AS INTEGER) AS r_stop,
       |  CAST(r_rep AS INTEGER) AS r_rep, CAST(pass AS INTEGER) AS pass
       |FROM (${TextOps.gopherFlagsSql("documents", "doc_id", "text")}) g
       |ORDER BY doc_id""".stripMargin

  // -- q79: TF-IDF top terms per document -----------------------------------
  private val TfidfK = 3

  private def q79(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.tfidfTopTerms(
        Tables.read(spark, sfDir, "documents"), "doc_id", "text", TfidfK)
      .orderBy("doc_id", "rank")

  private val q79Oracle: String =
    s"""SELECT * FROM (${TextOps.tfidfTopTermsSql("documents", "doc_id", "text", TfidfK)}) t
       |ORDER BY doc_id, rank""".stripMargin

  // -- q80: deterministic train/val/test split ------------------------------
  // The 80/10/10 split as a pure function of (doc_id, seed): integer
  // hash-threshold membership, so a re-ingest on any engine or cluster
  // layout rebuilds the exact same eval set (no leakage drift).
  private val SplitSeed = 13L
  private val SplitFracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def q80(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.assignSplit(
        Tables.read(spark, sfDir, "documents"), "doc_id", SplitSeed, SplitFracs)
      .select("doc_id", "split")
      .orderBy("doc_id")

  private val q80Oracle: String =
    s"""SELECT doc_id,
       |  ${MixOps.assignSplitSql("doc_id", SplitSeed, SplitFracs)} AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // -- q81: BM25 keyword search top-k ---------------------------------------
  // Integer micro-score BM25 (order-independent exact sum; see
  // TextOps.bm25TopK) over four common fixture terms.
  private val Bm25Terms = Seq("hash", "join", "spark", "window")
  private val Bm25K = 20

  private def q81(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.bm25TopK(
      Tables.read(spark, sfDir, "documents"), "doc_id", "text",
      Bm25Terms, Bm25K)

  private val q81Oracle: String =
    TextOps.bm25TopKSql("documents", "doc_id", "text", Bm25Terms, Bm25K)

  // -- q82: cross-source near-dup leakage matrix ----------------------------
  // The contamination dashboard between ingest sources: near-dup pairs
  // (q20's verified MinHash-LSH pipeline) labeled with each side's
  // source and rolled up per unordered source pair. Planted recrawls
  // (every 10th doc re-ingested under source 'recrawl' with a 3-token
  // suffix) guarantee signal on the synthetic fixture, exactly like
  // q20's corpus.
  private def leakCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    d.select(col("doc_id"), col("text"), col("source"))
      .unionByName(d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qq zz vv")).as("text"),
          lit("recrawl").as("source")))
  }

  private val leakCorpusSql: String =
    """SELECT doc_id AS id, text, source FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text || ' qq zz vv', 'recrawl'
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  private def q82(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = leakCorpus(spark, sfDir)
    val pairs = DedupOps.nearDupPairs(corpus, "doc_id", "text",
      ExtQueries.MinHashes, ExtQueries.Bands, ExtQueries.JacThreshold)
    val srcs = corpus.select(col("doc_id").as("id"), col("source"))
    pairs
      .join(srcs.select(col("id").as("id_a"), col("source").as("sa")), "id_a")
      .join(srcs.select(col("id").as("id_b"), col("source").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  private val q82Oracle: String = {
    val r = ExtQueries.MinHashes / ExtQueries.Bands
    s"""WITH corpus AS ($leakCorpusSql),
       |hs AS (SELECT id, source, ${DedupOps.shingleHashesSql("text")} AS h FROM corpus),
       |sigs AS (SELECT id, h, ${DedupOps.minhashSignatureSql("h", ExtQueries.MinHashes)} AS sig
       |         FROM hs WHERE len(h) > 0),
       |bands AS (SELECT id, unnest(${DedupOps.bandKeysSql("sig", ExtQueries.Bands, r)}) AS band FROM sigs),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
       |verified AS (SELECT id_a, id_b,
       |  ${OracleHelpers.n4(DedupOps.jaccardSql("ha.h", "hb.h"))} AS jac
       |  FROM cand JOIN sigs ha ON cand.id_a = ha.id JOIN sigs hb ON cand.id_b = hb.id),
       |pairs AS (SELECT id_a, id_b FROM verified WHERE jac >= ${ExtQueries.JacThreshold}),
       |lab AS (SELECT least(sa.source, sb.source) AS src_a,
       |               greatest(sa.source, sb.source) AS src_b
       |        FROM pairs JOIN hs sa ON pairs.id_a = sa.id
       |                   JOIN hs sb ON pairs.id_b = sb.id)
       |SELECT src_a, src_b, count(*) AS n_pairs FROM lab
       |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin
  }

  // -- q83: corpus-wide top-k trigrams --------------------------------------
  // N-gram census (with multiplicity — the counting form the repeated-
  // boilerplate detectors rank on). One partial-aggregable shuffle +
  // a k-row TakeOrdered.
  private val TrigramK = 25

  private def q83(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .select(TextOps.tokens(col("text")).as("__toks")) // bind the split ONCE
      .select(explode(TextOps.ngramsOf(col("__toks"), 3)).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(TrigramK)

  private val q83Oracle: String =
    s"""SELECT trigram, count(*) AS n
       |FROM (SELECT unnest(${TextOps.ngramsSql("text", 3)}) AS trigram
       |      FROM documents) t
       |GROUP BY trigram ORDER BY n DESC, trigram LIMIT $TrigramK""".stripMargin

  // -- q84: corpus snapshot diff --------------------------------------------
  // Day-1 = documents; day-2 plants one violation per class: every 11th
  // doc dropped (removed), every 13th doc's text token-appended
  // (changed), every 17th doc re-ingested under a fresh id (added);
  // everything else unchanged. The classification is exact text
  // compare over one id-keyed full-outer join.
  private def q84(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val day2 = d.where(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
      .unionByName(d.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
    DedupOps.snapshotDiff(d, day2).orderBy("id")
  }

  private val q84Oracle: String =
    s"""WITH day2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 13 = 0 THEN text || ' edited' ELSE text END AS text
       |  FROM documents WHERE doc_id % 11 <> 0
       |  UNION ALL
       |  SELECT doc_id + 7000000, text FROM documents WHERE doc_id % 17 = 0)
       |SELECT coalesce(a.doc_id, b.doc_id) AS id,
       |  CASE WHEN a.doc_id IS NULL THEN 'added'
       |       WHEN b.doc_id IS NULL THEN 'removed'
       |       WHEN a.text IS NOT DISTINCT FROM b.text THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  ${TextOps.fingerprintSql("b.text")} AS fp
       |FROM documents a FULL OUTER JOIN day2 b ON a.doc_id = b.doc_id
       |ORDER BY id""".stripMargin

  // -- q85: per-source quota capping ("domain balancing") -------------------
  // Keep the 15 highest-quality docs per source (n4 quality grid,
  // doc-id tiebreak — a total per-group order, so the quota boundary
  // is layout-independent).
  private val QuotaN = 15

  private def q85(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        Norm.n4(TextOps.qualityScore(col("text"))).as("q4"))
    MixOps.perKeyQuota(d, "source",
        Seq(col("q4").desc, col("doc_id")), QuotaN)
      .orderBy("source", "doc_id")
  }

  private val q85Oracle: String =
    s"""WITH scored AS (SELECT doc_id, source,
       |    ${OracleHelpers.n4(TextOps.qualityScoreSql("text"))} AS q4
       |  FROM documents),
       |ranked AS (SELECT *, row_number() OVER
       |    (PARTITION BY source ORDER BY q4 DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT doc_id, source, q4 FROM ranked WHERE rk <= $QuotaN
       |ORDER BY source, doc_id""".stripMargin

  // -- q86: in-engine quality-classifier training (logistic regression) ----
  // Three full-batch GD steps from w = 0 on the q16 quality features,
  // label = (lang = 'en'), then score every doc. Integer
  // micro-gradients + n4 weights make the whole trajectory
  // bit-reproducible; the oracle unrolls it CTE by CTE.
  private def q86(spark: SparkSession, sfDir: String): DataFrame =
    TrainOps.logregScore(
        Tables.read(spark, sfDir, "documents"), "doc_id", "text",
        (col("lang") === "en").cast("int"), iters = 3, lr = 0.5)
      .orderBy("doc_id")

  private val q86Oracle: String =
    s"""SELECT * FROM (${TrainOps.logregScoreSql("documents", "doc_id", "text",
         "CASE WHEN lang = 'en' THEN 1 ELSE 0 END", iters = 3, lr = 0.5)}) t
       |ORDER BY doc_id""".stripMargin

  // -- q87: stream-static join enrichment -----------------------------------
  // The remaining core Structured Streaming shape: a stream joined to a
  // broadcast static dimension (customer segment), then window-
  // aggregated. Complete mode + AvailableNow => streaming == batch ==
  // the SQL oracle, like q47/q69/q75.
  private def q87(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Tables.eventsStream(spark, sfDir)
    val dim = Tables.read(spark, sfDir, "customer")
      .where(col("c_custkey") <= 100)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = stream
      .withColumn("ck", col("user_id") % 100 + 1)
      .join(broadcast(dim), col("ck") === col("c_custkey"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"),
        col("c_mktsegment"), col("n"))
    val sink = "graft_q87_sink"
    spark.catalog.dropTempView(sink) // re-runnable within one session
    StreamTuning.withStateParts(spark) {
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(sink).orderBy("ws", "c_mktsegment")
  }

  private val q87Oracle: String =
    """SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS ws,
      |  c_mktsegment, count(*) AS n
      |FROM events JOIN customer
      |  ON user_id % 100 + 1 = c_custkey AND c_custkey <= 100
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q88: embedding-space outlier gate ------------------------------------
  // Flag the farthest 5% of vectors within each k-means cell (distance
  // to own centroid, cluster-relative). The cut is a pure-integer rank
  // rule — no float threshold anywhere.
  private def q88(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.kmeansOutliers(
        Tables.read(spark, sfDir, "embeddings"), k = 4, iters = 2, pct = 95)
      .orderBy("vec_id")

  private val q88Oracle: String =
    SimilarityOps.kmeansOutliersSql("embeddings", 4, 2, 95)

  // -- q89: unicode text normalization --------------------------------------
  // NFC + control-strip + space-collapse + trim over a corpus with
  // planted mojibake: every 3rd doc gets a decomposed-accent suffix, a
  // BEL control, and a double space. Both engines build the identical
  // dirty literal (Spark \u escapes == DuckDB chr()), so the oracle
  // verifies the normalizer itself, not the planting.
  private val DirtySuffix = " café  double  space ß "

  private def q89(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val dirty = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(DirtySuffix))).otherwise(col("text"))
    d.select(col("doc_id"), TextOps.normalizeText(dirty).as("norm"))
      .withColumn("norm_len", length(col("norm")))
      .withColumn("norm_fp", TextOps.fingerprint(col("norm")))
      .orderBy("doc_id")
  }

  private val q89Oracle: String = {
    // the same suffix, spelled with chr() so the SQL stays ASCII-clean
    val suffix = "' cafe' || chr(769) || ' ' || chr(7) || " +
      "' double  space ' || chr(223) || ' '"
    s"""WITH dirty AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text || $suffix ELSE text END AS t
       |  FROM documents),
       |n AS (SELECT doc_id, ${TextOps.normalizeTextSql("t")} AS norm FROM dirty)
       |SELECT doc_id, norm, CAST(length(norm) AS INTEGER) AS norm_len,
       |  ${TextOps.fingerprintSql("norm")} AS norm_fp
       |FROM n ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q70_doc_chunks", q70, Some(q70Oracle)),
    QueryDef("q71_pack_sequences", q71, Some(q71Oracle)),
    QueryDef("q72_incremental_dedup", q72, Some(q72Oracle)),
    QueryDef("q73_blocklist_filter", q73, Some(q73Oracle)),
    QueryDef("q74_unigram_logprob", q74, Some(q74Oracle)),
    QueryDef("q75_stream_sessions", q75, Some(EventOps.sessionizeSql)),
    QueryDef("q76_kmeans_embed", q76,
      Some(SimilarityOps.kmeansSql("embeddings", 4, 2))),
    QueryDef("q77_temperature_mix", q77, Some(q77Oracle)),
    QueryDef("q78_gopher_rules", q78, Some(q78Oracle)),
    QueryDef("q79_tfidf_topk", q79, Some(q79Oracle)),
    QueryDef("q80_split_assign", q80, Some(q80Oracle)),
    QueryDef("q81_bm25_search", q81, Some(q81Oracle)),
    QueryDef("q82_source_leakage", q82, Some(q82Oracle)),
    QueryDef("q83_trigram_topk", q83, Some(q83Oracle)),
    QueryDef("q84_snapshot_diff", q84, Some(q84Oracle)),
    QueryDef("q85_source_quota", q85, Some(q85Oracle)),
    QueryDef("q86_logreg_quality", q86, Some(q86Oracle)),
    QueryDef("q87_stream_enrich", q87, Some(q87Oracle)),
    QueryDef("q88_embed_outliers", q88, Some(q88Oracle)),
    QueryDef("q89_normalize_text", q89, Some(q89Oracle)),
  )
}

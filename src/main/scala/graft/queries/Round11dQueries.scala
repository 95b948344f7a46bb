package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{MixOps, TextOps}

/** Round-11 fourth wave: the EXACT similarity join (prefix filtering —
  * the non-probabilistic sibling of MinHash-LSH) and exact-proportion
  * stratified splitting.
  */
object Round11dQueries {

  // -- q201: prefix-filtered exact similarity join --------------------------------
  // The PPJoin-family technique behind every EXACT set-similarity
  // join at scale: for Jaccard ≥ t, two token sets must share at
  // least one token among each set's first `n − ⌈t·n⌉ + 1` tokens
  // under ANY fixed global token order — so ordering tokens
  // rarest-first and joining only on PREFIX tokens generates a
  // candidate set that provably misses nothing while joining on the
  // least-frequent (lowest fan-out) tokens. Candidates then verify
  // with the exact integer Jaccard. Unlike q20's MinHash-LSH this has
  // NO false negatives — it is the reconciliation-grade variant.
  // t = 3/5 so the prefix bound is pure integer arithmetic
  // (⌈3n/5⌉ = (3n+4) div 5) — no IEEE ceil() divergence can shrink
  // the prefix below the theory bound on either engine.
  private def q201(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = ExtQueries.nearDupCorpus(spark, sfDir)
      .select(col("doc_id").as("id"),
        // distinct 3-gram shingle hashes as the set elements — the
        // SAME similarity space as q20's MinHash-LSH (token SETS were
        // tried first and rejected: the synthetic corpus shares so
        // much vocabulary that set-Jaccard >= 0.6 held for 83k
        // unrelated pairs, where shingle-Jaccard isolates the
        // planted near-dups)
        graft.ops.DedupOps.shingleHashes(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("id"), col("toks"), size(col("toks")).as("n"))
      .localCheckpoint(true) // freq census, prefix build, verify sets
    val toks = docs.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // global total token order: (document frequency asc, token asc) —
    // rarest-first minimizes candidate fan-out; total so both engines
    // build the identical prefix
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("tok").asc)
    // candidate generation and pair verification are compute-dense in
    // PAIRS while their exchange inputs are byte-tiny (ids + hashes) —
    // AQE's byte-based coalescing serialized both spans onto 1-2 tasks
    // (measured +2.4 s at sf0.1, round 17). Explicit repartitions pin
    // the parallelism of the two dense spans to the cluster's task
    // slots; AQE honors user-specified partition counts.
    val par = spark.sparkContext.defaultParallelism
    val prefix = toks.join(freq, "tok")
      // the per-id prefix window sorts ~|tokens| exploded rows whose
      // exchange is byte-tiny — this explicit same-key repartition IS
      // the window's required exchange (EnsureRequirements adds none on
      // top) but, being user-specified, AQE cannot coalesce it to the
      // 1-2 tasks that serialized the sort + candidate generation
      .repartition(par, col("id"))
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <= col("n") - expr("(3 * n + 4) div 5") + 1)
      .select(col("tok"), col("id"))
    val cands = prefix.select(col("tok"), col("id").as("id_a"))
      .join(prefix.select(col("tok"), col("id").as("id_b")), "tok")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      // round-robin (NOT keyed by the distinct's own keys, which
      // EnsureRequirements would swallow into its coalescible
      // exchange): the verify span intersects token arrays per pair —
      // compute-dense on byte-tiny input rows, the same AQE blind spot
      .repartition(par)
    val sets = docs.select(col("id"), col("toks"), col("n"))
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb"),
        col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("__i"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        expr("__i * 1000000 div (na + nb - __i)").as("jac_ppm"))
      .where(col("jac_ppm") >= 600000L)
      .orderBy("id_a", "id_b")
  }

  private val q201Oracle: String =
    s"""WITH corpus AS (${ExtQueries.nearDupCorpusSql}),
       |docs AS (SELECT id, ${graft.ops.DedupOps.shingleHashesSql("text")} AS toks
       |  FROM corpus),
       |d AS (SELECT id, toks, len(toks) AS n FROM docs WHERE len(toks) > 0),
       |t AS (SELECT id, n, unnest(toks) AS tok FROM d),
       |f AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
       |p AS (SELECT tok, id FROM (
       |    SELECT t.tok, t.id, t.n,
       |      row_number() OVER (PARTITION BY t.id ORDER BY f.df, t.tok) AS pos
       |    FROM t JOIN f USING (tok))
       |  WHERE pos <= n - (3 * n + 4) // 5 + 1),
       |c AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM p a JOIN p b ON a.tok = b.tok AND a.id < b.id),
       |v AS (SELECT id_a, id_b,
       |    CAST(len(list_intersect(da.toks, db.toks)) AS BIGINT) AS i,
       |    da.n AS na, db.n AS nb
       |  FROM c JOIN d da ON c.id_a = da.id JOIN d db ON c.id_b = db.id)
       |SELECT id_a, id_b,
       |  CAST(i * 1000000 // (na + nb - i) AS BIGINT) AS jac_ppm
       |FROM v WHERE i * 1000000 // (na + nb - i) >= 600000
       |ORDER BY id_a, id_b""".stripMargin

  // -- q202: exact-proportion stratified split ------------------------------------
  // q80's hash split delivers proportions in EXPECTATION — fine at
  // corpus scale, wrong for small strata (a 10-doc source can land
  // 0 validation docs). This is the exact-proportion variant: within
  // each source stratum, rows order by a seeded portable hash (the
  // shuffle) and split at exact integer rank cuts — r·10 ≤ n·8 is
  // train, ≤ n·9 val, else test. Keyed windows only (the stratum is
  // the partition key); census + realized ppm per (source, split).
  private val StratSeed = 77L

  private def q202(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        MixOps.portableHash2(col("doc_id"), StratSeed).as("h"))
    val w = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    val n = Window.partitionBy("source")
    val assigned = docs
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .withColumn("split",
        when(col("r") * 10 <= col("n") * 8, "train")
          .when(col("r") * 10 <= col("n") * 9, "val")
          .otherwise("test"))
    assigned.groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), max(col("n")).as("n_stratum"))
      .select(col("source"), col("split"), col("n_docs"),
        expr("n_docs * 1000000 div n_stratum").as("realized_ppm"))
      .orderBy("source", "split")
  }

  private val q202Oracle: String = {
    val h = s"((((doc_id % ${MixOps.P} + $StratSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH d AS (SELECT doc_id, source, $h AS h FROM documents),
       |a AS (SELECT source,
       |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS r,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM d),
       |s AS (SELECT source,
       |    CASE WHEN r * 10 <= n * 8 THEN 'train'
       |         WHEN r * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split,
       |    n
       |  FROM a)
       |SELECT source, split, count(*) AS n_docs,
       |  CAST(count(*) * 1000000 // max(n) AS BIGINT) AS realized_ppm
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q201_prefix_simjoin", q201, Some(q201Oracle)),
    QueryDef("q202_stratified_split", q202, Some(q202Oracle)))
}

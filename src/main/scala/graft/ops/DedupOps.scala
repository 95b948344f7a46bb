package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ExprBridge, RddBridge}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard, MinHash + LSH banding, SimHash.
  *
  * All signature math is EXACT int64 arithmetic on [[TextOps.tokenHash]]
  * values (every intermediate < 2^63), so the DuckDB oracle can
  * replicate signatures bit-for-bit — the LSH pipeline is verified
  * end-to-end, not just sampled.
  *
  * Scale shape (100 TB): signatures are per-row projections (codegen,
  * no shuffle); candidate generation is ONE shuffle on (band, key) —
  * the standard explode + self-join; verification joins shingle-hash
  * sets back by id (broadcast when the candidate side is small). No
  * driver-side collection anywhere.
  */
object DedupOps {

  import TextOps.{HashP, tokens, tokensSql, tokenHash, tokenHashSql}

  private val Mix = 2654435761L

  // ---- exact dedup ------------------------------------------------------

  /** Exact dedup groups as (rep = min id, n = member count), WITHOUT
    * shuffling document payloads for the common case.
    *
    * Grouping directly on `text` ships every document body through the
    * exchange; this instead (1) aggregates (fingerprint, id) — a
    * payload-free shuffle — then (2) residually re-groups WITH the
    * full text only the rows whose fingerprint group has >1 member
    * (the only place a hash collision could merge distinct texts).
    * Equal texts always share a fingerprint, so a text group never
    * spans fingerprint groups and the union is exactly
    * `groupBy(text)`. At 100 TB the duplicate fraction is what
    * re-shuffles with payload, not the corpus.
    */
  def exactDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val withFp = df.select(col(idCol).as("id"), col(textCol).as("t"),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val byFp = withFp.select("fp", "id").groupBy("fp")
      .agg(min("id").as("rep"), count(lit(1)).as("n"))
    val singles = byFp.where(col("n") === 1).select("rep", "n")
    // null-SAFE semi join: null texts have a null fingerprint, and a
    // plain equi-join would silently drop that whole group
    val multis = withFp
      .join(byFp.where(col("n") > 1).select(col("fp").as("__mfp")),
        col("fp") <=> col("__mfp"), "left_semi")
      .groupBy("fp", "t").agg(min("id").as("rep"), count(lit(1)).as("n"))
      .select("rep", "n")
    singles.unionByName(multis)
  }

  // ---- shingles ---------------------------------------------------------

  /** Distinct token k-grams as strings ("w1 w2 w3") — the set form for
    * Jaccard/MinHash ([[TextOps.ngrams]] is the with-multiplicity
    * counting form both derive from).
    */
  def shingles(textCol: Column, k: Int = 3): Column =
    array_distinct(TextOps.ngrams(textCol, k))

  def shinglesSql(e: String, k: Int = 3): String =
    s"list_distinct(${TextOps.ngramsSql(e, k)})"

  /** Distinct shingle hashes (the set MinHash/Jaccard operate on).
    * Kernel-backed ([[TextKernels.shingleHashes]] — one JVM loop
    * instead of interpreted per-shingle per-char lambdas).
    */
  def shingleHashes(textCol: Column, k: Int = 3): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass, ArrayType(LongType, containsNull = false), "shingleHashes",
      Seq(ExprBridge.expression(textCol.cast(StringType)), Literal(k)),
      Seq(StringType, IntegerType), propagateNull = true, returnNullable = true))

  def shingleHashesSql(e: String, k: Int = 3): String =
    s"list_distinct(list_transform(${shinglesSql(e, k)}, sh -> ${tokenHashSql("sh")}))"

  // ---- exact Jaccard ----------------------------------------------------

  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  def jaccardSql(a: String, b: String): String =
    s"(CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct(list_concat($a, $b))))"

  // ---- MinHash ----------------------------------------------------------

  /** Universal-hash coefficients for signature row j (exact ints < P). */
  def aCoef(j: Int): Long = (j * Mix + 1L) % HashP
  def bCoef(j: Int): Long = (j * 40503L + 17L) % HashP

  /** MinHash signature (array of numHashes longs) over a distinct
    * hash-set column. sig_j = min_h (a_j·h + b_j) mod P; a_j·h < 1e18.
    */
  def minhashSignature(hashSet: Column, numHashes: Int): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass, ArrayType(LongType, containsNull = false), "minhash",
      Seq(ExprBridge.expression(hashSet), Literal(numHashes)),
      Seq(ArrayType(LongType), IntegerType), propagateNull = true, returnNullable = true))

  def minhashSignatureSql(hashSetE: String, numHashes: Int): String = {
    val as = (0 until numHashes).map(aCoef).mkString("[", ", ", "]")
    val bs = (0 until numHashes).map(bCoef).mkString("[", ", ", "]")
    s"list_transform(range(1, $numHashes + 1), j -> " +
      s"list_min(list_transform($hashSetE, h -> ($as[j] * h + $bs[j]) % $HashP)))"
  }

  /** LSH band keys: one string key per band ("b:sig_i-sig_j-..."). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":", b.cast("string"),
        concat_ws("-", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string")))))

  def bandKeysSql(sigE: String, bands: Int, rowsPerBand: Int): String =
    s"list_transform(range(0, $bands), b -> " +
      s"CAST(b AS VARCHAR) || ':' || array_to_string(($sigE)[b*$rowsPerBand+1:b*$rowsPerBand+$rowsPerBand], '-'))"

  /** A production-reasonable `maxBandSize` (the parameter itself
    * defaults to `Int.MaxValue` = cap disabled, which is what the
    * uncapped q20 oracle verifies at test SF).
    */
  val defaultMaxBandSize: Int = 1 << 16

  /** [[nearDupPairsWithStats]] result: the verified near-dup pairs plus
    * the recall diagnostics as DATA — every band bucket the hot-band cap
    * dropped, with its member count (empty when nothing was skipped).
    * At 100 TB the skipped-band frame is what tells an operator how much
    * recall the cap cost (and which boilerplate caused it); a log line
    * can't be joined, aggregated, or alerted on.
    */
  final case class NearDupResult(pairs: DataFrame, skippedBands: DataFrame)

  /** Near-duplicate pairs via MinHash-LSH + exact-Jaccard verification.
    *
    * @param df          (id, text)
    * @param threshold   exact-Jaccard cutoff on shingle-hash sets
    * @param maxBandSize band buckets larger than this are SKIPPED with
    *                    a warning: a degenerate band (boilerplate,
    *                    empty docs) with 10^6 members would emit a
    *                    quadratic candidate set. Pairs appearing only
    *                    in a skipped band are lost — acceptable for
    *                    near-dup mining, where a hot band's cluster is
    *                    found by its other bands or is pathological
    *                    boilerplate. See [[defaultMaxBandSize]];
    *                    [[nearDupPairsWithStats]] reports what was
    *                    dropped
    * @return (id_a, id_b, jac) with id_a < id_b
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.6,
      k: Int = 3,
      maxBandSize: Int = Int.MaxValue): DataFrame =
    nearDupPairsWithStats(df, idCol, textCol, numHashes, bands, threshold,
      k, maxBandSize).pairs

  /** [[nearDupPairs]] plus the skipped-hot-band counts as a queryable
    * `(band, n)` DataFrame (see [[NearDupResult]]).
    */
  def nearDupPairsWithStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.6,
      k: Int = 3,
      maxBandSize: Int = Int.MaxValue): NearDupResult = {
    val r = numHashes / bands
    // MEMORY_AND_DISK + LRU eviction: the shingle sets are read twice
    // (band generation + verification join); callers consume the result
    // eagerly, after which the block is evictable
    val withSets = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), k).as("hs"))
      .where(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBands = withSets
      .withColumn("sig", minhashSignature(col("hs"), numHashes))
      .select(col("id"), explode(bandKeys(col("sig"), bands, r)).as("band"))
    // hot-band cap: drop oversized buckets before the quadratic
    // self-join (see defaultMaxBandSize)
    val (bandsDf, skipped) =
      if (maxBandSize == Int.MaxValue) {
        // empty frame derived from the SAME aggregate expression as the
        // capped branch, so the two can never drift in schema/nullability;
        // Filter(false) folds to an empty LocalRelation — zero execution
        val none = allBands.groupBy("band").agg(count(lit(1)).as("n"))
          .where(lit(false))
        (allBands, none)
      } else {
        // checkpoint: the hot-band aggregate feeds the warning probe,
        // the anti-join, AND the returned skipped-band frame — without
        // it the full band count over allBands would run per consumer
        val hot = allBands.groupBy("band").agg(count(lit(1)).as("n"))
          .where(col("n") > maxBandSize)
          .localCheckpoint(true)
        val hotRows = hot.limit(20).collect()
        if (hotRows.nonEmpty) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"nearDupPairs: skipping ${hotRows.length}+ bands over " +
              s"$maxBandSize members, e.g. " +
              hotRows.take(3).map(r => s"${r.get(0)}(n=${r.getLong(1)})")
                .mkString(", "))
        }
        (allBands.join(hot.select("band"), Seq("band"), "left_anti"), hot)
      }
    // ONE shuffle on the band key; candidates reduced to DISTINCT id
    // pairs BEFORE the (expensive) set-jaccard join, so a pair colliding
    // in several bands is verified once
    val cand = bandsDf.select(col("band"), col("id").as("id_a"))
      .join(bandsDf.select(col("band"), col("id").as("id_b")), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val out = cand
      .join(withSets.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(withSets.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Norm.n4OfJaccard(col("hs_a"), col("hs_b")).as("jac"))
      .where(col("jac") >= threshold)
    // Materialize the (small) verified-pair set while the shingle cache
    // is hot, then release it — otherwise the cache outlives the call
    // and accumulates across repeated invocations in one session.
    val checkpointed = out.localCheckpoint(true)
    withSets.unpersist()
    NearDupResult(checkpointed, skipped)
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components by
    * synchronous min-label propagation — every member labeled with the
    * smallest id reachable through the pair graph.
    *
    * Scale shape: each iteration is one edge join + one aggregate (both
    * partial/final combinable) plus a pointer-doubling shortcut
    * (`rep := rep(rep)` — valid because reachability composes, so the
    * label set stays within the component and is monotone), giving
    * O(log diameter) convergence; the label frame is
    * `localCheckpoint`ed so lineage stays flat across iterations (the
    * classic iterative-DataFrame trap). `maxIters` (default 30 ≈
    * diameter 2^30) is a safety valve: exceeding it THROWS rather than
    * silently returning partially-merged clusters.
    * Output: (member_id, cluster_rep) for every id appearing in a pair
    * (singletons never enter the pair graph).
    */
  def dupClusters(pairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 30): DataFrame = {
    val edges = pairs.select(col(idA).as("a"), col(idB).as("b"))
    val sym = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(true)
    var changed = true
    var iters = 0
    while (changed && iters < maxIters) {
      val nbr = sym
        .join(labels.select(col("id").as("b"), col("rep").as("brep")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min("brep").as("nmin"))
      // LAZY checkpoints: both frames are marked, and the single
      // convergence-probe action below materializes them — one Spark
      // job per iteration instead of three. prop must be checkpointed
      // because it feeds BOTH sides of the doubling self-join —
      // otherwise the edge join + aggregate evaluates twice per
      // iteration.
      val prop = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nmin"), col("rep"))).as("rep"),
          (col("nmin") < col("rep")).as("__chg"))
        .localCheckpoint(false)
      // pointer doubling: follow the label one extra hop (rep(rep) <=
      // rep always, since a node's own label only ever decreases)
      val next = prop
        .join(prop.select(col("id").as("rep"), col("rep").as("__rrep")),
          Seq("rep"), "left")
        .select(col("id"),
          coalesce(col("__rrep"), col("rep")).as("rep"),
          (col("__chg") || col("__rrep") < col("rep")).as("__chg"))
        .localCheckpoint(false)
      changed = next.where(col("__chg")).limit(1).count() > 0
      // the probe action above finalized next's checkpoint, so the
      // previous labels and prop blocks are dead — release them now
      // instead of waiting for a driver GC (O(1) block debt)
      RddBridge.unpersistCheckpoint(prop)
      RddBridge.unpersistCheckpoint(labels)
      labels = next.drop("__chg")
      iters += 1
    }
    if (changed) {
      // `changed` only says the LAST iteration wrote something — the
      // labels may have converged exactly on the wire. One extra probe
      // distinguishes that from a genuinely unfinished propagation.
      val probe = sym
        .join(labels.select(col("id").as("b"), col("rep").as("brep")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min("brep").as("nmin"))
      val unfinished = labels.join(probe, Seq("id"), "left")
        .where(col("nmin") < col("rep")).limit(1).count() > 0
      if (unfinished)
        throw new IllegalStateException(
          s"dupClusters: not converged after $iters iterations " +
            "(raise maxIters; the pair graph is deeper than 2^maxIters)")
    }
    labels.select(col("id").as("member_id"), col("rep").as("cluster_rep"))
  }

  private object Norm {
    def n4OfJaccard(a: Column, b: Column): Column =
      floor(jaccard(a, b) * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)
  }

  // ---- incremental (day-2) dedup ----------------------------------------

  /** Admit only the new-batch documents whose TEXT is unseen — in the
    * existing corpus AND earlier in the batch (min-id representative
    * within the batch, matching [[exactDedup]]'s keep-first contract).
    * This is the day-2 ingest shape: the corpus is re-scanned but never
    * re-deduplicated, and — like [[exactDedup]] — fingerprint equality
    * is only a CANDIDATE signal, verified by exact text compare (the
    * position-weighted hash is linear in code points, so structured
    * near-anagram tokens like "11"/"30" genuinely collide).
    *
    * Scale shape: the batch (the day-2 increment, small next to the
    * corpus) pays the only payload shuffle (its in-batch text
    * dedup). The corpus side is a fingerprint-column scan filtered
    * map-side against the broadcast batch fingerprint set — only
    * fp-colliding corpus rows (true duplicates + rare hash collisions)
    * surface, and only THEY carry text into the verify join.
    */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val brep = batch.select(col(idCol).as("id"), col(textCol).as("t"))
      .groupBy("t").agg(min("id").as("id"))
      .select(col("id"), col("t"), TextOps.fingerprint(col("t")).as("fp"))
    val batchFps = brep.select("fp").distinct()
    val corpusHits = corpus
      .select(TextOps.fingerprint(col(textCol)).as("fp"),
        col(textCol).as("__ct"))
      .join(broadcast(batchFps), Seq("fp"), "left_semi")
    brep.join(corpusHits, brep("t") === corpusHits("__ct"), "left_anti")
      .select(col("id"), col("fp"))
  }

  // ---- snapshot diff -----------------------------------------------------

  /** Corpus snapshot diff: classify every doc id across two ingest
    * snapshots as `added` / `removed` / `changed` / `unchanged` — the
    * audit artifact a re-crawl pipeline publishes with each drop (and
    * the input to an incremental re-embedding job, which re-processes
    * only `added`+`changed`). Classification compares TEXT, not
    * fingerprints: an exact diff can't delegate to a lossy hash (the
    * position-weighted fingerprint demonstrably collides on
    * structured near-anagrams), and the id-keyed join already
    * co-locates both texts, so the exact compare is free.
    *
    * Scale shape: ONE full-outer hash join keyed on the id. Unlike
    * dedup (where the hash-first trick keeps payload off the wire),
    * a content diff must move content — the 100 TB lever is storing
    * both snapshots bucketed by id so the join plans exchange-free
    * (see the bucketed-join PlanSpec proof), plus AQE for re-crawl
    * skew. Output: (id, status, fp) with fp = the CURRENT text's
    * fingerprint (null for `removed`), ready to feed
    * [[incrementalDedup]]-style downstream stages.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // presence markers, not text nullity: a doc row with a NULL text is
    // still PRESENT in its snapshot (and a null-vs-null text compare is
    // `unchanged`, via the null-safe equality)
    val a = prev.select(col(idCol).as("id"), col(textCol).as("__t_prev"),
      lit(true).as("__in_prev"))
    val b = cur.select(col(idCol).as("id"), col(textCol).as("__t_cur"),
      TextOps.fingerprint(col(textCol)).as("fp"), lit(true).as("__in_cur"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_cur").isNull, lit("removed"))
          .when(col("__t_prev") <=> col("__t_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("fp"))
  }

  // ---- blocklist filter (Bloom prefilter + exact verify) -----------------

  /** Remove every document whose TEXT appears in a blocklist
    * (takedowns, opt-outs, eval-set blacklists), EXACTLY, without
    * shuffling the corpus: a Bloom filter over the blocklist
    * fingerprints is built with Spark's native `BloomFilterAggregate`
    * (one aggregate job over the small side), inlined as a literal, and
    * probed per-row with the codegen'd `BloomFilterMightContain` — the
    * same expression pair Spark's own runtime row-level filtering
    * injects. Bloom-negative rows (the overwhelming majority) are
    * admitted with ZERO shuffle; only the positive sliver — true
    * matches, Bloom false positives (rate `fpp`), and genuine
    * fingerprint collisions — pays an exact TEXT anti join against the
    * blocklist, so the result is exact regardless of `fpp` and of hash
    * collisions (fingerprint equality is a candidate signal, never the
    * verdict — same policy as [[exactDedup]]/[[incrementalDedup]]).
    *
    * Scale shape: a 100 M-entry blocklist at 3% fpp is a ~90 MB bitmap
    * — broadcastable; the corpus-side cost is one codegen'd probe per
    * row, and the verify join shuffles ~fpp of the corpus instead of
    * all of it.
    */
  def blocklistFilter(corpus: DataFrame, blocklist: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bfps = blocklist
      .select(TextOps.fingerprint(col(textCol)).as("fp"))
      .where(col("fp").isNotNull)
    val nItems = math.max(bfps.count(), 1L)
    // optimal bit count for the target fpp: -n·ln(p)/ln(2)^2
    val nBits = math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomAgg = ExprBridge.column(
      new BloomFilterAggregate(
        ExprBridge.expression(xxhash64(col("fp"))),
        Literal(nItems), Literal(nBits)).toAggregateExpression())
    val bloomBin = bfps.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val withFp = corpus.withColumn("fp", TextOps.fingerprint(col(textCol)))
    val might = ExprBridge.column(BloomFilterMightContain(
      ExprBridge.expression(lit(bloomBin)),
      ExprBridge.expression(xxhash64(col("fp")))))
    val negatives = withFp.where(col("fp").isNull || !might)
    val blTexts = blocklist.select(col(textCol).as("__bl_t"))
      .where(col("__bl_t").isNotNull).distinct()
    val candidates = withFp.where(col("fp").isNotNull && might)
      .join(blTexts, col(textCol) === col("__bl_t"), "left_anti")
    negatives.unionByName(candidates)
  }

  // ---- streaming ---------------------------------------------------------

  /** Streaming variants — the LLM-ingest shape: suppress duplicate
    * documents as they ARRIVE, keyed on the content fingerprint, with
    * watermark-bounded state.
    */
  object streaming {

    /** Drop documents whose [[TextOps.fingerprint]] was already seen
      * within the watermark horizon (`dropDuplicatesWithinWatermark`,
      * so the dedup state is evicted once the watermark passes — the
      * property that keeps state bounded on an unbounded stream; a
      * plain `dropDuplicates(fp)` would grow state forever).
      *
      * Exactly-once within the horizon: a re-crawled page arriving
      * inside `watermark` of its first sighting is suppressed; one
      * arriving later is admitted again (acceptable for ingest dedup,
      * where a global exact pass — [[exactDedup]] — runs downstream).
      */
    def dedupByFingerprint(docs: DataFrame, textCol: String = "text",
        tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
      docs.withColumn("fp", TextOps.fingerprint(col(textCol)))
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("fp")
  }

  // ---- SimHash ----------------------------------------------------------

  /** Token hashes with multiplicity, kernel-backed. */
  def tokenHashes(textCol: Column): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass, ArrayType(LongType, containsNull = false), "tokenHashes",
      Seq(ExprBridge.expression(textCol.cast(StringType))), Seq(StringType),
      propagateNull = true, returnNullable = true))

  /** 32-bit SimHash over token hashes WITH multiplicity (term weight =
    * term frequency); bit b is set when the signed bit-count is > 0.
    * Kernel-backed ([[TextKernels.simhash32]] — the HOF formulation
    * re-evaluated the token hashes once per bit branch and ran 30+ s
    * on 5k docs; the kernel is a single two-level loop).
    */
  def simhash32(textCol: Column): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass, LongType, "simhash32",
      Seq(ExprBridge.expression(textCol.cast(StringType))), Seq(StringType),
      propagateNull = true, returnNullable = true))

  /** SimHash near-duplicate pairs within hamming distance `maxDist`
    * over the 32-bit signature, found WITHOUT an all-pairs scan: the
    * signature splits into `maxDist + 1` chunks, and by pigeonhole any
    * pair within distance `maxDist` agrees on at least one chunk —
    * candidates are chunk-bucket collisions (ONE shuffle on the chunk
    * key), verified with an exact popcount on the XOR. Same bucketed
    * scale shape as the MinHash path.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    // Only maxDist >= 32 is degenerate (0-bit chunks -> ONE global
    // bucket, a quadratic all-pairs blowup). When maxDist + 1 doesn't
    // divide 32 the top 32 % (maxDist+1) bits fall outside every chunk:
    // recall still holds by pigeonhole (uncovered-bit diffs only add
    // candidates, which the exact popcount verify rejects), buckets
    // are just coarser. Divisors (0, 1, 3, 7, 15, 31) bucket tightest.
    require(maxDist >= 0 && maxDist < 32,
      s"simhashNearDups: maxDist must be in [0, 31] (got $maxDist); " +
        "values where maxDist + 1 divides 32 give the tightest buckets")
    val nChunks = maxDist + 1
    val bits = 32 / nChunks
    // TWO-LEVEL pigeonhole (round 15): on shared-vocabulary corpora the
    // signatures CLUSTER, so a single bits-wide bucket goes quadratic —
    // one 8-bit bucket held 17k docs at 10x density (290M candidate
    // pairs, 54 s). Alongside the clean chunk, a pair within maxDist
    // also has a clean subBits-wide piece among the nChunks pieces of
    // the LOW nChunks*subBits bits (its <= maxDist diffs cannot dirty
    // all of them) — and the two clean indices exist INDEPENDENTLY, so
    // the join key extends to (c, v, c2, v2) with an nChunks^2-way
    // explode that splits every hot bucket by bits the first level
    // ignored. The fixed sub-chunk layout (not remainder-of-c) keeps
    // the canonical filter below one CASE per level — a per-branch
    // remainder rebuild ran 2x slower than the dedup shuffle it
    // replaced. subBits = 0 (maxDist >= 16) degenerates to
    // single-level banding.
    val subBits = (32 - bits) / nChunks
    val sigs = df.select(col(idCol).as("id"), simhash32(col(textCol)).as("sh"))
    val subIdx = if (subBits == 0) Seq(0) else 0 until nChunks
    val keys = for (c <- 0 until nChunks; c2 <- subIdx)
      yield struct(lit(c).as("c"),
        shiftright(col("sh"), c * bits).bitwiseAND(lit((1L << bits) - 1)).as("v"),
        lit(c2).as("c2"),
        (if (subBits == 0) lit(0L)
         else shiftright(col("sh"), c2 * subBits)
           .bitwiseAND(lit((1L << subBits) - 1))).as("v2"))
    val chunks = sigs.select(col("id"), col("sh"),
      explode(array(keys: _*)).as("ck"))
      .select(col("id"), col("sh"), col("ck.c").as("c"), col("ck.v").as("v"),
        col("ck.c2").as("c2"), col("ck.v2").as("v2"))
    // CANONICAL-KEY emission instead of a dedup shuffle: a pair that
    // agrees on k of the nChunks^2 keys would surface k times (a
    // dist-0 pair: ALL of them — and on a templated corpus the
    // duplicated TRUE pairs, not the junk, dominate the candidate
    // stream: 67M of 84M rows at 10x). Which keys agree is a pure
    // function of x = sh_a XOR sh_b: each row keeps the pair only at
    // (first clean chunk of x, first clean sub-chunk of x) — exact
    // multiplicity 1 from two nested-CASE values evaluated once per
    // row inside the join's codegen stage; dropDuplicates (and its
    // 67M-row shuffle) disappears outright.
    def firstClean(x: Column, width: Int, n: Int): Column =
      (n - 2 to 0 by -1).foldLeft(lit(n - 1)) { (acc, i) =>
        when(shiftright(x, i * width)
          .bitwiseAND(lit((1L << width) - 1)) === 0, lit(i))
          .otherwise(acc)
      }
    val xorCol = col("sh_a").bitwiseXOR(col("sh_b"))
    val canonical = col("c") === firstClean(xorCol, bits, nChunks) &&
      (if (subBits == 0) lit(true)
       else col("c2") === firstClean(xorCol, subBits, nChunks))
    // shuffle_hash, not broadcast: Catalyst broadcasts the chunk table
    // (its parquet-stat estimate stays under the threshold) and the
    // single driver-built hashed relation probes at ~3M rows/s — the
    // per-partition hash build is 13-20x faster on the 106M-row
    // candidate stream (measured 32.0 s vs 2.5 s at 10x), and it
    // scales with executors where a broadcast cannot
    chunks.select(col("c"), col("v"), col("c2"), col("v2"),
        col("id").as("id_a"), col("sh").as("sh_a"))
      .join(chunks.select(col("c"), col("v"), col("c2"), col("v2"),
        col("id").as("id_b"), col("sh").as("sh_b")).hint("shuffle_hash"),
        Seq("c", "v", "c2", "v2"))
      .where(col("id_a") < col("id_b") && canonical)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("dist"))
      .where(col("dist") <= maxDist)
  }

  def simhash32Sql(e: String): String = {
    val th = s"list_transform(${tokensSql(e)}, t -> ${tokenHashSql("t")})"
    s"(list_transform([$th], hs -> CAST(list_sum(list_transform(range(0, 32), b -> " +
      s"CASE WHEN list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT))[1])"
  }

  /** Hamming distance between two simhash values. */
  // ---- substring-granular dedup (repeated k-gram spans) ------------------

  /** Element i = hash of the k-gram starting at token i (0-based),
    * WITH multiplicity — kernel-backed positional form of
    * [[shingleHashes]] (which is the distinct-set form for Jaccard).
    */
  def shingleHashSeq(textCol: Column, k: Int): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass, ArrayType(LongType, containsNull = false), "shingleHashSeq",
      Seq(ExprBridge.expression(textCol.cast(StringType)), Literal(k)),
      Seq(StringType, IntegerType), propagateNull = true, returnNullable = true))

  def shingleHashSeqSql(e: String, k: Int): String =
    s"list_transform(${TextOps.ngramsSql(e, k)}, g -> ${tokenHashSql("g")})"

  /** Substring-granular dedup: the repeated-k-gram spans of each
    * document (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — arXiv:2107.06499 — at k-gram rather
    * than suffix-array granularity). A k-gram is HOT when it occurs
    * ≥ `minRepeats` times across the whole corpus (including within
    * one document); per document, runs of hot k-gram positions whose
    * starts are ≤ k apart merge into one span. Returns
    * (id, span_start, span_end, span_tokens, n_grams) with 0-based
    * inclusive token indices — spans as DATA, so the caller chooses
    * cut/drop/weight (and `array_join(slice(tokens, …), ' ')`
    * reconstructs the substring to cut).
    *
    * Scale shape — two corpus passes, NEVER all-pairs (the suffix
    * array of the reference algorithm is a single-machine structure;
    * the k-gram census is its shuffle-native projection):
    *  1. census: groupBy(gram-hash) count — partial-aggregable, so
    *     the shuffle carries one row per (partition, distinct gram),
    *     and a pathologically hot gram combines map-side instead of
    *     skewing a window partition;
    *  2. mark: shuffle-join positions against the hot set on the
    *     8-byte hash (ids-only: no text payload moves), then a
    *     per-document window merges positions into spans — bounded
    *     by each doc's own gram count, no single-partition window.
    */
  def repeatedKgramSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minRepeats: Long): DataFrame = {
    require(k >= 1 && minRepeats >= 2,
      s"need k >= 1 and minRepeats >= 2: k=$k minRepeats=$minRepeats")
    def grams = df.select(col(idCol),
        posexplode(shingleHashSeq(col(textCol), k)).as(Seq("pos", "gh")))
    val hot = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= minRepeats)
      .select(col("gh"))
    val dup = grams.join(hot, Seq("gh")).select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    // span break iff the gap to the previous hot start exceeds k
    // (> k means ≥ one clean token between the two grams' coverage);
    // lag = NULL on the first row → comparison NULL → break
    val brk = when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0)
      .otherwise(1)
    val islands = dup.withColumn("__brk", brk)
      .withColumn("__island", sum(col("__brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + (k - 1)).cast(LongType).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_grams"))
  }

  /** [[repeatedKgramSpans]] oracle rendering. `docsRel` is a table
    * name or CTE name yielding (idCol, textCol); prepend extra CTEs
    * via `extraCtes` (margin-free, per the stripMargin embedding
    * rule).
    */
  def repeatedKgramSpansSql(docsRel: String, idCol: String, textCol: String,
      k: Int, minRepeats: Long, extraCtes: String = ""): String = {
    val pre = if (extraCtes.isEmpty) "" else extraCtes + ",\n"
    val tok = tokensSql(textCol)
    val gram = s"array_to_string(tok[i:i+${k - 1}], ' ')"
    s"""WITH ${pre}__toks AS (SELECT $idCol, $tok AS tok FROM $docsRel),
       |__gu AS (SELECT $idCol, unnest(list_transform(
       |      range(1, greatest(len(tok) - ${k - 1}, 0) + 1),
       |      i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
       |        gh := ${tokenHashSql(gram)}))) AS u
       |  FROM __toks),
       |__g AS (SELECT $idCol, (u).pos AS pos, (u).gh AS gh FROM __gu),
       |__hot AS (SELECT gh FROM __g GROUP BY gh
       |  HAVING count(*) >= $minRepeats),
       |__dup AS (SELECT g.$idCol, g.pos FROM __g g
       |  WHERE EXISTS (SELECT 1 FROM __hot h WHERE h.gh = g.gh)),
       |__f AS (SELECT $idCol, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY $idCol ORDER BY pos)
       |      <= $k THEN 0 ELSE 1 END AS brk
       |  FROM __dup),
       |__s AS (SELECT $idCol, pos,
       |    sum(brk) OVER (PARTITION BY $idCol ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM __f)
       |SELECT $idCol, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + ${k - 1} AS BIGINT) AS span_end,
       |  CAST(max(pos) + ${k - 1} - min(pos) + 1 AS BIGINT) AS span_tokens,
       |  count(*) AS n_grams
       |FROM __s GROUP BY $idCol, island""".stripMargin
  }

  def hamming32(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  def hamming32Sql(a: String, b: String): String = s"bit_count(xor($a, $b))"
}

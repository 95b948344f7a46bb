package graft.queries

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Physical-plan regression guards for the scale-critical properties
  * (SURVEY.md §4): filter/column pushdown to parquet, broadcast joins
  * for dimension enrichment, per-partition top-k (WindowGroupLimit)
  * under row_number windows. If a refactor silently turns a broadcast
  * join into a SortMergeJoin or un-prunes a scan, these fail.
  */
class PlanSpec extends EtlSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("parquet scans carry pushed filters and pruned schemas") {
    val plan = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("q30 dimension joins broadcast (never SortMergeJoin)") {
    val plan = planOf("q30_join_enrich")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q31/q22 top-k pushes WindowGroupLimit below the shuffle") {
    assert(planOf("q31_topk_window").contains("WindowGroupLimit"))
    assert(planOf("q22_cosine_topk").contains("WindowGroupLimit"))
  }

  test("q29 aggregate is partial+final (map-side combine)") {
    val plan = planOf("q29_tpch_q1")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"))
  }

  test("q18 exactDedup: the main dedup shuffle keys on the fingerprint alone") {
    // hash-first dedup: the first-pass aggregate groups on fp only, so
    // its exchange ships (fp, partial min, partial count) — never the
    // document text. The residual regroup (fp, t) exchange exists too,
    // but only multi-member groups reach it.
    val plan = planOf("q18_dedup_docs")
    val fpOnly = "Exchange hashpartitioning\\(fp#\\d+L?, \\d+\\)".r
    assert(fpOnly.findFirstIn(plan).isDefined,
      s"expected a fingerprint-only exchange:\n$plan")
  }

  test("VectorKernels expressions stay inside whole-stage codegen") {
    val emb = Tables.read(spark, sf, "embeddings")
    val df = emb.select(graft.ops.SimilarityOps.cosine(
      graft.ops.SimilarityOps.asDouble(col("embedding")),
      graft.ops.SimilarityOps.asDouble(reverse(col("embedding")))).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan) // WholeStageCodegen span marker
    assert(plan.contains("static_invoke(graft.ops.VectorKernels.cosine"), plan)
  }

  test("Imputer.modes plans with no Window operator") {
    val probe = graft.etl.Imputer.modesFrame(
      Tables.read(spark, sf, "orders"), Seq("o_orderstatus", "o_orderpriority"))
      .queryExecution.executedPlan.toString
    assert(!probe.contains("Window"), probe)
    assert(probe.contains("partial_min") || probe.contains("partial_count"), probe)
  }

  test("q57 stratified-sample filter evaluates scan-side (no shuffle, no Window)") {
    val plan = planOf("q57_stratified_sample")
    assert(!plan.contains("Exchange hashpartitioning"), plan) // pure filter projection
    assert(!plan.contains("Window"), plan)
  }

  test("q60 contamination joins on the hash only — no cartesian, no text shuffle") {
    val plan = planOf("q60_contamination")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val hashKey = "Exchange hashpartitioning\\(h#\\d+L?, \\d+\\)".r
    assert(hashKey.findFirstIn(plan).isDefined ||
      plan.contains("BroadcastHashJoin"), s"expected a hash-keyed join:\n$plan")
  }

  test("q62 sketch/exact split plans with no Expand and at most two lineitem scans") {
    val plan = planOf("q62_approx_distinct")
    assert(!plan.contains("Expand"), plan)
    // VERDICT r8: the old per-column subtrees scanned lineitem six
    // times; the collapsed shape is one sketch pass + one explode/dedup
    // pass. At 100 TB each extra scan is a full job of wasted I/O.
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected <=2 lineitem scans, got $scans:\n$plan")
  }

  test("q56 PII redaction stays inside whole-stage codegen") {
    val df = Tables.read(spark, sf, "documents")
      .select(graft.ops.TextOps.redactPii(col("text")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    // the 100 TB recipe for repeated fact-fact joins: bucket both sides
    // on the join key at write time; the join then needs no Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      graft.etl.Io.writeBucketed(spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 8)
      graft.etl.Io.writeBucketed(spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice"), "ord_b", "o_orderkey", 8)
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect() // force planning + execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("charChunks plans as a pure generator projection: no Exchange") {
    val plan = graft.ops.TextOps.charChunks(
        Tables.read(spark, sf, "documents"), "doc_id", "text", 200, 150)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), plan)
  }

  test("packSequences plans ONE hash shuffle on shard (no global window, no range sort)") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, 40L + i % 60)).toDF("doc_id", "n_tok")
    val plan = graft.ops.MixOps.packSequences(docs, "doc_id", "n_tok", 512L, 7L, 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shard shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("incrementalDedup filters the corpus map-side (broadcast semi join, corpus never hash-shuffled)") {
    val d = Tables.read(spark, sf, "documents")
    val plan = graft.ops.DedupOps.incrementalDedup(
        d.where(col("source") === "src0"), d.where(col("source") =!= "src0"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"corpus-side fingerprint filter must broadcast:\n$plan")
  }

  test("blocklistFilter probes the native bloom expression; negatives branch has no Exchange") {
    val d = Tables.read(spark, sf, "documents")
    val out = graft.ops.DedupOps.blocklistFilter(d, d.where(col("doc_id") % 5 === 0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected BloomFilterMightContain probe:\n$plan")
    // the CORPUS must never hash-shuffle; the only allowed exchange is
    // the (small) blocklist side's own distinct before its broadcast
    val exchanged = "Exchange hashpartitioning\\(([^,#]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchanged.subsetOf(Set("__bl_t")),
      s"corpus-side shuffle detected (exchanges on $exchanged):\n$plan")
  }

  test("kmeansAssign assignment pass is map-side only (centroid literals, no Exchange)") {
    val plan = graft.ops.SimilarityOps.kmeansAssign(
        Tables.read(spark, sf, "embeddings"), k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle the corpus:\n$plan")
    assert(plan.contains("static_invoke(graft.ops.VectorKernels.dot"), plan)
  }

  test("gopherFlags and assignSplit plan as pure map-side projections: no Exchange") {
    val d = Tables.read(spark, sf, "documents")
    val flags = graft.ops.TextOps.gopherFlags(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!flags.contains("Exchange"), s"rule flags must not shuffle:\n$flags")
    val split = graft.ops.MixOps.assignSplit(d, "doc_id", 13L,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .queryExecution.executedPlan.toString
    assert(!split.contains("Exchange"), s"split assignment must not shuffle:\n$split")
    assert(split.contains("*("), split) // stays inside whole-stage codegen
  }

  test("tfidfTopTerms pushes the per-doc top-k below the shuffle (WindowGroupLimit)") {
    val plan = graft.ops.TextOps.tfidfTopTerms(
        Tables.read(spark, sf, "documents"), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rank must prune pre-shuffle:\n$plan")
  }

  test("bm25TopK: k-row TakeOrdered (no global sort), term filter before the postings exchange") {
    val df = graft.ops.TextOps.bm25TopK(
      Tables.read(spark, sf, "documents"), "doc_id", "text",
      Seq("hash", "join", "spark", "window"), 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    // the IN(terms) filter must run map-side so only matching postings
    // shuffle: an explicit Filter node carrying the term literals has to
    // exist (if it were folded into a post-aggregate HAVING the whole
    // vocabulary would cross the wire first)
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("hash") && l.contains("spark")),
      s"term IN-filter must appear as a map-side Filter:\n$plan")
  }

  test("q83 trigram census: partial+final aggregate and a k-row TakeOrdered") {
    val plan = planOf("q83_trigram_topk")
    assert(plan.contains("partial_count") || plan.contains("partial_"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("perKeyQuota rank prunes per-partition (WindowGroupLimit); snapshotDiff is one id-keyed full-outer join") {
    val d = Tables.read(spark, sf, "documents")
    val quota = graft.ops.MixOps.perKeyQuota(d, "source",
        Seq(col("doc_id")), 10)
      .queryExecution.executedPlan.toString
    assert(quota.contains("WindowGroupLimit"),
      s"a giant domain must never materialize its tail:\n$quota")
    val diff = graft.ops.DedupOps.snapshotDiff(
        d.where(col("doc_id") % 2 === 0), d)
      .queryExecution.executedPlan.toString
    assert(diff.contains("FullOuter"), diff)
    assert(!diff.contains("CartesianProduct") &&
      !diff.contains("BroadcastNestedLoopJoin"), diff)
  }

  test("logregScore gradient step never hash-shuffles the corpus (map-side partial sums only)") {
    // each GD step must be one aggregate job: partial sums map-side, a
    // single-partition final — a hashpartitioning exchange would mean
    // the feature frame is being re-keyed per iteration
    val d = Tables.read(spark, sf, "documents")
    val out = graft.ops.TrainOps.logregScore(d, "doc_id", "text",
      (col("lang") === "en").cast("int"), iters = 1)
    // the returned frame is checkpointed; plan-check the live gradient
    // aggregate shape instead on an equivalent probe
    val probe = d.select((col("lang") === "en").cast("int").cast("double").as("y"),
        graft.ops.TextOps.nTokens(col("text")).cast("double").as("x1"))
      .agg(sum(floor((col("y") - col("x1")) * lit(1e6) + lit(0.5)).cast("long")))
      .queryExecution.executedPlan.toString
    assert(!probe.contains("Exchange hashpartitioning"), probe)
    assert(probe.contains("partial_sum"), probe)
    assert(out.count() > 0)
  }

  test("readJdbc pushes filters into the JDBC relation (not a post-scan Filter)") {
    import graft.etl.Io
    import spark.implicits._
    val db = "graft_planspec_jdbc"
    val url = s"jdbc:derby:memory:$db;create=true"
    try {
      Io.writeJdbc((1L to 50L).map(i => (i, i * 2.0)).toDF("id", "score"), url, "t")
      val filtered = Io.readJdbc(spark, url, "t", Some(("id", 1L, 50L, 4)))
        .where(col("score") > 40.0).select("id")
      val plan = filtered.queryExecution.executedPlan.toString
      // the predicate must reach the JDBC scan itself — at 100 TB a
      // post-scan Filter means the database ships every row over the wire.
      // Matched loosely (predicate inside a PushedFilters clause, no
      // residual Filter node on score) so Spark-version formatting or
      // filter-ordering changes don't break a still-correct pushdown
      assert(plan.contains("JDBCRelation"), s"expected a JDBC scan:\n$plan")
      val pushedClauses = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
      assert(pushedClauses.contains("GreaterThan(score,40.0)"),
        s"filter not pushed into the JDBC source:\n$plan")
      val residualFilter = plan.linesIterator.exists(l =>
        l.contains("Filter ") && l.contains("score") && !l.contains("PushedFilters"))
      assert(!residualFilter, s"residual post-scan Filter on score:\n$plan")
      assert(filtered.count() == 30)
    } finally Io.dropDerbyInMemory(db)
  }

  test("dropBoilerplateLines: hot-line census exchanges 8-byte hashes, anti-join broadcasts") {
    val plan = planOf("q90_boilerplate_lines")
    // the census shuffles (lh) / (lh, doc_id) — never the line text
    val censusExchange = "Exchange hashpartitioning\\(lh#\\d+L".r
    assert(censusExchange.findFirstIn(plan).isDefined,
      s"expected a line-hash-keyed census exchange:\n$plan")
    val lineExchange = "Exchange hashpartitioning\\([^)]*line#".r
    assert(lineExchange.findFirstIn(plan).isEmpty,
      s"a census exchange ships line payloads:\n$plan")
    // the hot set is tiny -> the anti-join must broadcast it
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join against the hot set:\n$plan")
  }

  test("q92 RAG retrieval: k-row TakeOrdered, term filter before the postings exchange") {
    val plan = planOf("q92_rag_retrieval")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort materialization:\n$plan")
    val filterIdx = plan.indexOf("Filter term#")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(chunk_key#")
    assert(filterIdx > exchangeIdx && exchangeIdx >= 0,
      s"term filter must sit below (after, in plan text) the postings exchange:\n$plan")
  }

  test("tokenEntropyMicro plans as a pure projection (no hash exchange, no Window)") {
    val d = Tables.read(spark, sf, "documents")
    val plan = d.select(graft.ops.TextOps.tokenEntropyMicro(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q94 funnel: step filters pushed to the scan, per-step joins broadcast") {
    val plan = planOf("q94_funnel")
    assert(plan.contains("EqualTo(event_type,view)") &&
      plan.contains("EqualTo(event_type,click)"),
      s"step filters must reach the parquet scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"per-step stage joins must broadcast, not sort-merge:\n$plan")
  }

  test("q95 SCD-2: dimension streams through a broadcast left join; insert anti side scans keys only") {
    val plan = planOf("q95_scd2_merge")
    // the versioning join must broadcast the update batch (a full-outer
    // formulation can't broadcast and would shuffle the dimension)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"expected a broadcast left-outer versioning join:\n$plan")
    val antiSection = plan.substring(plan.indexOf("LeftAnti"))
    assert(antiSection.contains("ReadSchema: struct<c_custkey:bigint>"),
      s"insert detection must scan the dimension's key column only:\n$plan")
  }

  test("q96 Z-order: map-side projection into one partial+final aggregate") {
    val plan = planOf("q96_zorder_stats")
    assert(plan.contains("partial_min") && plan.contains("partial_max"),
      s"bucket stats must combine map-side:\n$plan")
    // exactly one hash exchange (the bucket agg) + the final orderBy range
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"expected ONE hash exchange, got $hashExchanges:\n$plan")
    assert(!plan.contains("Join"), s"Z-values are map-side only:\n$plan")
  }

  test("q100 retention: user-keyed aggregates, no Expand, dimension join broadcasts") {
    val plan = planOf("q100_cohort_retention")
    assert(!plan.contains("SortMergeJoin"), s"cohort join must broadcast:\n$plan")
    assert(plan.contains("partial_min"), s"cohort min must combine map-side:\n$plan")
  }

  test("q101 data checks: the whole rule set is ONE aggregate over one scan") {
    val plan = planOf("q101_data_checks")
    // a single scan of orders (the rules fuse), not one scan per rule
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE orders scan, got $scans:\n$plan")
    assert(plan.contains("partial_count"), s"violations must combine map-side:\n$plan")
  }

  test("q102 correlation matrix: ONE scan, one partial+final moment aggregate") {
    val plan = planOf("q102_corr_matrix")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"all 14 moments must fold in one lineitem scan:\n$plan")
    assert(plan.contains("partial_"), s"moments must combine map-side:\n$plan")
    assert(!plan.contains("Join"), s"pairs project off the 1-row moment frame:\n$plan")
  }

  test("q103 MAD: per-group medians broadcast back, never SortMergeJoin") {
    val plan = planOf("q103_mad_outliers")
    assert(plan.contains("BroadcastHashJoin"), s"med/mad frames are tiny:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q105 fuzzy match: blocked equi-join (no cartesian), top-1 via WindowGroupLimit") {
    val plan = planOf("q105_fuzzy_match")
    assert(!plan.contains("CartesianProduct"),
      s"candidate pairing must go through the block key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"candidate pairing must go through the block key:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rn=1 filter must prune before the window sort:\n$plan")
  }

  test("q115 OLS: one scan, seven moments in one partial+final grouped aggregate") {
    val plan = planOf("q115_ols_regression")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"regression moments must fold in one lineitem scan:\n$plan")
    assert(plan.contains("partial_"), s"moments must combine map-side:\n$plan")
    assert(!plan.contains("Join"), s"the algebra projects off the moment frame:\n$plan")
  }

  test("q114 source overlap: token self-join is hash, never nested-loop") {
    val plan = planOf("q114_source_overlap")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"vocab intersection must equi-join on token:\n$plan")
  }

  test("q121 A/B z: all three scenarios' readouts fold into ONE scan, one aggregate") {
    val plan = planOf("q121_ab_test")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"all 12 conditional counts (3 scenarios x 4) fold in one events scan:\n$plan")
    assert(!plan.contains("Join"), s"the z projects off the 1-row count frame:\n$plan")
    assert(plan.contains("Generate"),
      s"scenario rows must explode off the single count frame:\n$plan")
  }

  test("q125 CDC compaction: ONE scan, map-side partial max_by, no join") {
    val plan = planOf("q125_cdc_apply")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"the log must be scanned once:\n$plan")
    assert(plan.contains("partial_max_by"),
      s"the winning version must reduce map-side:\n$plan")
    assert(!plan.contains("Join"),
      s"compaction is one aggregate, not a max-seq self-join:\n$plan")
  }

  test("q126 CMS top-k: thin pruned scans, bucket explode above the key aggregate, probes broadcast") {
    val plan = planOf("q126_cms_topk")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected at most 2 lineitem scans, got $scans:\n$plan")
    // every scan is pruned to the key column — the sketch never reads payload
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(reads.nonEmpty && reads.forall(_ == "ReadSchema: struct<l_suppkey:bigint>"),
      s"scans must prune to the key column:\n$reads")
    // the bucket Generate consumes the per-key count frame (d rows per
    // DISTINCT key), so in plan text each Generate sits above a keyed
    // aggregate, never directly above the scan
    assert(plan.contains("TakeOrderedAndProject(limit=25"),
      s"exact top-k must be a TakeOrdered, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the <=k*depth probe rows must broadcast against the sketch:\n$plan")
  }

  test("q127 bucketed join: both sides pre-bucketed, NO exchange before the join") {
    val plan = planOf("q127_bucketed_join")
    assert(plan.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n$plan")
    assert("SelectedBucketsCount".r.findAllIn(plan).size == 2,
      s"both scans must be bucket-pruned bucketed reads:\n$plan")
    assert("Exchange hashpartitioning\\([oc]_custkey".r.findFirstIn(plan).isEmpty,
      s"bucket co-location must eliminate the join shuffle:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"the only hash exchange is the segment rollup, got $hashExchanges:\n$plan")
  }

  test("q128 weighted sample: per-partition WindowGroupLimit, one stratum exchange") {
    val plan = planOf("q128_weighted_sample")
    assert(plan.contains("WindowGroupLimit"),
      s"rn<=k must prune per-partition before the exchange:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"one hash exchange (the stratum), got $hashExchanges:\n$plan")
  }

  test("q129 partition prune: year predicate lands in PartitionFilters, zero data filters") {
    val plan = planOf("q129_partition_prune")
    assert("PartitionFilters: \\[[^\\]]*o_year[^\\]]*= 1995".r.findFirstIn(plan).isDefined,
      s"the year predicate must prune partitions at plan time:\n$plan")
    assert(plan.contains("DataFilters: []"),
      s"nothing should remain to filter after directory pruning:\n$plan")
  }

  test("q131 k-anonymity: ONE scan, map-side combining group count, no window") {
    val plan = planOf("q131_k_anonymity")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"the audit is one aggregate over one scan:\n$plan")
    assert(plan.contains("partial_count"),
      s"quasi-identifier counts must combine map-side:\n$plan")
    assert(!plan.contains("Window"), s"no window needed:\n$plan")
  }

  test("q135 KMV / q136 gap-fill: the materialized base frame is the ONLY input scan") {
    // both ops localCheckpoint their multiply-consumed base aggregate;
    // the final plan must read the checkpoint, never re-scan parquet
    for (q <- Seq("q135_kmv_overlap", "q136_gapfill_daily")) {
      val plan = planOf(q)
      val scans = "FileScan parquet".r.findAllIn(plan).size
      assert(scans == 0,
        s"$q must consume the checkpointed base, got $scans parquet scans:\n$plan")
    }
  }

  test("q138 substring dedup: two census passes, map-side combine, no cartesian, per-doc window") {
    val plan = planOf("q138_substring_dedup")
    // two corpus passes BY DESIGN (census, then mark) — a third scan
    // would mean a lineage recompute leak
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected exactly 2 corpus passes, got $scans:\n$plan")
    assert(plan.contains("partial_count"),
      s"the gram census must combine map-side (skew robustness):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"span marking joins on the gram hash, never all-pairs:\n$plan")
    // the island window partitions by doc_id — never a single global partition
    assert("Window .*doc_id".r.findFirstIn(plan).isDefined,
      s"interval merge must be a per-document window:\n$plan")
  }

  test("q139 token budget: the checkpointed source aggregate is the only input") {
    val plan = planOf("q139_token_budget")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"allocation arithmetic must consume the checkpointed source frame:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row totals frames must broadcast:\n$plan")
  }

  test("q145 WAV metadata: kernel synth+parse stay inside whole-stage codegen, no hash exchange") {
    val plan = planOf("q145_wav_metadata")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"metadata extraction is a pure projection:\n$plan")
    // codegen span asserted on the projection alone (planOf's final
    // ORDER BY wraps the plan in a not-yet-finalized AQE node that
    // hides the codegen markers)
    val proj = Tables.read(spark, sf, "documents")
      .select(graft.ops.MultimodalOps.wavDims(
        graft.ops.MultimodalOps.wavHeader(lit(8000), lit(1),
          col("n_chars"), lit(true))).as("w"))
      .queryExecution.executedPlan.toString
    assert(proj.contains("*("), proj)
    assert(proj.contains("static_invoke(graft.ops.MultimodalKernels.wavDims"), proj)
  }

  test("q146 triangle census: checkpointed edge frames only, no cartesian") {
    val plan = planOf("q146_triangle_census")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"wedge/close joins must consume the checkpointed oriented edges:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"all joins are keyed (degree orientation, never all-pairs):\n$plan")
  }

  test("q147 t-closeness: checkpointed cell frame only; totals broadcast") {
    val plan = planOf("q147_t_closeness")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"every consumer must read the checkpointed (group, source) cells:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the per-source totals must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no group-by-source spine cross join (closed-form absent tail):\n$plan")
  }

  test("q148 RFM: checkpointed customer frame scored map-side against broadcast cuts, no window") {
    val plan = planOf("q148_rfm_segments")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"cuts AND scoring must consume the checkpointed per-customer frame:\n$plan")
    assert(!plan.contains("Window"),
      s"percentile-boundary binning needs no ntile window:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the 9-double cuts row must broadcast:\n$plan")
  }

  test("q149 CUSUM: one parquet pass into the day-grain checkpoint; stats broadcast") {
    // the trajectory is checkpointed; the visible plan (final
    // projection + argmax literals) must not re-roll the corpus
    val plan = planOf("q149_cusum_changepoint")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"all three consumers must read the checkpointed trajectory:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row max/argmax frames must broadcast:\n$plan")
  }

  test("q150 BFS: frontier joins consume checkpoints; no cartesian") {
    val plan = planOf("q150_bfs_levels")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"the level census must read the checkpointed frontiers:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"keyed joins only:\n$plan")
  }

  test("q151 association rules: checkpointed basket frame, k-row TakeOrdered, no cartesian") {
    val plan = planOf("q151_assoc_rules")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"counts and both pair sides must read the checkpointed baskets:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair generation joins on the order key, never all-pairs:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=25"),
      s"rule ranking must ship k rows, not a global sort:\n$plan")
  }

  test("q154 ANN recall: rank pruned per-partition, hit join keyed") {
    val plan = planOf("q154_ann_recall")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must prune before the per-query exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the truth/approx hit join is keyed on (query, neighbor):\n$plan")
  }

  test("q155 BPE vocab: census reads the checkpointed word frame, k-row TakeOrdered") {
    val plan = planOf("q155_bpe_vocab")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"the census must consume the checkpointed vocab frame:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"top-k vocab must ship k rows, not a global sort:\n$plan")
  }

  test("q157 near-dup eval: readout consumes checkpointed pair frames only") {
    val plan = planOf("q157_neardup_eval")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"the count readout must read the checkpointed truth/lsh pairs:\n$plan")
  }

  test("q158 DP release: one scan, map-side combining count, noise is a projection") {
    val plan = planOf("q158_dp_counts")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"the release is one aggregate over one scan:\n$plan")
    assert(plan.contains("partial_count"),
      s"group counts must combine map-side:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"the noise draw is a per-group projection, not a join/window:\n$plan")
  }

  test("q159 LPA: per-node argmax prunes per-partition; census is a k-row TakeOrdered") {
    val plan = planOf("q159_label_prop")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"the census must read the checkpointed final labels:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"community census ships k rows:\n$plan")
  }

  test("q160 ACF: checkpointed day-grain frame only; moment frames broadcast") {
    val plan = planOf("q160_acf_daily")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"denominator and lag sides must read the checkpointed d-frame:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row moment frames must broadcast:\n$plan")
  }

  test("q161 confusion: checkpointed scored frame; median cut broadcasts; no window") {
    val plan = planOf("q161_confusion_f1")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"cut and confusion passes must read the checkpointed joined frame:\n$plan")
    assert(plan.contains("Broadcast"), s"the 1-row cut must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no ranking window needed:\n$plan")
  }

  test("q162 digest census: two pruned text scans, no join") {
    val plan = planOf("q162_content_hash")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 2,
      s"base refs + planted re-refs are the only two scans:\n$plan")
    assert(!plan.contains("Join"), s"the census is aggregate-only:\n$plan")
  }

  test("q163 linear interp: checkpointed sparse series; calendar windows only") {
    val plan = planOf("q163_linear_interp")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"bounds and grid join must read the checkpointed daily frame:\n$plan")
  }

  test("q164 bloom FPR: probe pass reads the checkpoint; bloom ships as a literal") {
    val plan = planOf("q164_bloom_fpr")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"probes must read the checkpointed key column:\n$plan")
    assert(plan.contains("might_contain"),
      s"the probe must be the native codegen'd bloom expression:\n$plan")
    assert(!plan.contains("Join"), s"no join — the filter is a literal:\n$plan")
  }

  test("q165 partial merge: two batch scans by design, map-side partials, no window") {
    val plan = planOf("q165_partial_merge")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"one scan per half-batch:\n$plan")
    assert(plan.contains("partial_"),
      s"batch partials must combine map-side:\n$plan")
    assert(!plan.contains("Window"), s"merge is pure aggregation:\n$plan")
  }

  test("q166 global rank: every data window is bucket-partitioned; offsets broadcast") {
    val plan = planOf("q166_global_rank")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"offset census and rank pass must read the checkpointed buckets:\n$plan")
    assert("windowspecdefinition\\(__bkt".r.findFirstIn(plan).isDefined,
      s"the row_number window must partition by bucket, never global:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the nBuckets-row offsets frame must broadcast:\n$plan")
  }

  test("q168 Zipf: census ships k rows (TakeOrdered); moments read the checkpoint") {
    val plan = planOf("q168_zipf_slope")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"rank and moment passes must read the checkpointed top-k census:\n$plan")
  }

  test("q169 attribution: per-user windows, keyed conversion join, no cartesian") {
    val plan = planOf("q169_position_attribution")
    assert("windowspecdefinition\\(user_id".r.findFirstIn(plan).isDefined,
      s"credit windows must partition by user:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the conversion join is keyed on user_id:\n$plan")
  }

  test("q170 TPC-H Q3: customer broadcasts, top-10 ships via TakeOrdered, no cartesian") {
    val plan = planOf("q170_tpch_q3")
    assert(plan.contains("BroadcastHashJoin"),
      s"the segment-filtered customer dim must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=10"),
      s"top-10 must be a TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"keyed joins only:\n$plan")
  }

  test("q171 grouping sets: one scan through an Expand, map-side partials") {
    val plan = planOf("q171_grouping_sets")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"all three sets come from ONE scan:\n$plan")
    assert(plan.contains("Expand"),
      s"grouping sets plan through Expand:\n$plan")
    assert(plan.contains("partial_count"),
      s"set counts must combine map-side:\n$plan")
  }

  test("q172 range window: customer-partitioned RANGE frame, single exchange") {
    val plan = planOf("q172_range_window")
    assert("windowspecdefinition\\(o_custkey".r.findFirstIn(plan).isDefined,
      s"the trailing window must partition by customer:\n$plan")
    assert(plan.contains("RangeFrame"),
      s"the 30-day frame must be a RANGE frame, not ROWS:\n$plan")
  }

  test("q173 null-safe join: hash-joined (coalesced keys), never cartesian") {
    val plan = planOf("q173_nullsafe_join")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"census and probe must read the checkpointed frame:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"<=> must plan as an equi-join on coalesced keys:\n$plan")
  }

  test("q174 Merkle diff: checkpointed snapshots only; digest sums combine map-side") {
    val plan = planOf("q174_merkle_diff")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"digest and drill passes must read the checkpointed snapshots:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"keyed joins only:\n$plan")
  }

  test("q175 backtest: models broadcast onto the checkpointed daily frame") {
    val plan = planOf("q175_forecast_backtest")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"train and test passes must read the checkpointed daily frame:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the 7-row dow model and 1-row baseline must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"model frames must never shuffle-join the test days:\n$plan")
  }

  test("q176 path census: user-partitioned rank, census ships k rows") {
    val plan = planOf("q176_path_census")
    assert("windowspecdefinition\\(user_id".r.findFirstIn(plan).isDefined,
      s"the first-k rank must partition by user:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=20"),
      s"the path census must ship k rows:\n$plan")
  }

  test("q177 Wilson ranking: brand rollup combines map-side; top-10 via TakeOrdered") {
    val plan = planOf("q177_wilson_topk")
    assert(plan.contains("partial_count"),
      s"brand counts must combine map-side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=10"),
      s"ranking must ship k rows, not sort globally:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"keyed part join only:\n$plan")
  }

  test("q178 skyline: bucket-partitioned sweep windows, carry broadcast") {
    val plan = planOf("q178_skyline")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"cuts, carry and sweep must read the checkpointed points:\n$plan")
    assert("windowspecdefinition\\(__bkt".r.findFirstIn(plan).isDefined,
      s"the sweep window must partition by price bucket:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the per-bucket carry maxima must broadcast:\n$plan")
  }

  test("q179 TWAP: per-user lead window, one grouped fold") {
    val plan = planOf("q179_twap")
    assert("windowspecdefinition\\(user_id".r.findFirstIn(plan).isDefined,
      s"the lead must partition by user:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no joins at all:\n$plan")
  }

  test("q180 equi-depth stats: cuts broadcast; the only windows are " +
    "the bucketed rank machinery's (round-12 census rework)") {
    val plan = planOf("q180_equidepth_stats")
    assert(plan.contains("Broadcast"),
      s"the 15-double cuts row must broadcast:\n$plan")
    // every window in the plan belongs to exactQuantiles' prefix
    // machinery: either bucket-keyed or over the nBuckets-row carry
    // frame — never an unkeyed ranking over the data census
    val windows = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windows.forall(_.contains("__bkt")),
      s"unexpected non-bucket window:\n$plan")
    // and the census rollup itself combines map-side
    assert(plan.contains("partial_sum"),
      s"the bucket rollup must combine map-side:\n$plan")
  }

  test("q182 target encoding: global mean broadcast, one grouped fold") {
    val plan = planOf("q182_target_encoding")
    assert(plan.contains("Broadcast"),
      s"the 1-row global mean must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"encoding is one aggregate + a broadcast literal:\n$plan")
  }

  test("q183 feature hashing: checkpointed token frame, k-row TakeOrdered") {
    val plan = planOf("q183_feature_hashing")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"slot census and headline must read the checkpointed tokens:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=15"),
      s"the hot-slot report ships k rows:\n$plan")
  }

  test("q184 source centroids: checkpointed moment frame; pair join on dim only") {
    val plan = planOf("q184_source_centroids")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"both pair sides must read the checkpointed (source,dim) sums:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the pair join keys on dim (source domain bounded):\n$plan")
  }

  test("q185 join-skew stats: one key census, one-row readout, no join") {
    val plan = planOf("q185_join_skew_stats")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"one scan of the fact table:\n$plan")
    assert(plan.contains("partial_count"),
      s"the key census must combine map-side:\n$plan")
    assert(!plan.contains("Join"), s"diagnostics are aggregate-only:\n$plan")
  }

  test("q122 KS: value-domain shuffle only; totals broadcast back") {
    val plan = planOf("q122_ks_drift")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row totals frame must broadcast:\n$plan")
    assert(plan.contains("partial_"), s"CDF counts must combine map-side:\n$plan")
  }

  test("q112 AUC / q122 KS / q124 KM / q275 logrank / q354 ABC / q356 " +
    "deciles: every data window is bucket-partitioned (round-16 rework " +
    "onto the bucketed prefix/rank machinery)") {
    // on a continuous score/value/time column — or a key domain that
    // grows with the data (parts, customers) — the distinct domain
    // approaches the row count, so an unpartitioned Window.orderBy
    // would sort it on ONE task; the only unpartitioned windows allowed
    // are the <=32-row carry/offset prefixes, identified by their
    // __bkt ordering key, and (q344/q356) the fixed 10-row decile-grain
    // cums, identified by their decile/tile ordering key
    for (q <- Seq("q112_auc_score", "q122_ks_drift", "q124_km_survival",
        "q275_logrank", "q354_abc_classes", "q166_global_rank",
        "q302_nelson_aalen")) {
      val plan = planOf(q)
      val windows = plan.linesIterator
        .filter(_.contains("windowspecdefinition(")).toSeq
      assert(windows.nonEmpty, s"$q: expected bucketed windows:\n$plan")
      windows.foreach { l =>
        assert(l.contains("__bkt"),
          s"$q: unpartitioned value-domain window: $l\n$plan")
      }
    }
    for (q <- Seq("q344_qini_uplift", "q356_decile_migration")) {
      val plan = planOf(q)
      plan.linesIterator.filter(_.contains("windowspecdefinition("))
        .foreach { l =>
          assert(l.contains("__bkt") || l.contains("decile") ||
            l.contains(", d#"),
            s"$q: unpartitioned data-grain window: $l\n$plan")
        }
    }
  }

  test("q109 histogram: the min/max row broadcasts; counts combine map-side") {
    val plan = planOf("q109_histogram")
    assert(plan.contains("Broadcast"), s"1-row bounds frame must broadcast:\n$plan")
    assert(plan.contains("partial_count"), s"bucket counts must combine map-side:\n$plan")
  }

  test("hive-partitioned writes prune at the source (PartitionFilters, zero data tasks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hivepart").toString
    (1 to 100).map(i => (i.toLong, i % 4, s"v$i")).toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("part") === 2).select("id")
    val plan = pruned.queryExecution.executedPlan.toString
    // the partition predicate must land in PartitionFilters (directory
    // pruning — 3/4 of a 100 TB table never opens), never PushedFilters
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("(part"), s"partition predicate not pruned:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(part)"),
      s"partition col must prune directories, not row-filter:\n$plan")
    assert(pruned.count() == 25)
  }

  // ---- round-11 guards -------------------------------------------------------

  test("q190 join-size preflight: never materializes the join it sizes") {
    val plan = planOf("q190_join_size_preflight")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"one scan of orders:\n$plan")
    assert(!plan.contains("Join"), s"the preflight is aggregate-only:\n$plan")
    assert(plan.contains("partial_count"),
      s"the key census must combine map-side:\n$plan")
  }

  test("q191 quarantine channel: one scan, reason census combines map-side") {
    val plan = planOf("q191_quarantine_channel")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"one scan of lineitem:\n$plan")
    assert(plan.contains("partial_count"),
      s"per-reason counts must combine map-side:\n$plan")
    assert(!plan.contains("Join"), s"routing is a pure projection:\n$plan")
  }

  test("q192 HOF vector stats: pure codegen projection, no exchange before sort") {
    val plan = planOf("q192_vector_hof_stats")
    assert(!plan.contains("Join"), s"per-row lambdas, no join:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"no aggregate — all three lambdas are per-row:\n$plan")
    // only the final ORDER BY exchanges; the lambdas are one Project
    // straight over the scan
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"single range exchange for the sort:\n$plan")
  }

  test("q193 item recs: top-k per item via WindowGroupLimit, no cartesian") {
    val plan = planOf("q193_item_recs")
    assert(plan.contains("WindowGroupLimit"),
      s"the per-item top-3 must rank-limit before the full sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q196 temporal join: equi-join on the key with a residual range " +
    "filter — never a nested-loop/cartesian interval join") {
    val plan = planOf("q196_temporal_dim_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the range predicate must ride an equi-join as a residual:\n$plan")
  }

  test("q199 erasure audit: purges are broadcast anti-joins, leak scans " +
    "broadcast semi-joins — the deletion list never shuffles a store") {
    val plan = planOf("q199_erasure_audit")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti") && plan.contains("LeftSemi"),
      s"purge/leak joins must broadcast the deletion list:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no store-sized shuffle for the tiny deletion list:\n$plan")
  }

  test("q200 freeze manifest: the quality cut broadcasts; the manifest " +
    "census combines map-side") {
    val plan = planOf("q200_freeze_manifest")
    assert(plan.contains("Broadcast"),
      s"the 1-row median-cut frame must broadcast:\n$plan")
    assert(plan.contains("partial_count"),
      s"manifest counts must combine map-side:\n$plan")
  }

  test("q201 prefix simjoin: candidates come from the prefix equi-join, " +
    "never a cartesian; per-doc ranks are keyed windows") {
    val plan = planOf("q201_prefix_simjoin")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be the prefix-token equi-join:\n$plan")
    assert(plan.contains("windowspecdefinition(id"),
      s"the prefix rank must be keyed by doc id:\n$plan")
  }

  test("q202 stratified split: every window is stratum-keyed") {
    val plan = planOf("q202_stratified_split")
    val bad = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(source")).toSeq
    assert(bad.isEmpty, s"unkeyed window in:\n$plan")
  }

  test("q194 top-share: rank windows stay bucket-partitioned (no global data window)") {
    val plan = planOf("q194_top_revenue_share")
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && !l.contains("WindowGroupLimit") &&
        !l.contains("windowspecdefinition(__bkt") &&
        l.contains("windowspecdefinition(")).toSeq
    // the only unpartitioned window allowed is the nBuckets-row offset
    // prefix-sum (bounded by config, not data) — identified by its
    // input being the tiny bucket-count frame (sum(__n))
    globalWindows.foreach { l =>
      assert(l.contains("__n"), s"unexpected global data window: $l\n$plan")
    }
  }

  test("q203 sssp: a relaxation round is an equi-join with map-side " +
    "candidate mins (the per-round plans hide behind checkpoints, so " +
    "the round is planned directly)") {
    import spark.implicits._
    val edges = Tables.read(spark, sf, "lineitem")
      .select(col("l_orderkey").as("src"), col("l_suppkey").as("dst"),
        col("l_linenumber").cast("long").as("w"))
    val frontier = Seq((1L, 0L)).toDF("node", "d")
    val plan = graft.ops.GraphOps.relaxOnce(edges, frontier)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"relaxation must be the edge⋈frontier equi-join:\n$plan")
    assert(plan.contains("partial_min"),
      s"per-dst candidate mins must pre-aggregate map-side:\n$plan")
  }

  test("q204 compaction plan: every window is partition-keyed") {
    val plan = planOf("q204_compaction_plan")
    val bad = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(part")).toSeq
    assert(bad.isEmpty, s"unkeyed window in:\n$plan")
  }

  test("q205 lateness: running-max windows stay bucket-partitioned; the " +
    "only unpartitioned window is the 32-row carry prefix") {
    val plan = planOf("q205_lateness_census")
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(__bkt")).toSeq
    globalWindows.foreach { l =>
      assert(l.contains("__bmax"), s"unexpected global data window: $l\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q206 fd profile: pure aggregation — no joins, cell census " +
    "combines map-side") {
    val plan = planOf("q206_fd_profile")
    assert(!plan.contains("Join"), s"FD metrics need no join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"cell census must combine map-side:\n$plan")
  }

  test("q207 seasonal: the 7-row seasonal frame broadcasts back; daily " +
    "rollup combines map-side") {
    val plan = planOf("q207_seasonal_decompose")
    assert(plan.contains("BroadcastHashJoin"),
      s"the seasonal frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join against a 7-row frame:\n$plan")
  }

  test("q208 mojibake census: projection + one census aggregate — no " +
    "joins, no windows") {
    val plan = planOf("q208_mojibake_census")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"flag probes are map-side:\n$plan")
    assert(plan.contains("partial_count"),
      s"census must combine map-side:\n$plan")
  }

  test("q209 RI audit: orphan detection is an anti-join of KEY frames " +
    "(fact payloads collapsed to a census first)") {
    val plan = planOf("q209_ri_audit")
    assert(plan.contains("LeftAnti"),
      s"orphans must come from an anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q210 inverted index: two-level aggregate + TakeOrdered, no joins") {
    val plan = planOf("q210_inverted_index")
    assert(!plan.contains("Join"), s"index build needs no join:\n$plan")
    assert(plan.contains("partial_count"),
      s"the (token, doc) census must combine map-side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-25 must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("q211 readability: projection + one census aggregate — no joins, " +
    "no windows") {
    val plan = planOf("q211_readability")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"scoring is map-side:\n$plan")
    assert(plan.contains("partial_sum"),
      s"census must combine map-side:\n$plan")
  }

  test("q213 median-of-means: one map-side-combining bucket aggregate, " +
    "no joins, no windows") {
    val plan = planOf("q213_median_of_means")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"bucketing is a hash projection:\n$plan")
    assert(plan.contains("partial_sum"),
      s"bucket (n, sum) pairs must combine map-side:\n$plan")
  }

  test("q214 info gain: ONE melted census shuffle; every join after it " +
    "is broadcast on the tiny cell frame") {
    val plan = planOf("q214_info_gain")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-feature totals must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle joins on the post-census cell frame:\n$plan")
  }

  test("q215 PPR: TakeOrdered top-k over the checkpointed rank (the " +
    "per-round plans hide behind the iteration checkpoints, like q203)") {
    val plan = planOf("q215_ppr_cohort")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the walk must ride edge equi-joins:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-25 must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("q216 containment join: candidates from the prefix-token probe " +
    "of the full index, never a cartesian; prefix ranks keyed by doc") {
    val plan = planOf("q216_containment_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be the token equi-join:\n$plan")
    assert(plan.contains("windowspecdefinition(id"),
      s"the prefix rank must be keyed by doc id:\n$plan")
  }

  test("q217 negative sampling: the span probe is a broadcast range " +
    "join of two CONFIG-bounded frames (64 spans x 4096 probes) — " +
    "the sanctioned non-equi shape; never a data-sized cartesian") {
    val plan = planOf("q217_neg_sampling")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the span lookup must broadcast the 64-row table:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q218 markov eval: the |types|^2 model broadcasts to the test " +
    "side; lag windows are user-keyed, rank windows cur-keyed") {
    val plan = planOf("q218_markov_eval")
    assert(plan.contains("BroadcastHashJoin"),
      s"the model frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join against the tiny model:\n$plan")
    val bad = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(user_id") &&
        !l.contains("windowspecdefinition(cur")).toSeq
    assert(bad.isEmpty, s"unkeyed window in:\n$plan")
  }

  test("q220 mp4 census: kernel projection + one aggregate — no joins, " +
    "no windows; StaticInvoke kernels in the scan projection") {
    val plan = planOf("q220_mp4_metadata")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"the box walk is map-side:\n$plan")
    assert(plan.contains("partial_count"),
      s"census must combine map-side:\n$plan")
  }

  test("q221 analytic suite: every window is priority-keyed") {
    val plan = planOf("q221_analytic_suite")
    val bad = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(priority")).toSeq
    assert(bad.isEmpty, s"unkeyed window in:\n$plan")
  }

  test("q222 CUPED: no windows at all; the fit/pooled one-row frames " +
    "ride broadcast crosses, never a shuffle join") {
    val plan = planOf("q222_cuped_ab")
    assert(!plan.contains("windowspecdefinition"),
      s"CUPED needs no window:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"stats frames must broadcast:\n$plan")
  }

  test("q223 Mann-Whitney: rank prefix stays bucket-partitioned; the " +
    "only unpartitioned window is the 32-row carry") {
    val plan = planOf("q223_mann_whitney")
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(__bkt")).toSeq
    globalWindows.foreach { l =>
      assert(l.contains("__bsum"), s"unexpected global data window: $l\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q224 skipping stats: one stats fold, then probe algebra on the " +
    "checkpointed file frame - no joins, no windows") {
    val plan = planOf("q224_skipping_stats")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"probe accounting is frame algebra:\n$plan")
  }

  test("q225 triples: map-side generator expansion + one census, " +
    "TakeOrdered top-k - no joins") {
    val plan = planOf("q225_supplier_triples")
    assert(!plan.contains("Join"), s"expansion is a generator:\n$plan")
    assert(plan.contains("Generate"), s"triples come from explode:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-25 must be a TakeOrdered:\n$plan")
  }

  test("q226 group k-fold: user-keyed census, fold-grain rollup, " +
    "broadcast span audit - no windows") {
    val plan = planOf("q226_group_kfold")
    assert(!plan.contains("windowspecdefinition"),
      s"fold assignment is a hash projection:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the one-row audit frame must broadcast:\n$plan")
  }

  test("q227 lang-id eval: one confusion census; truth totals and the " +
    "overall accuracy row both broadcast") {
    val plan = planOf("q227_langid_eval")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"rollup joins ride the tiny census frame, broadcast:\n$plan")
  }

  test("q228 Theil-Sen: day-grain pair expansion is a broadcast " +
    "non-equi join, never a sort-merge or cartesian (round 18: the " +
    "pair selection runs at build time, so the machinery is asserted " +
    "on the shared helper's own passes)") {
    // the output plan no longer carries the pair machinery (its
    // selection collapses to literals at build time); assert the
    // machinery's join strategy on the helper directly
    import org.apache.spark.sql.functions._
    val daily = spark.range(0, 40)
      .selectExpr("id AS d", "(id * 7) % 13 AS r").localCheckpoint(true)
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans += qe.executedPlan.toString
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.ops.StatsOps.pairSlopeMedianParts(daily, "d", "r", 40L)
      spark.sparkContext.listenerBus.waitUntilEmpty()
      val pairPlans = plans.filter(_.contains("__pd2"))
      assert(pairPlans.nonEmpty, s"no pair pass observed:\n${plans.mkString}")
      assert(pairPlans.forall(p => p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")),
        s"day-frame self-pairs must broadcast:\n${pairPlans.mkString}")
    } finally spark.listenerManager.unregister(listener)
    // and the OUTPUT plan holds no data-sized join either
    val plan = planOf("q228_theil_sen")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no data-sized join:\n$plan")
  }

  test("q229 TPC-H Q5: the dim chain broadcasts (region→nation→supplier " +
    "and the customer attach); no cartesian") {
    val plan = planOf("q229_tpch_q5")
    assert(plan.contains("BroadcastHashJoin"),
      s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // both filters reach their scans
    assert(plan.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"),
      s"region filter must push down:\n$plan")
  }

  test("q230 IVF-PQ: LUT and candidate joins broadcast; ADC ranking " +
    "partitions per probe — no cartesian") {
    val plan = planOf("q230_ivfpq_adc")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe-side frames must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the per-probe rank window itself sits behind the checkpointed
    // `top` frame (lineage truncated), so it can't be asserted here;
    // the exact-check joins visible in the final plan must both build
    // on the bounded side
    assert(!plan.contains("SortMergeJoin"),
      s"bounded frames must broadcast in the exact check:\n$plan")
  }

  test("q231 Kruskal-Wallis: rank prefix stays bucket-partitioned; the " +
    "only unpartitioned window is the 32-row carry") {
    val plan = planOf("q231_kruskal_wallis")
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(__bkt")).toSeq
    globalWindows.foreach { l =>
      assert(l.contains("__bsum"), s"unexpected global data window: $l\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q232 RRF: both retrievals are LIMIT-bounded before the merge " +
    "windows; the semantic probe broadcasts") {
    val plan = planOf("q232_rrf_fusion")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"probe must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("GlobalLimit"),
      s"the fused output must be limit-bounded:\n$plan")
  }

  test("q233 HITS: final plan is pure union+sort over the checkpointed " +
    "score frames — no join, no window survives past the per-iteration " +
    "checkpoints") {
    val plan = planOf("q233_hits_rank")
    assert(!plan.contains("Join") && !plan.contains("windowspecdefinition"),
      s"iteration state must be checkpoint-truncated:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q234 calibration: decile census + ≤10-row broadcast algebra — " +
    "no windows, no shuffle join, census combines map-side") {
    val plan = planOf("q234_calibration")
    assert(!plan.contains("windowspecdefinition"),
      s"reliability bins need no window:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"moment frames must broadcast:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the bin census must combine map-side:\n$plan")
  }

  test("q235 conformal: the 5-row group-mean frame broadcasts into the " +
    "residual join; no window anywhere") {
    val plan = planOf("q235_conformal")
    assert(!plan.contains("windowspecdefinition"),
      s"split-conformal needs no window:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the means/qhat frames must broadcast:\n$plan")
  }

  test("q228 Theil-Sen: no exact value-map percentile anywhere in the " +
    "visible plan (VERDICT r11 #1) — the rework's sketch cuts sit " +
    "behind the census checkpoint, so only the ABSENCE is assertable") {
    val plan = planOf("q228_theil_sen")
    assert(!plan.contains("percentile("),
      s"no exact value-map percentile may survive the rework:\n$plan")
  }

  test("q236 Spearman: both marginal rank frames and the moment join " +
    "keep partial aggregation; the x side broadcasts") {
    val plan = planOf("q236_spearman")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"joint census must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 50-row x-rank frame must broadcast:\n$plan")
  }

  test("globalRank (q119/q166/q237/q248's rank machinery): the rank " +
    "window is keyed by the bucket exchange, never SinglePartition") {
    // asserted on the op directly — the query-level frames checkpoint
    // the ranked output, which truncates the visible plan above it
    val perKey = Tables.read(spark, sf, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(expr("cast(floor(o_totalprice) as bigint)")).as("x"))
    val plan = graft.ops.LayoutOps.globalRank(perKey, "x", "k")
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(__bkt".r.findFirstIn(plan).isDefined,
      s"expected the bucketed-rank exchange:\n$plan")
    // the row_number window itself must be keyed by the bucket (the
    // only SinglePartition exchange allowed is the nBuckets-row
    // offsets frame, bounded by CONFIG, not data)
    assert("row_number\\(\\) windowspecdefinition\\(__bkt".r
      .findFirstIn(plan).isDefined,
      s"the rank window must partition by bucket:\n$plan")
  }

  test("q241/q242: TPC-H Q10/Q18 end in TakeOrdered (never a global " +
    "sort) and keep map-side combine") {
    for (q <- Seq("q241_tpch_q10", "q242_tpch_q18")) {
      val plan = planOf(q)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: top-k must be TakeOrdered:\n$plan")
      assert(plan.contains("partial_sum"),
        s"$q: aggregates must combine map-side:\n$plan")
    }
  }

  test("q243 bootstrap: the 32-replica fan-out pre-aggregates map-side " +
    "and the rep census is the only shuffle input") {
    val plan = planOf("q243_bootstrap_ci")
    assert(plan.contains("partial_sum"),
      s"replica sums must combine map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the one-row frames must broadcast:\n$plan")
  }

  test("q254: the NOT IN branches plan as NULL-AWARE anti joins; the " +
    "NOT EXISTS branch as a plain one") {
    val plan = planOf("q254_null_aware_anti")
    // trailing boolean on BroadcastHashJoin ... LeftAnti is
    // isNullAwareAntiJoin — both three-valued branches must carry it
    assert("LeftAnti, BuildRight, true".r.findAllIn(plan).size >= 2,
      s"expected two null-aware anti joins:\n$plan")
    assert(plan.contains("LeftAnti, BuildRight, false"),
      s"NOT EXISTS must stay a plain anti join:\n$plan")
  }

  test("q253: the correlated scalar subqueries decorrelate to " +
    "aggregate-join form with map-side combine") {
    val plan = planOf("q253_correlated_subquery")
    assert(plan.contains("partial_sum") && plan.contains("partial_count"),
      s"decorrelated per-customer aggregates must combine map-side:\n$plan")
  }

  test("q245 Cramer's V: margins and spine broadcast; no shuffle join") {
    val plan = planOf("q245_cramers_v")
    assert(!plan.contains("SortMergeJoin"),
      s"margin/spine joins must broadcast:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the contingency census must combine map-side:\n$plan")
  }

  test("q255 full Q1: one map-side-combined aggregate, no join") {
    val plan = planOf("q255_tpch_q1")
    assert(plan.contains("partial_sum"),
      s"Q1 must combine map-side:\n$plan")
    assert(!plan.contains("Join"), s"Q1 is join-free:\n$plan")
  }

  test("q256 Q6: the shipdate range and quantity bound reach the " +
    "parquet scan; schema pruned to 4 columns") {
    // the rendered plan elides long PushedFilters lists, so read the
    // scan node's metadata directly (pre-AQE plan is a plain tree)
    val df = graft.SparkEntry.queries("q256_tpch_q6")(spark, sf)
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no parquet scan in the Q6 plan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate")
      && pushed.contains("LessThan(l_shipdate")
      && pushed.contains("LessThan(l_quantity,24"),
      s"Q6 IS its scan — range predicates must push down: $pushed")
    assert(scan.schema.fieldNames.toSeq == Seq("l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate"),
      s"Q6 must prune to its 4 columns (l_tax projected away): " +
        scan.schema.fieldNames.mkString(","))
  }

  test("q257/q258: dimension chains broadcast; at most the one " +
    "fact-fact order-key join shuffles") {
    for (q <- Seq("q257_tpch_q7", "q258_tpch_q8")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q dims broadcast:\n$plan")
      assert("SortMergeJoin".r.findAllIn(plan).size <= 1,
        s"$q: only lineitem-orders may shuffle-join:\n$plan")
    }
  }

  test("q259 Q13: the order count pre-aggregates on o_custkey BEFORE " +
    "the customer join (aggregate-sized join input)") {
    val plan = planOf("q259_tpch_q13")
    assert(plan.contains("partial_count"),
      s"per-customer counts must combine map-side:\n$plan")
  }

  test("q261/q262: the argmax/average frames broadcast back; no " +
    "cartesian beyond the one-row max cross join") {
    for (q <- Seq("q261_tpch_q15", "q262_tpch_q17")) {
      val plan = planOf(q)
      assert(!plan.contains("SortMergeJoin"),
        s"$q: aggregate-sized frames must broadcast:\n$plan")
    }
  }

  test("q263 NDCG: the query side broadcasts; per-query top-k prunes " +
    "per-partition (WindowGroupLimit)") {
    val plan = planOf("q263_ndcg_eval")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast against the corpus:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must prune below the rank shuffle:\n$plan")
  }

  test("q264/q266: wedge joins are hash joins on edge keys; the RA " +
    "census combines map-side") {
    for (q <- Seq("q264_link_predict", "q266_clustering_coeff")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q wedge generation must stay equi-keyed:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        s"$q census must combine map-side:\n$plan")
    }
  }

  test("q265/q268/q269: one-row statistics are partial+final aggregates") {
    for (q <- Seq("q265_assortativity", "q268_vocab_richness",
        "q269_mcnemar")) {
      val plan = planOf(q)
      assert(plan.contains("partial_sum") || plan.contains("partial_count"),
        s"$q must combine map-side:\n$plan")
    }
    // the McNemar census never joins — it is one scan + one aggregate
    assert(!planOf("q269_mcnemar").contains("Join"),
      "q269 is join-free")
  }

  test("q271/q274: sufficient statistics come from ONE map-side-" +
    "combined aggregate; q271 never joins") {
    for (q <- Seq("q271_anova_f", "q274_cohens_d")) {
      val plan = planOf(q)
      assert(plan.contains("partial_sum") || plan.contains("partial_count"),
        s"$q must combine map-side:\n$plan")
    }
    assert(!planOf("q271_anova_f").contains("Join"),
      "q271 is one scan + aggregates, join-free")
  }

  test("q273 Cliff's delta: the prefix windows stay bucket-keyed " +
    "(no global single-partition data window)") {
    val plan = planOf("q273_cliffs_delta")
    // the only unpartitioned window is the 32-row carry frame; the
    // census-sized window must carry the __bkt partition key
    assert(plan.contains("windowspecdefinition(__bkt"),
      s"census prefix must partition by bucket:\n$plan")
  }

  test("q275 log-rank: the observation census combines map-side; the " +
    "only window rides the bounded day census") {
    val plan = planOf("q275_logrank")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"the census must combine map-side:\n$plan")
  }

  test("q276 MRR: query side broadcasts; top-k prunes per-partition") {
    val plan = planOf("q276_mrr_hitk")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast against the corpus:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must prune below the rank shuffle:\n$plan")
  }

  test("q278 Jaccard sweep: candidate pairs stay band-equi-keyed " +
    "(no cartesian); the census combines map-side") {
    val plan = planOf("q278_jaccard_sweep")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay the banded equi-join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the decile census must combine map-side:\n$plan")
  }

  test("q270 Davies-Bouldin: the scatter aggregate combines map-side; " +
    "k-row frames broadcast (no SortMergeJoin)") {
    val plan = planOf("q270_davies_bouldin")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"scatter must combine map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"everything past the scatter rides k-row broadcasts:\n$plan")
  }

  test("q279/q281/q284/q286: the part prune broadcasts BEFORE the " +
    "derived-partsupp groupBy, which combines map-side") {
    for (q <- Seq("q279_tpch_q2", "q281_tpch_q9", "q284_tpch_q16",
        "q286_tpch_q20")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q part/dimension prune must broadcast:\n$plan")
      // q284 consumes only the partsupp KEYS, so Catalyst prunes the
      // sum/min functions entirely (a keys-only pre-aggregate) and the
      // map-side partial shows up on the count(distinct) instead
      assert(plan.contains("partial_"),
        s"$q partsupp derivation must combine map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must not fan out:\n$plan")
    }
  }

  test("q280/q287: the exists-logic stays semi/anti joins (one row " +
    "per order however many matching lines)") {
    val p4 = planOf("q280_tpch_q4")
    assert(p4.contains("LeftSemi"), s"Q4 EXISTS must be a semi join:\n$p4")
    val p21 = planOf("q287_tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"Q21 needs BOTH the other-supplier semi and the other-late anti:\n$p21")
  }

  test("q285 Q19: the branch union-bounds reach both scans; the " +
    "disjunction is a residual, not a cartesian") {
    val df = graft.SparkEntry.queries("q285_tpch_q19")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pushed = scans.map(_.metadata("PushedFilters")).mkString("; ")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      pushed.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"the lineitem quantity union-bound must push down: $pushed")
    assert(pushed.contains("In(p_brand") || pushed.contains("p_brand"),
      s"the part brand union-bound must push down: $pushed")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"Q19 stays an equi join with a residual filter:\n$plan")
  }

  test("q282/q288: the global-total/mean one-row frames broadcast " +
    "back (no CartesianProduct)") {
    for (q <- Seq("q282_tpch_q11", "q288_tpch_q22")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q scalar frame must broadcast:\n$plan")
    }
  }

  test("q289/q290/q291/q292: the day/month census is the only " +
    "fact-sized aggregate (map-side combine); every fan-out rides a " +
    "broadcast, never a CartesianProduct") {
    for (q <- Seq("q289_periodogram", "q290_mann_kendall",
        "q291_isotonic_trend", "q292_ccf_leadlag")) {
      val plan = planOf(q)
      // q289's census partials sit BEHIND its localCheckpoint (the
      // visible plan starts at Scan ExistingRDD); the max/argmax pick
      // still shows its own map-side partial
      assert(plan.contains("partial_"),
        s"$q must combine map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q calendar-bounded fan-outs must broadcast:\n$plan")
    }
  }

  test("q293 JL projections are StaticInvoke kernels; the pair join " +
    "is the +1-key equi join (no fan-out)") {
    // the pre-execution AQE plan doesn't print WholeStageCodegen
    // spans, so assert the codegen-able kernel calls directly
    val plan = planOf("q293_jl_distortion")
    assert(plan.contains("static_invoke(graft.ops.VectorKernels.jlProject"),
      s"projection must ride the kernel:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the neighbor-pair join must stay equi-keyed:\n$plan")
  }

  test("q294/q295/q296: censuses and the profile aggregate combine " +
    "map-side; no cartesians") {
    for (q <- Seq("q294_llr_collocations", "q295_unpivot_profile",
        "q296_mase_backtest")) {
      val plan = planOf(q)
      assert(plan.contains("partial_"),
        s"$q must combine map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must not fan out:\n$plan")
    }
  }

  test("q298/q299/q300: assignment/report censuses combine map-side; " +
    "no unpartitioned cartesians (one-row broadcast crossJoins are " +
    "the sanctioned scalar pattern)") {
    for (q <- Seq("q298_srm_check", "q299_ldp_freq",
        "q300_interval_overlap")) {
      val plan = planOf(q)
      assert(plan.contains("partial_"),
        s"$q must combine map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must not fan out:\n$plan")
    }
    // the interval join specifically must stay customer-keyed equi
    val p300 = planOf("q300_interval_overlap")
    assert(!p300.contains("BroadcastNestedLoopJoin"),
      s"q300's overlap predicate must ride the custkey equi join:\n$p300")
  }

  test("q301-q304: cell/census/strata aggregates combine map-side; " +
    "q303's doc windows partition on doc_id") {
    for (q <- Seq("q301_did_estimator", "q302_nelson_aalen",
        "q303_rake_keyphrases", "q304_neyman_alloc")) {
      val plan = planOf(q)
      assert(plan.contains("partial_"),
        s"$q must combine map-side:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must not fan out:\n$plan")
    }
    val p303 = planOf("q303_rake_keyphrases")
    assert(p303.contains("hashpartitioning(doc_id"),
      s"q303's run windows must hash on doc_id (fact-parallel):\n$p303")
  }

  test("q305/q306/q307: mask/triple censuses combine map-side; the " +
    "GIF parse rides StaticInvoke kernels; no cartesians") {
    for (q <- Seq("q305_bitmap_days", "q306_gif_metadata",
        "q307_markov2_lift")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q must not fan out:\n$plan")
    }
    assert(planOf("q305_bitmap_days").contains("partial_"),
      "q305's bit_or mask census must combine map-side")
    assert(planOf("q306_gif_metadata")
      .contains("static_invoke(graft.ops.MultimodalKernels.gifMeta"),
      "q306 must parse via the kernel")
    assert(planOf("q307_markov2_lift").contains("partial_"),
      "q307's triple census must combine map-side")
  }

  test("q116 PMI: censuses ride hashed keys (bigramFps kernel present, " +
    "no bigram-string ngrams rebuild)") {
    val plan = planOf("q116_pmi_collocations")
    assert(plan.contains("static_invoke(graft.ops.TextKernels.bigramFps"),
      s"q116's bigram census must shuffle packed fingerprints:\n$plan")
    assert(!plan.contains("substring_index"),
      "q116 must not split bigram strings back apart")
  }

  test("q210 inverted index: within-doc collapse in the kernel — ONE " +
    "aggregation, no (token, doc)-keyed pre-census") {
    val plan = planOf("q210_inverted_index")
    assert(plan.contains(
      "static_invoke(graft.ops.TextKernels.tokenCensusEntries"),
      s"q210 must collapse postings in the kernel:\n$plan")
    // exactly one exchange: the term census (TakeOrdered adds none)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"q210 expected 1 census exchange, got " +
      s"$exchanges:\n$plan")
  }

  test("q206 FD profile: single melted census (one lineitem scan, " +
    "generator present, integral keys stay long)") {
    val plan = planOf("q206_fd_profile")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q206 expected ONE table scan, got $scans:\n$plan")
    assert(plan.contains("Generate"),
      s"q206 must melt candidates through a generator:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }
}

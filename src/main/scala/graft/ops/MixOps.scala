package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Data-mixing operators for training pipelines: deterministic, seeded
  * global shuffle + sharding, so example order is reproducible across
  * runs, engines, and cluster sizes (the property TPU/GPU input
  * pipelines need — re-running the job must re-create byte-identical
  * shards).
  *
  * The hash is a two-round Lehmer/MCG permutation over the Mersenne
  * prime 2^31-1 rather than xxhash64: every intermediate product stays
  * under 2^48, so ANY engine with 64-bit integers (Spark, DuckDB, a
  * trainer's data loader in Python) reproduces the exact same shard
  * assignment and order — portability the oracle compare also relies
  * on. Multipliers are the classic MINSTD pair (48271, 69621).
  */
object MixOps {

  val P: Long = 2147483647L // 2^31 - 1

  /** Round-1 hash: seed-offset Lehmer step. Uniform over [0, P). */
  def portableHash(id: Column, seed: Long): Column =
    ((id % P + lit(seed)) * lit(48271L)) % P

  /** Round-2 hash, decorrelated from round 1 by the +1 offset and a
    * different multiplier — used as the intra-shard order key.
    */
  def portableHash2(id: Column, seed: Long): Column =
    ((portableHash(id, seed) + lit(1L)) * lit(69621L)) % P

  /** Seeded deterministic shuffle+shard: assigns each row a `shard` in
    * [0, nShards) and a dense 1-based `pos` within its shard, both pure
    * functions of (idCol, seed).
    *
    * Physical shape at scale: the window partitioned by `shard` is ONE
    * hash-partition shuffle + a per-shard sort — exactly the layout a
    * sharded training-data write wants (one sorted shard per output
    * file; follow with `.repartition(nShards, col("shard"))` and a
    * partitioned write). Choose nShards so a shard fits an executor
    * (e.g. 100 TB / 256 MB ≈ 400k shards); the sort is per-shard, never
    * global.
    */
  def shuffleShard(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val shard = (portableHash(col(idCol), seed) % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("__ord", portableHash2(col(idCol), seed))
      .withColumn("pos", row_number().over(w))
      .drop("__ord")
  }

  /** Temperature-weighted source mixing: keep each source at a
    * deterministic rate so the sampled corpus follows the
    * temperature-flattened source distribution `p_s ∝ (n_s/N)^(1/τ)`
    * (τ > 1 upweights small sources — the standard multi-source
    * pre-training mix), targeting ≈ `N·targetNum/targetDen` kept rows
    * overall (per-source rates capped at 1). Selection is the q57-style
    * integer hash gate — `portableHash2(id, seed) < floor(rate·P)` —
    * so membership is a pure function of (id, seed) and any engine
    * that reproduces the rate doubles reproduces the exact row set.
    * The TWO-round hash is load-bearing here: one Lehmer round of a
    * small sequential id stays small (id·48271 never wraps P), which
    * is fine for `% nShards` sharding but biased for a magnitude
    * threshold — round two wraps the modulus and uniformizes.
    *
    * Cross-engine float discipline: per-source weights are summed in
    * sorted-source order (never reduce-order-dependent), the rate
    * expression is evaluated in one fixed parenthesization, and rates
    * are n4-rounded BEFORE the threshold multiply — the oracle mirrors
    * each step, so thresholds agree exactly (modulo a ~1-ulp `pow`
    * divergence that n4 absorbs).
    *
    * Scale shape: one (small) source-count aggregate flows driver-ward;
    * the sample itself is a map-side filter with per-source literal
    * thresholds — no shuffle, no per-row randomness.
    */
  /** Hard ceiling on the source domain [[temperatureSample]] will
    * collect: the per-source count frame is driver-side state (the
    * rates become per-source literal thresholds), so an adversarial
    * high-cardinality source column must fail loudly rather than OOM
    * the driver. Real pre-training mixes have tens-to-hundreds of
    * sources; 65536 is generous headroom while keeping the collected
    * frame ≤ a few MB (VERDICT r11 #4).
    */
  val MaxSources = 65536

  def temperatureSample(df: DataFrame, idCol: String, srcCol: String,
      tau: Double, targetNum: Long, targetDen: Long, seed: Long): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    // LIMIT-bounded collect: at most MaxSources+1 rows ever reach the
    // driver, so an oversized domain raises instead of OOMing, and the
    // probe costs no second action
    val collected = df.groupBy(srcCol).count().limit(MaxSources + 1).collect()
    require(collected.length <= MaxSources,
      s"temperatureSample: source domain exceeds $MaxSources distinct " +
        s"values of '$srcCol' — per-source rates are driver-side literals; " +
        "bucket or pre-aggregate the source column first")
    val counts = collected
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val target = total * targetNum / targetDen
    val ws = counts.map { case (_, n) => math.pow(n.toDouble / total, 1.0 / tau) }
    val sumw = ws.foldLeft(0.0)(_ + _)
    val thresholds = counts.zip(ws).map { case ((s, n), w) =>
      val rate = math.min(1.0, (target * (w / sumw)) / n)
      val rate4 = math.floor(rate * 10000 + 0.5) / 10000
      s -> math.floor(rate4 * P).toLong
    }
    val thr = thresholds.foldLeft(lit(null).cast("long")) { case (els, (s, t)) =>
      when(col(srcCol) === s, lit(t)).otherwise(els)
    }
    df.where(portableHash2(col(idCol), seed) < thr)
  }

  /** Deterministic train/val/test split: each row is assigned the
    * first split whose cumulative-fraction threshold its hash falls
    * under — a pure function of (idCol, seed), so the split survives
    * re-runs, engine swaps, and cluster-layout changes (the property
    * an eval set MUST have: a re-ingest that reshuffles rows between
    * splits silently contaminates every benchmark downstream).
    *
    * Thresholds are exact integers (`floor(cumFrac · P)` against the
    * uniform round-2 hash — see [[temperatureSample]] for why round 2),
    * so membership is integer comparison, no float boundary anywhere.
    *
    * Scale shape: a map-side projection with literal thresholds — no
    * shuffle, no per-row randomness, no driver state.
    */
  def assignSplit(df: DataFrame, idCol: String, seed: Long,
      fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty, "fracs must be non-empty")
    require(fracs.forall(_._2 > 0), s"fractions must be positive: $fracs")
    require(fracs.map(_._1).distinct.size == fracs.size,
      s"split names must be distinct: $fracs")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fracs")
    val cuts = fracs.init.scanLeft(("", 0.0)) {
      case ((_, cum), (name, f)) => (name, cum + f)
    }.tail.map { case (name, cum) => (name, math.floor(cum * P).toLong) }
    val h = portableHash2(col(idCol), seed)
    val split = cuts.foldRight(lit(fracs.last._1)) {
      case ((name, t), els) => when(h < t, lit(name)).otherwise(els)
    }
    df.withColumn("split", split)
  }

  /** [[assignSplit]]'s CASE expression rendered for the oracle (same
    * integer thresholds, same first-match-wins order).
    */
  def assignSplitSql(idE: String, seed: Long,
      fracs: Seq[(String, Double)]): String = {
    val cuts = fracs.init.scanLeft(("", 0.0)) {
      case ((_, cum), (name, f)) => (name, cum + f)
    }.tail.map { case (name, cum) => (name, math.floor(cum * P).toLong) }
    val h = s"(((($idE % $P + $seed) * 48271) % $P + 1) * 69621) % $P"
    val branches = cuts.map { case (name, t) =>
      s"WHEN $h < $t THEN '$name'"
    }.mkString(" ")
    s"(CASE $branches ELSE '${fracs.last._1}' END)"
  }

  /** Per-source quota capping ("domain balancing"): keep at most
    * `quota` rows per `keyCol` group, preferring rows by `ordering` —
    * the web-curation stage that stops a handful of giant domains from
    * dominating the mix (the complement of [[temperatureSample]]'s
    * rate-based reweighting: quota is a hard per-group ceiling and
    * keeps the BEST rows, not a random subset).
    *
    * The ordering MUST be total per group (end it with a unique id) —
    * otherwise the quota boundary row is layout-dependent.
    *
    * Scale shape: one hash shuffle on the group key; the rank is a
    * `row_number` window that Spark executes as WindowGroupLimit, so
    * each partition retains only `quota` rows per group BEFORE the
    * final filter — a giant domain never materializes its tail.
    */
  def perKeyQuota(df: DataFrame, keyCol: String, ordering: Seq[Column],
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    require(ordering.nonEmpty, "ordering must be non-empty")
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Token-budget sequence packing (GPT-style): documents are laid out
    * in the seeded deterministic mix order, their token counts prefix-
    * summed, and the concatenated token stream cut every `budget`
    * tokens. Each doc gets the pack it STARTS in (`pack`) and its token
    * offset within that pack (`off`) — a doc may straddle a pack
    * boundary, exactly like fixed-context pre-training packing. The
    * assignment is a pure function of (id, seed, nTok), so a re-run —
    * on any engine or cluster layout — rebuilds byte-identical packs.
    *
    * Physical shape at scale: identical to [[shuffleShard]] — ONE hash
    * shuffle on `shard` + a per-shard sort; the prefix sum and the
    * budget cut are window/projection work inside each shard, never a
    * global sort. Packs are local to a shard, so `nShards` sized for
    * executor memory bounds every sort and makes the layout
    * cluster-size-independent.
    *
    * `nTokCol` must be a non-null integral token count (e.g.
    * [[TextOps.nBpeTokens]]).
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      budget: Long, seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(budget > 0, s"budget must be positive: $budget")
    val shard = (portableHash(col(idCol), seed) % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("__ord", portableHash2(col(idCol), seed))
      .withColumn("__start",
        coalesce(sum(col(nTokCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack", (col("__start") - (col("__start") % budget)) / budget)
      .withColumn("pack", col("pack").cast("long"))
      .withColumn("off", col("__start") % budget)
      .drop("__ord", "__start")
  }

  /** Weighted sampling without replacement, `k` rows per stratum —
    * Efraimidis-Spirakis A-ES: each row draws a deterministic uniform
    * `u = (portableHash2(id, seed) + 1) / P ∈ (0, 1]` and ranks by
    * `ln(u) / w` descending (the exponentiated-key form of
    * `u^(1/w)`); the top k per stratum are the sample, with inclusion
    * probability rising in the weight. Every draw is a pure function
    * of (id, seed), so the sample is reproducible on any engine or
    * cluster layout — no RNG state, no per-partition generators.
    *
    * TWO Lehmer rounds ([[portableHash2]]), not one: a single
    * `(id+seed)·48271 mod P` never wraps for `id < P/48271 ≈ 44k`, so
    * on small id domains it is MONOTONE in id and the "draw" would
    * just rank by id (caught by the seed-purity spec). The second
    * multiply wraps hundreds of times even for tiny ids.
    *
    * The rank key is gridded to 1e-12 (`floor(ln(u)/w · 1e12 + 0.5)`,
    * exact BIGINTs after) BEFORE ranking, because `ln` may differ in
    * the last ulp across libm implementations (the PMI/q116
    * convention); grid ties break by id.
    *
    * Scale shape: ONE hash shuffle on the stratum; `row_number ≤ k`
    * executes as WindowGroupLimit, so each partition keeps only k
    * rows per stratum before the exchange. Rows with `w ≤ 0` are
    * excluded (zero weight = never sampled).
    *
    * Returns (strataCol, rn, idCol, key12).
    */
  /** Epochs-capped token-budget allocation across sources — the
    * sampling table a pretraining mix is built from (the
    * Llama-report recipe shape: size-flattened weights, a hard
    * max-epochs cap per source, leftovers redistributed): given the
    * per-source token inventory, allot a total budget of
    * `budgetPerMille`/1000 × (corpus tokens) proportionally to
    * sqrt(tokens) weights (sqrt flattens the head so small sources
    * up-sample), cap every source at `epochCapPct`/100 epochs of its
    * own inventory, then hand each capped source's surplus to the
    * uncapped ones in ONE redistribution pass (weight-proportional,
    * re-capped; a fixed-point loop converges in ≤ source-count passes
    * but one pass is the standard practical recipe and keeps the
    * arithmetic closed-form).
    *
    * EVERYTHING after the sqrt is exact BIGINT arithmetic (floor-div
    * allocations, micro-epoch output), so the oracle replays it
    * bit-for-bit; `floor(sqrt(BIGINT))` itself is cross-engine exact
    * (IEEE sqrt is correctly rounded; perfect squares land exactly).
    * Products are bounded by corpusTokens^1.5 · budgetPerMille/1000 —
    * BIGINT-safe through ~2.7e12 corpus tokens, enforced with a
    * raise_error guard (beyond that, lift the arithmetic to
    * DECIMAL(38)/HUGEINT).
    *
    * Scale shape: ONE corpus scan into a source-domain aggregate;
    * everything after is arithmetic on #sources rows (checkpointed —
    * it feeds the totals frame, the per-source rows, and the
    * redistribution totals). Returns
    * (source, tok, w, alloc, epochs_u) — epochs_u in micro-epochs.
    */
  def tokenBudget(docs: DataFrame, srcCol: String, textCol: String,
      budgetPerMille: Long, epochCapPct: Long): DataFrame = {
    require(budgetPerMille > 0 && epochCapPct > 0,
      s"budgetPerMille/epochCapPct must be positive: $budgetPerMille/$epochCapPct")
    val srcTok = docs.groupBy(col(srcCol).as("source"))
      .agg(sum(TextOps.nTokens(col(textCol)).cast(LongType)).as("tok"))
      .withColumn("w", floor(sqrt(col("tok").cast(DoubleType))).cast(LongType))
      .localCheckpoint(true) // source-domain-sized; three consumers
    val tot = srcTok.agg(sum(col("tok")).as("TT"), sum(col("w")).as("WW"))
    val fits = col("TT") <= lit(2700000000000L) // T^1.5·bpm/1000 < 2^63
    val a1 = srcTok.crossJoin(broadcast(tot))
      .withColumn("B", when(fits, expr(s"TT * $budgetPerMille div 1000"))
        .otherwise(raise_error(lit(
          "tokenBudget: corpus too large for BIGINT allocation arithmetic; " +
            "lift to DECIMAL(38)")).cast(LongType)))
      .withColumn("cap", expr(s"tok * $epochCapPct div 100"))
      .withColumn("alloc1", least(expr("B * w div WW"), col("cap")))
    val tot2 = a1.agg(sum(col("alloc1")).as("A1"),
      sum(when(col("alloc1") < col("cap"), col("w")).otherwise(lit(0L))).as("W2"))
    a1.crossJoin(broadcast(tot2))
      .withColumn("alloc", least(
        col("alloc1") + when(col("alloc1") < col("cap") && col("W2") > 0,
          expr("(B - A1) * w div W2")).otherwise(lit(0L)),
        col("cap")))
      .select(col("source"), col("tok"), col("w"), col("alloc"),
        expr("alloc * 1000000 div tok").as("epochs_u"))
      .orderBy("source")
  }

  /** [[tokenBudget]] oracle rendering over (srcCol, textCol). */
  def tokenBudgetSql(table: String, srcCol: String, textCol: String,
      budgetPerMille: Long, epochCapPct: Long): String =
    s"""WITH __st AS (SELECT $srcCol AS source,
       |    CAST(sum(${TextOps.nTokensSql(textCol)}) AS BIGINT) AS tok
       |  FROM $table GROUP BY 1),
       |__sw AS (SELECT source, tok,
       |    CAST(floor(sqrt(CAST(tok AS DOUBLE))) AS BIGINT) AS w FROM __st),
       |__tot AS (SELECT CAST(sum(tok) AS BIGINT) AS TT,
       |    CAST(sum(w) AS BIGINT) AS WW FROM __sw),
       |__a1 AS (SELECT source, tok, w,
       |    TT * $budgetPerMille // 1000 AS B,
       |    tok * $epochCapPct // 100 AS cap,
       |    least((TT * $budgetPerMille // 1000) * w // WW,
       |      tok * $epochCapPct // 100) AS alloc1
       |  FROM __sw, __tot),
       |__t2 AS (SELECT CAST(sum(alloc1) AS BIGINT) AS A1,
       |    CAST(sum(CASE WHEN alloc1 < cap THEN w ELSE 0 END) AS BIGINT) AS W2
       |  FROM __a1),
       |__f AS (SELECT source, tok, w,
       |    least(alloc1 + CASE WHEN alloc1 < cap AND W2 > 0
       |      THEN (B - A1) * w // W2 ELSE 0 END, cap) AS alloc
       |  FROM __a1, __t2)
       |SELECT source, tok, w, alloc, alloc * 1000000 // tok AS epochs_u
       |FROM __f ORDER BY source""".stripMargin

  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (portableHash2(col(idCol), seed) + lit(1L)).cast("double") /
      lit(P.toDouble)
    val key = floor(log(u) / col(weightCol).cast("double") * lit(1e12) +
      lit(0.5)).cast("long")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__k").desc, col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("__k", key)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(strataCol), col("rn").cast("long").as("rn"), col(idCol),
        col("__k").as("key12"))
      .orderBy(col(strataCol), col("rn"))
  }

  /** [[weightedSample]] oracle rendering over a table with the same
    * column names.
    */
  def weightedSampleSql(table: String, idCol: String, strataCol: String,
      weightCol: String, k: Int, seed: Long): String = {
    val h1 = s"((($idCol % $P + $seed) * 48271) % $P)"
    val h = s"((($h1 + 1) * 69621) % $P)"
    val key = s"CAST(floor(ln(($h + 1) / CAST($P AS DOUBLE)) / " +
      s"CAST($weightCol AS DOUBLE) * 1e12 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    s"""WITH __s AS (SELECT $strataCol, $idCol, $key AS key12
       |  FROM $table WHERE $weightCol > 0),
       |__r AS (SELECT $strataCol, $idCol, key12,
       |    row_number() OVER (PARTITION BY $strataCol
       |      ORDER BY key12 DESC, $idCol) AS rn
       |  FROM __s)
       |SELECT $strataCol, rn, $idCol, key12
       |FROM __r WHERE rn <= $k ORDER BY $strataCol, rn""".stripMargin
  }
}

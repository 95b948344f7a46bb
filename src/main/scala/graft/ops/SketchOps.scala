package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over integer keys — the streaming-friendly
  * heavy-hitter counter, complementing the engine's other sketches
  * (HLL distinct q62, approx-percentile q64): `depth` universal hash
  * rows of `width` buckets; a key's estimate is the MIN of its bucket
  * counts, an overestimate-only bound (`est ≥ exact` always, with
  * error ≤ 2N/width at ~1−(1/2)^depth confidence).
  *
  * Hashing is carried-down arithmetic, not an engine builtin:
  * `h_i(k) = ((a_i·(k mod p) + b_i) mod p) mod width` with p = 2³¹−1
  * and fixed prime coefficients — the textbook universal family,
  * bit-identical in any engine, so a DuckDB oracle can replay the
  * sketch exactly (a builtin like xxhash64 would be engine-private).
  * Intermediate products stay < 2⁵⁶, no BIGINT overflow.
  *
  * Scale shape: the sketch is a partial-aggregable aggregate into at
  * most `depth·width` groups — the map side reduces each partition to
  * ≤ depth·width rows, so the shuffle is CONSTANT-size regardless of
  * input rows; that is the entire point of a sketch at 100 TB.
  */
object SketchOps {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val A = Seq(1299721L, 7778777L, 15485863L, 32452843L)
  private val B = Seq(104729L, 224737L, 350377L, 479909L)

  /** `h_i(key)`: row i's bucket for a key. Non-negative keys hash
    * identically under Spark `pmod` and the oracle's `%`; `pmod`
    * keeps negatives well-defined too.
    */
  private def bucket(key: Column, i: Int, width: Int): Column =
    pmod(pmod(lit(A(i)) * pmod(key, lit(P)) + lit(B(i)), lit(P)), lit(width))

  private def bucketSql(key: String, i: Int, width: Int): String =
    s"((${A(i)} * (($key % $P + $P) % $P) + ${B(i)}) % $P) % $width"

  private def rbArray(key: Column, depth: Int, width: Int): Column = {
    require(depth > 0 && depth <= A.length, s"depth must be 1..${A.length}")
    array((0 until depth).map(i =>
      struct(lit(i).as("r"), bucket(key, i, width).as("b"))): _*)
  }

  /** The CMS bucket-count frame (r, b, cnt) for `df`'s `keyCol`,
    * aggregated from a per-key count frame so the input is scanned
    * ONCE even when the caller also needs exact per-key counts.
    */
  def cmsCounts(keyCounts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame =
    keyCounts.select(col(cntCol), explode(rbArray(col(keyCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col(cntCol)).as("cnt"))

  /** The same bucket-count frame built row-level — explode each row
    * into its `depth` (r, b) cells, ONE count aggregate. Equal to
    * [[cmsCounts]] over the per-key counts by associativity, but
    * needs no pre-aggregation, so it runs as a SINGLE streaming
    * aggregate too (chained aggregations are not allowed in a
    * streaming query): the classic incrementally-updatable CMS.
    */
  def cmsCountsRows(df: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    df.select(explode(rbArray(col(keyCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** [[cmsCountsRows]] oracle rendering. */
  def cmsCountsRowsSql(table: String, keyCol: String,
      depth: Int, width: Int): String = {
    val rbCases = (0 until depth).map(i =>
      s"WHEN ${i} THEN ${bucketSql(keyCol, i, width)}").mkString(" ")
    s"""SELECT CAST(r AS INTEGER) AS r, CASE CAST(r AS INTEGER) $rbCases END AS b,
       |  count(*) AS cnt
       |FROM $table, range($depth) t(r)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Exact top-`k` keys by frequency (ties broken by key asc), each
    * with its Count-Min estimate and the overestimate `over_cnt =
    * est − exact ≥ 0` — the sketch-vs-truth verification row the
    * engine's other sketches also emit. ONE scan of `df`: the per-key
    * count frame feeds both the exact top-k (TakeOrdered) and the
    * sketch (a re-aggregate into ≤ depth·width rows); the ≤ k·depth
    * probe rows broadcast against the sketch.
    */
  def cmsTopK(df: DataFrame, keyCol: String, k: Int,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val keyCounts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_cnt"))
    val sketch = cmsCounts(keyCounts, keyCol, "exact_cnt", depth, width)
    val probes = keyCounts
      .orderBy(col("exact_cnt").desc, col(keyCol)).limit(k)
      .select(col(keyCol), col("exact_cnt"),
        explode(rbArray(col(keyCol), depth, width)).as("rb"))
      .select(col(keyCol), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    sketch.join(broadcast(probes), Seq("r", "b"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col(keyCol), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("over_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
  }

  /** KMV (k-minimum-values) sketch overlap: estimate |A|, |B|, |A∪B|
    * and |A∩B| for two subsets of `keyCol`'s domain from three k-row
    * sketches — the MERGEABLE distinct-counting sketch that, unlike
    * HLL, supports set intersection (θ-sketch style): keep each
    * side's k smallest key hashes; the union sketch is the k smallest
    * of their merge; |S| ≈ (k−1)·P / θ where θ is the k-th smallest
    * hash, Jaccard ≈ |{h ∈ union-k : h ∈ kA ∧ h ∈ kB}| / k, and
    * |A∩B| ≈ J·|A∪B|. A side with fewer than k distinct hashes is
    * its own exact count (the standard KMV fallback). Hashing is
    * [[MixOps.portableHash2]] — engine-portable arithmetic — and
    * every estimate is a single fixed expression over exact BIGINTs,
    * so the DuckDB oracle reproduces the sketch AND the estimates
    * bit-for-bit. Exact counts ride along (the engine's
    * sketch-vs-truth convention).
    *
    * Scale shape: ONE scan folds per-key membership flags
    * (partial-aggregable groupBy on the key); every later frame is
    * ≤ k rows via TakeOrdered — per-partition top-k then a driver
    * merge, which is exactly the sketch's mergeability argument: at
    * 100 TB each partition ships k values, never the key domain.
    *
    * Returns one row: (k, exact_a, exact_b, exact_ab, est_a, est_b,
    * est_union, j_hits, est_ab) with estimates n4-rounded.
    */
  def kmvOverlap(df: DataFrame, keyCol: String, inA: Column, inB: Column,
      k: Int, seed: Long): DataFrame = {
    require(k > 1, s"k must be > 1: $k")
    // localCheckpoint: the per-key membership frame feeds FIVE
    // consumers (two side sketches, the union, the exact counts, the
    // Jaccard probe) whose differently-pruned lineages would each
    // rerun the input scan + groupBy — materializing once is what
    // makes the "ONE scan" scale shape true (plan-asserted: the final
    // plan contains no file scan at all)
    val keys = df.groupBy(col(keyCol).as("__k"))
      .agg(max(when(inA, 1L).otherwise(0L)).as("__a"),
        max(when(inB, 1L).otherwise(0L)).as("__b"))
      .select(col("__a"), col("__b"),
        MixOps.portableHash2(col("__k"), seed).as("h"))
      .localCheckpoint(true)
    val skA = keys.where(col("__a") === 1).select("h").distinct()
      .orderBy("h").limit(k)
    val skB = keys.where(col("__b") === 1).select("h").distinct()
      .orderBy("h").limit(k)
    val skU = skA.union(skB).distinct().orderBy("h").limit(k)
    val exact = keys.agg(sum(col("__a")).as("exact_a"),
      sum(col("__b")).as("exact_b"),
      sum(col("__a") * col("__b")).as("exact_ab"))
    val aStats = skA.agg(count(lit(1)).as("n_a"), max(col("h")).as("th_a"))
    val bStats = skB.agg(count(lit(1)).as("n_b"), max(col("h")).as("th_b"))
    val uStats = skU.agg(count(lit(1)).as("n_u"), max(col("h")).as("th_u"))
    val jHits = skU.join(skA.withColumnRenamed("h", "ha"),
        col("h") === col("ha"), "left_semi")
      .join(skB.withColumnRenamed("h", "hb"), col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("j_hits"))
    val one = exact.crossJoin(broadcast(aStats)).crossJoin(broadcast(bStats))
      .crossJoin(broadcast(uStats)).crossJoin(broadcast(jHits))
    def est(n: Column, th: Column, ex: Column): Column =
      when(n < k, ex.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(P.toDouble) / th.cast("double"))
    val estU = est(col("n_u"), col("th_u"), col("exact_a") + col("exact_b") - col("exact_ab"))
    one.select(lit(k.toLong).as("k"),
      col("exact_a"), col("exact_b"), col("exact_ab"),
      graft.queries.Norm.n4(est(col("n_a"), col("th_a"), col("exact_a"))).as("est_a"),
      graft.queries.Norm.n4(est(col("n_b"), col("th_b"), col("exact_b"))).as("est_b"),
      graft.queries.Norm.n4(estU).as("est_union"),
      col("j_hits"),
      graft.queries.Norm.n4(col("j_hits").cast("double") / col("n_u").cast("double") * estU)
        .as("est_ab"))
  }

  /** [[kmvOverlap]] oracle rendering. `inASql`/`inBSql` are boolean
    * expressions over the table's columns.
    */
  def kmvOverlapSql(table: String, keyCol: String, inASql: String,
      inBSql: String, k: Int, seed: Long): String = {
    val h1 = s"((__k % $P + $seed) * 48271) % $P"
    val h = s"((($h1) + 1) * 69621) % $P"
    val n4 = graft.etl.OracleSql.n4 _
    def estSql(n: String, th: String, ex: String): String =
      s"(CASE WHEN $n < $k THEN CAST($ex AS DOUBLE) " +
        s"ELSE CAST(${k - 1} AS DOUBLE) * CAST($P AS DOUBLE) / CAST($th AS DOUBLE) END)"
    val estU = estSql("n_u", "th_u", "(exact_a + exact_b - exact_ab)")
    s"""WITH __keys AS (SELECT CAST($h AS BIGINT) AS h,
       |    max(CASE WHEN $inASql THEN 1 ELSE 0 END) AS a,
       |    max(CASE WHEN $inBSql THEN 1 ELSE 0 END) AS b
       |  FROM (SELECT $keyCol AS __k, * FROM $table) GROUP BY __k),
       |__ska AS (SELECT h FROM (SELECT DISTINCT h FROM __keys WHERE a = 1)
       |  ORDER BY h LIMIT $k),
       |__skb AS (SELECT h FROM (SELECT DISTINCT h FROM __keys WHERE b = 1)
       |  ORDER BY h LIMIT $k),
       |__sku AS (SELECT h FROM (SELECT h FROM __ska UNION SELECT h FROM __skb)
       |  ORDER BY h LIMIT $k),
       |__ex AS (SELECT CAST(sum(a) AS BIGINT) AS exact_a,
       |    CAST(sum(b) AS BIGINT) AS exact_b,
       |    CAST(sum(a * b) AS BIGINT) AS exact_ab FROM __keys),
       |__sa AS (SELECT count(*) AS n_a, max(h) AS th_a FROM __ska),
       |__sb AS (SELECT count(*) AS n_b, max(h) AS th_b FROM __skb),
       |__su AS (SELECT count(*) AS n_u, max(h) AS th_u FROM __sku),
       |__j AS (SELECT count(*) AS j_hits FROM __sku u
       |  WHERE EXISTS (SELECT 1 FROM __ska x WHERE x.h = u.h)
       |    AND EXISTS (SELECT 1 FROM __skb y WHERE y.h = u.h))
       |SELECT CAST($k AS BIGINT) AS k, exact_a, exact_b, exact_ab,
       |  ${n4(estSql("n_a", "th_a", "exact_a"))} AS est_a,
       |  ${n4(estSql("n_b", "th_b", "exact_b"))} AS est_b,
       |  ${n4(estU)} AS est_union,
       |  CAST(j_hits AS BIGINT) AS j_hits,
       |  ${n4(s"(CAST(j_hits AS DOUBLE) / CAST(n_u AS DOUBLE) * $estU)")} AS est_ab
       |FROM __ex, __sa, __sb, __su, __j""".stripMargin
  }

  /** [[cmsTopK]] oracle rendering. */
  /** Count-Min estimate for EVERY key next to its exact count — the
    * rank-by-the-sketch input [[graft.queries]] q252 grades. Unlike
    * [[cmsTopK]] (which probes only k keys), the probe side here is
    * the whole key census, so the BROADCAST side flips: the counter
    * grid is ≤ depth·width rows (4096 at the defaults) and ships to
    * every executor, while the census streams — the same asymmetry a
    * 100 TB deployment relies on (the sketch is tiny by design; the
    * domain never is).
    */
  def cmsEstimateAll(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val keyCounts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint(true) // sketch fold + probe explode share it
    val sketch = cmsCounts(keyCounts, keyCol, "exact_cnt", depth, width)
    keyCounts
      .select(col(keyCol), col("exact_cnt"),
        explode(rbArray(col(keyCol), depth, width)).as("rb"))
      .select(col(keyCol), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** [[cmsEstimateAll]] oracle rendering (a self-contained SELECT with
    * a nested WITH — embeddable as a CTE body).
    */
  def cmsEstimateAllSql(table: String, keyCol: String,
      depth: Int = 4, width: Int = 1024): String = {
    val rbCases = (0 until depth).map(i =>
      s"WHEN ${i} THEN ${bucketSql(keyCol, i, width)}").mkString(" ")
    val b = s"CASE CAST(r AS INTEGER) $rbCases END"
    s"""WITH __kc AS (SELECT $keyCol, count(*) AS exact_cnt
       |  FROM $table GROUP BY 1),
       |__sk AS (SELECT CAST(r AS INTEGER) AS r, $b AS bkt,
       |    CAST(sum(exact_cnt) AS BIGINT) AS cnt
       |  FROM __kc, range($depth) t(r) GROUP BY 1, 2),
       |__probe AS (SELECT $keyCol, exact_cnt, CAST(r AS INTEGER) AS r,
       |    $b AS bkt
       |  FROM __kc, range($depth) t(r))
       |SELECT p.$keyCol, p.exact_cnt, min(s.cnt) AS est_cnt
       |FROM __probe p JOIN __sk s ON p.r = s.r AND p.bkt = s.bkt
       |GROUP BY 1, 2""".stripMargin
  }

  def cmsTopKSql(table: String, keyCol: String, k: Int,
      depth: Int = 4, width: Int = 1024): String = {
    val rbCases = (0 until depth).map(i =>
      s"WHEN ${i} THEN ${bucketSql(keyCol, i, width)}").mkString(" ")
    val b = s"CASE CAST(r AS INTEGER) $rbCases END"
    s"""WITH __kc AS (SELECT $keyCol, count(*) AS exact_cnt
       |  FROM $table GROUP BY 1),
       |__sk AS (SELECT CAST(r AS INTEGER) AS r, $b AS bkt,
       |    CAST(sum(exact_cnt) AS BIGINT) AS cnt
       |  FROM __kc, range($depth) t(r) GROUP BY 1, 2),
       |__top AS (SELECT $keyCol, exact_cnt FROM __kc
       |  ORDER BY exact_cnt DESC, $keyCol LIMIT $k),
       |__probe AS (SELECT $keyCol, exact_cnt, CAST(r AS INTEGER) AS r,
       |    $b AS bkt
       |  FROM __top, range($depth) t(r))
       |SELECT p.$keyCol, p.exact_cnt, min(s.cnt) AS est_cnt,
       |  min(s.cnt) - p.exact_cnt AS over_cnt
       |FROM __probe p JOIN __sk s ON p.r = s.r AND p.bkt = s.bkt
       |GROUP BY p.$keyCol, p.exact_cnt
       |ORDER BY p.exact_cnt DESC, p.$keyCol""".stripMargin
  }
}

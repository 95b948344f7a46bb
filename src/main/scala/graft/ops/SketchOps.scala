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
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("r"), bucket(col(keyCol), i, width).as("b"))): _*))
          .as("rb"))
      .select(col(keyCol), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    sketch.join(broadcast(probes), Seq("r", "b"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col(keyCol), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("over_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
  }

  /** [[cmsTopK]] oracle rendering. */
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

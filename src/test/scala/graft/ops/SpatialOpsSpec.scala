package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.EtlSpecBase

/** SpatialOps units: the offset classifier's integer bounds and the
  * full/partial count machinery pinned against a brute-force O(n^2)
  * oracle on a deterministic LCG point cloud, across cell sides
  * INCLUDING the degenerate s >= r config (where the (0,0) offset is
  * partial and the symmetric same-cell path must pair-once correctly —
  * the exact mixed covered/boundary trap caught in round 14).
  */
class SpatialOpsSpec extends EtlSpecBase {

  private val R = 400L
  private val N = 400

  // deterministic cloud on a 4000x4000 grid, ~8 expected neighbors
  private def cloud: Seq[(Long, Long, Long)] = (1 to N).map { i =>
    val x = (i.toLong * 48271 % 65537) % 4000
    val y = (i.toLong * 69621 % 65537) % 4000
    (i.toLong, x, y)
  }

  private def ptsDf: DataFrame = {
    import spark.implicits._
    cloud.toDF("id", "x", "y")
  }

  private def bruteCounts(w: Long => Long): Map[Long, Long] = {
    val c = cloud
    c.map { case (ia, xa, ya) =>
      ia -> c.filter { case (ib, xb, yb) =>
        ib != ia &&
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= R * R
      }.map { case (ib, _, _) => w(ib) }.sum
    }.toMap
  }

  test("classify: bounds are exact for integer in-cell positions") {
    val off = SpatialOps.classify(400L, 100L)
    // (0,0) with s=100: max in-cell distance^2 = 2*99^2 < 400^2 -> full
    assert(off.selfFull)
    // axis offset 5: min |diff| = 401 > 400 -> excluded entirely
    assert(!off.full.contains((5L, 0L)) && !off.partial.contains((5L, 0L)))
    // axis offset 4: min 301 <= 400 < max 499 -> partial
    assert(off.partial.contains((4L, 0L)))
    // diagonal (2,2): max^2 = 2*299^2 = 178802 <= 160000? no -> partial
    // (min^2 = 2*101^2 = 20402 <= 160000)
    assert(off.partial.contains((2L, 2L)))
    // (1,1): max^2 = 2*199^2 = 79202 <= 160000 -> full
    assert(off.full.contains((1L, 1L)))
  }

  test("withinCounts: equals the brute-force oracle at every cell side " +
    "including degenerate s >= r") {
    val expected = bruteCounts(_ => 1L)
    for (s <- Seq(50L, 100L, 170L, 400L, 1000L)) {
      val got = SpatialOps
        .withinCounts(ptsDf.withColumn("__one", lit(1L)), R, s, "__one")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == N, s"s=$s size")
      assert(got == expected, s"s=$s diff=${
        got.collect { case (k, v) if expected(k) != v =>
          (k, v, expected(k)) }.take(5)}")
    }
  }

  test("withinCounts: weighted counts match a weighted brute oracle") {
    val expected = bruteCounts(ib => ib % 3)
    val weighted = ptsDf.withColumn("__w", col("id") % 3)
    for (s <- Seq(100L, 400L)) {
      val got = SpatialOps.withinCounts(weighted, R, s, "__w")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"s=$s")
    }
  }

  test("withinCountsAB: disjoint frames count only b-side mass") {
    val c = cloud
    val aSet = c.filter(_._1 % 2 == 0)
    val bSet = c.filter(_._1 % 2 == 1)
    val expected = aSet.map { case (ia, xa, ya) =>
      ia -> bSet.count { case (_, xb, yb) =>
        (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= R * R
      }.toLong
    }.toMap
    import spark.implicits._
    for (s <- Seq(100L, 400L)) {
      val got = SpatialOps.withinCountsAB(
        aSet.toDF("id", "x", "y"),
        bSet.toDF("id", "x", "y").withColumn("__w", lit(1L)),
        R, s, "__w", excludeSameId = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"s=$s")
    }
  }

  test("topKWithin: (d2, id)-ordered top-3 matches brute force at fine " +
    "and degenerate sides") {
    val c = cloud
    val expected = c.map { case (ia, xa, ya) =>
      ia -> c.filter { case (ib, xb, yb) =>
        ib != ia &&
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= R * R
      }.map { case (ib, xb, yb) =>
        ((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb), ib)
      }.sorted.take(3)
    }.filter(_._2.nonEmpty).toMap
    for (s <- Seq(50L, 100L, 400L)) {
      val got = SpatialOps.topKWithin(ptsDf, R, s, 3)
        .select(col("id"), expr("transform(topk, t -> struct(t.d2, t.idb))")
          .as("topk"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getLong(0), t.getLong(1))).toSeq).toMap
      assert(got.keySet == expected.keySet, s"s=$s keys")
      assert(got == expected, s"s=$s diff=${
        got.collect { case (k, v) if expected(k) != v =>
          (k, v, expected(k)) }.take(3)}")
    }
  }

  test("dbscanCensus: class counts match a brute-force classifier") {
    val counts = bruteCounts(_ => 1L)
    val core = counts.filter(_._2 >= 4L).keySet
    val c = cloud
    val border = c.filter { case (ia, xa, ya) =>
      !core(ia) && c.exists { case (ib, xb, yb) =>
        ib != ia && core(ib) &&
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= R * R
      }
    }.map(_._1).toSet
    val expected = Map(
      "core" -> core.size.toLong,
      "border" -> border.size.toLong,
      "noise" -> (N - core.size - border.size).toLong)
      .filter(_._2 > 0)
    for (s <- Seq(100L, 400L)) {
      val got = SpatialOps.dbscanCensus(ptsDf, R, 4L, s)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"s=$s")
    }
  }
}

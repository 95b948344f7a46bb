package graft.queries

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Pins [[Round12Queries.exactQuantiles]] — the bucketed-census exact
  * multi-quantile (the q180/q228 machinery) — against Spark's own
  * exact `percentile` (itself hash-verified against DuckDB's
  * quantile_cont since round 1, the q43 parity class) on adversarial
  * censuses: heavy ties, tiny n (below the bucket count), odd/even
  * counts, negatives, and the rank boundaries where interpolation
  * deltas hit 0.
  */
class ExactQuantilesSpec extends EtlSpecBase {
  import spark.implicits._

  private def check(values: Seq[Long], den: Int, nums: Seq[Int]): Unit = {
    val census = values.groupBy(identity).toSeq
      .map { case (v, vs) => (v, vs.size.toLong) }
      .toDF("v", "cnt")
    val got = Round12Queries.exactQuantiles(census, "v", "cnt", den, nums)
      .select("__cuts").as[Seq[Double]].head()
    val fracs = nums.map(_.toDouble / den)
    val exp = values.toDF("v")
      .agg(percentile(col("v"), array(fracs.map(lit): _*)))
      .as[Seq[Double]].head()
    assert(got == exp,
      s"n=${values.size} den=$den nums=$nums: $got vs $exp")
  }

  test("exactQuantiles == exact percentile on deterministic adversarial " +
    "censuses") {
    val rng = new scala.util.Random(41)
    // tiny counts straddling the 32-bucket machinery
    for (n <- Seq(1, 2, 3, 5, 16, 17, 31, 32, 33, 100)) {
      val vals = Seq.fill(n)(rng.nextInt(7).toLong - 3)
      check(vals, 16, 1 until 16)
    }
    // heavy tie mass: 90% of rows share one value
    val tied = Seq.fill(900)(42L) ++ Seq.fill(100)(rng.nextInt(1000).toLong)
    check(tied, 16, 1 until 16)
    // wide-range negatives, quartiles
    val wide = Seq.fill(500)(rng.nextLong() % 1000000L)
    check(wide, 4, Seq(1, 2, 3))
    // median-only, even and odd
    check(Seq(1L, 2L, 3L, 4L), 2, Seq(1))
    check(Seq(1L, 2L, 3L), 2, Seq(1))
    // exact-boundary ranks: n-1 divisible by den, delta = 0 everywhere
    check((0L until 17L).toSeq, 16, 1 until 16)
  }
}

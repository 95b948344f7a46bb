package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-5 operator units: seeded deterministic shuffle-shard. */
class Round5Spec extends EtlSpecBase {

  import spark.implicits._

  test("shuffleShard: total, in-range, dense positions, deterministic") {
    val df = (1L to 500L).toDF("id")
    val out = MixOps.shuffleShard(df, "id", seed = 42L, nShards = 8).cache()
    try {
      // total: every input row appears exactly once
      assert(out.count() == 500)
      assert(out.select("id").distinct().count() == 500)
      // shard in [0, 8), and with 500 rows every shard is populated
      val shards = out.select("shard").distinct().as[Int].collect().sorted
      assert(shards.toSeq == (0 until 8))
      // pos is dense 1..k within each shard
      val bad = out.groupBy("shard")
        .agg(count("*").as("k"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("dp"))
        .where(col("mx") =!= col("k") || col("mn") =!= 1 || col("dp") =!= col("k"))
      assert(bad.count() == 0)
      // deterministic: same seed -> identical assignment
      val again = MixOps.shuffleShard(df, "id", seed = 42L, nShards = 8)
      assert(out.orderBy("shard", "pos").collect().toSeq ==
        again.orderBy("shard", "pos").collect().toSeq)
      // a different seed produces a different permutation
      val other = MixOps.shuffleShard(df, "id", seed = 43L, nShards = 8)
      assert(out.orderBy("shard", "pos").select("id").collect().toSeq !=
        other.orderBy("shard", "pos").select("id").collect().toSeq)
    } finally { out.unpersist(); () }
  }

  test("shuffleShard balance: no shard exceeds 2x the mean") {
    val df = (1L to 10000L).toDF("id")
    val sizes = MixOps.shuffleShard(df, "id", 7L, 16)
      .groupBy("shard").count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.length == 16)
    val mean = 10000.0 / 16
    assert(sizes.forall(s => s < 2 * mean && s > mean / 2),
      s"skewed shards: ${sizes.mkString(",")}")
  }
}

package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-6 units: hot-band drop observability, streaming fingerprint
  * dedup, and the sharded-write layout recipe MixOps documents.
  */
class Round6Spec extends EtlSpecBase {

  import spark.implicits._

  private val boiler = "the quick brown fox jumps over the lazy dog again"

  test("nearDupPairsWithStats: planted hot band is reported as data, not just logged") {
    val docs = ((1L to 30L).map(i => (i, boiler)) ++
      Seq((101L, "alpha beta gamma delta epsilon zeta"),
        (102L, "one two three four five six seven"),
        (103L, "red green blue cyan magenta yellow black")))
      .toDF("id", "text")
    // capped: the 30-member boilerplate group exceeds every band bucket
    val capped = DedupOps.nearDupPairsWithStats(docs, "id", "text",
      numHashes = 12, bands = 4, threshold = 0.6, maxBandSize = 10)
    val skipped = capped.skippedBands.collect()
    assert(skipped.length == 4, s"expected the 4 bands of the planted group: ${skipped.toSeq}")
    assert(skipped.forall(_.getLong(1) == 30L))
    // the pairs that lived only in those bands are gone
    assert(capped.pairs.count() == 0)
    // uncapped: nothing skipped, all C(30,2) identical-text pairs verified
    val open = DedupOps.nearDupPairsWithStats(docs, "id", "text",
      numHashes = 12, bands = 4, threshold = 0.6)
    assert(open.skippedBands.count() == 0)
    assert(open.pairs.count() == 30L * 29 / 2)
  }

  test("streaming.dedupByFingerprint: cross-batch suppression, admitted == batch distinct") {
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sdf = stream.toDF().toDF("id", "text", "ts")
    val q = DedupOps.streaming.dedupByFingerprint(sdf)
      .select("fp").writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      stream.addData((1L, "alpha beta gamma delta", t(0)), (2L, "one two three four", t(1)))
      q.processAllAvailable()
      // batch 2: a re-crawl of doc 1 (same text, 2 min later — well
      // inside the 1 h watermark) plus one genuinely new doc
      stream.addData((3L, "alpha beta gamma delta", t(2)), (4L, "five six seven eight", t(3)))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("dedup_test").as[Long].collect().sorted.toSeq
    val batchDistinct = Seq("alpha beta gamma delta", "one two three four",
      "five six seven eight").toDF("text")
      .select(TextOps.fingerprint(col("text"))).as[Long].collect().sorted.toSeq
    assert(admitted == batchDistinct) // the duplicate was suppressed, nothing else
  }

  test("shuffleShard sharded write: one file per shard, pos-ordered within the file") {
    val nShards = 4
    val out = MixOps.shuffleShard((1L to 400L).toDF("id"), "id", 11L, nShards)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toFile
    try {
      // the recipe the MixOps doc promises: co-locate each shard in one
      // task, order it, and let the partitioned write lay it out
      out.repartition(nShards, col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(dir.getPath)
      val shardDirs = dir.listFiles().filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.map(_.getName).toSeq ==
        (0 until nShards).map(s => s"shard=$s"))
      shardDirs.foreach { sd =>
        val parts = sd.listFiles().filter(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        assert(parts.length == 1, s"${sd.getName}: expected ONE file, got ${parts.length}")
        // a single small parquet file reads back as one task, in file
        // order: pos must already be dense ascending with no sort
        val pos = spark.read.parquet(parts.head.getPath).select("pos").as[Int].collect().toSeq
        assert(pos == (1 to pos.length), s"${sd.getName}: not pos-ordered")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}

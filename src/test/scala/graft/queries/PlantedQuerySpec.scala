package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll

import graft.etl.EtlSpecBase

/** Drives the REAL registered queries end-to-end against tiny
  * hand-planted parquet fixtures: a spec writes only the tables a
  * query reads into a per-suite temp dir and calls
  * `SparkEntry.queries(name)(spark, dir)` — so what is asserted is
  * the production plan on hand-computed data, not a spec-local
  * re-implementation of the semantics.
  */
abstract class PlantedQuerySpec extends EtlSpecBase with BeforeAndAfterAll {

  private val planted = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Write each (name -> frame) as `<dir>/<name>.parquet`; returns dir. */
  def plant(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_planted_").toString
    planted += dir
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** Plant a table as a SINGLE parquet FILE `<dir>/<name>.parquet` —
    * the driver-fixture layout `Tables.eventsStream` expects (its
    * `pathGlobFilter` matches the file name, so a directory-style
    * write's part-files would be invisible to the streaming source).
    */
  def plantFile(dir: String, name: String, df: DataFrame): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_plantf_").toString
    planted += tmp
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  def run(name: String, dir: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  def ts(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  override def afterAll(): Unit = {
    planted.foreach { d =>
      try org.apache.spark.network.util.JavaUtils
        .deleteRecursively(new java.io.File(d))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    super.afterAll()
  }
}

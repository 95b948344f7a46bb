package graft.etl

import java.nio.file.Files

/** Sources/sinks (S2/S4/K1/K3 + the unsupported-format error). */
class IoSpec extends EtlSpecBase {
  import spark.implicits._

  test("JSONL sink -> source round-trip") {
    val dir = Files.createTempDirectory("graft_io").toString + "/out.jsonl"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Io.write(df, dir)
    val back = Io.read(spark, dir)
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b")))
  }

  test("CSV source reads all-strings (trap P7: our detector owns typing)") {
    val dir = Files.createTempDirectory("graft_io").toString + "/out.csv"
    Io.write(Seq(("1", "2.5"), ("2", "x")).toDF("a", "b"), dir)
    val back = Io.read(spark, dir)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("unsupported formats raise like the reference") {
    // Excel (S3/K2) is PERMANENTLY out of scope: /opt/spark/jars has
    // no POI/spark-excel jar and the image has no egress to fetch
    // one, so .xlsx/.xls fall through to the reference's own
    // unknown-suffix error path (ETL_PROJECT.py:218-219) — the
    // message names the suffix so a caller can tell WHAT was refused
    val rd = intercept[Io.UnsupportedFormatException](
      Io.read(spark, "/tmp/nope.xlsx"))
    assert(rd.getMessage == "unsupported file format: .xlsx",
      rd.getMessage)
    val wr = intercept[Io.UnsupportedFormatException](
      Io.write(Seq(1).toDF("x"), "/tmp/nope.xls"))
    assert(wr.getMessage == "unsupported file format: .xls",
      wr.getMessage)
  }
}

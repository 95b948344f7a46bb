package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Degenerate-input hardening: empty tables, all-null columns, single
  * rows (stddev_samp is null at n=1 -> winsorize must no-op, like
  * pandas' NaN std).
  */
class EdgeSpec extends EtlSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  test("transform of an EMPTY frame completes: all unknown, zero rows") {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val res = AutoEtl.transform(empty)
    assert(res.data.count() == 0)
    assert(res.columnTypes.values.toSet == Set(ColType.Unknown))
    assert(res.summary.totalRows == 0)
  }

  test("an all-null column is detected unknown and dropped at ratio 1.0") {
    val df = Seq(("1", null: String), ("2", null: String), ("3", null: String))
      .toDF("a", "b")
    val res = AutoEtl.transform(df)
    assert(res.columnTypes("b") == ColType.Unknown)
    assert(!res.data.columns.contains("b")) // 100% > 80% threshold
    assert(res.report.actions("b").exists(_.isInstanceOf[Action.DroppedHighNull]))
  }

  test("single-row table: stddev null -> winsorize no-ops, pipeline completes") {
    val df = Seq(("42", "2023-01-01")).toDF("n", "d")
    val res = AutoEtl.transform(df)
    assert(res.data.count() == 1)
    assert(res.columnTypes("n") == ColType.Numeric)
    val row = res.data.collect()(0)
    assert(row.getAs[Double]("n") == 42.0) // untouched by M5
  }

  test("all-identical numeric column: sigma=0 clamps nothing (trap P9)") {
    val df = Seq.fill(10)("5").toDF("x")
    val res = AutoEtl.transform(df)
    // dedup collapses identical rows; values unchanged
    assert(res.data.select("x").as[Double].collect().forall(_ == 5.0))
    assert(!res.report.actions("x").exists(_.isInstanceOf[Action.OutliersClamped]))
  }

  test("fuzz: shingleHashes kernel == expression composition") {
    val gen = for (i <- 0 until 200) yield {
      val words = (0 to (i % 7)).map(j => s"w${(i * 31 + j * 7) % 13}")
      words.mkString(" ")
    }
    val rows = gen.toDF("s")
      .select(
        graft.ops.DedupOps.shingleHashes(col("s"), 3).as("k"),
        array_distinct(transform(graft.ops.DedupOps.shingles(col("s"), 3),
          sh => graft.ops.TextOps.tokenHash(sh))).as("e"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}

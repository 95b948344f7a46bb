package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.4): cleaner idempotence, winsorize
  * bounds, dedup monotonicity, detector totality — plus differential
  * fuzzing of the JVM kernels against their executable-spec expression
  * formulations (one Spark pass per property, not one per case).
  */
class PropertiesSpec extends EtlSpecBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // dirty-string generator: digits, separators, null-likes, junk
  private val dirtyGen: Gen[String] = Gen.frequency(
    3 -> Gen.chooseNum(-99999, 99999).map(_.toString),
    2 -> (for {
      a <- Gen.chooseNum(0, 9999); b <- Gen.chooseNum(0, 99); c <- Gen.chooseNum(0, 99)
      d <- Gen.oneOf("-", "/", ".", "")
    } yield s"$a$d$b$d$c"),
    2 -> Gen.oneOf("", "nan", "None", "NULL", "N/A", "n/a", "null", "NaN"),
    2 -> Gen.asciiPrintableStr.map(_.take(24)),
    1 -> (for {
      x <- Gen.chooseNum(0, 9999); y <- Gen.chooseNum(0, 99)
    } yield s"  $x,$y  "))

  test("property: C2 text clean is idempotent") {
    val in = sample(dirtyGen, 300)
    val once = in.toDF("s").select(Cleaners.cleanText(col("s"), collapseWhitespace = true).as("t"))
    val twice = once.select(Cleaners.cleanText(col("t"), collapseWhitespace = true).as("t"))
    assert(once.collect().map(_.getAs[String]("t")).toSeq ==
      twice.collect().map(_.getAs[String]("t")).toSeq)
  }

  test("property: C4 categorical clean is idempotent") {
    val in = sample(dirtyGen, 300)
    val once = in.toDF("s").select(Cleaners.cleanCategoricalBase(col("s")).as("t"))
    val twice = once.select(Cleaners.cleanCategoricalBase(col("t")).as("t"))
    assert(once.collect().map(_.getAs[String]("t")).toSeq ==
      twice.collect().map(_.getAs[String]("t")).toSeq)
  }

  test("property: C1 numeric clean round-trips on its own output (|x| < 1e7)") {
    // Spark renders |x| >= 1e7 in scientific notation, which C1's
    // character strip would mangle — the reference domain is plain
    // decimal renderings
    val in = sample(dirtyGen, 300)
    val once = in.toDF("s").select(Cleaners.cleanNumeric(col("s")).as("v"))
      .where(col("v").isNull || abs(col("v")) < 1e7)
    val twice = once.select(Cleaners.cleanNumeric(col("v").cast("string")).as("v"))
    val a = once.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val b = twice.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(a.toSeq == b.toSeq)
  }

  test("property: winsorize output stays within [min, max] of input and keeps count") {
    val data = sample(Gen.chooseNum(-1000.0, 1000.0), 200) ++ Seq(1e6, -1e6) // spikes
    val df = data.toDF("x")
    val sts = Winsorizer.stats(df, Seq("x"))
    val out = Winsorizer.apply(df, sts).select("x").as[Double].collect()
    assert(out.length == data.length)
    assert(out.forall(v => v >= data.min && v <= data.max))
    // the spikes got clamped
    assert(out.max < 1e6 && out.min > -1e6)
  }

  test("property: dedup never increases row count; detector is total") {
    val in = sample(dirtyGen, 200)
    val df = in.toDF("s")
    assert(df.dropDuplicates().count() <= df.count())
    val types = TypeDetector.detect(df)
    assert(types.values.forall(ColType.all.contains))
  }

  test("fuzz: date kernel == expression formulation on arbitrary strings") {
    val dateish: Gen[String] = Gen.frequency(
      4 -> (for {
        a <- Gen.chooseNum(0, 99999); b <- Gen.chooseNum(0, 99); c <- Gen.chooseNum(0, 99)
        d <- Gen.oneOf("-", "/", ".", "", ":", " ")
        order <- Gen.oneOf(0, 1)
      } yield if (order == 0) s"$a$d$b$d$c" else s"$b$d$c$d$a"),
      2 -> (for {
        d <- Gen.chooseNum(1, 31); m <- Gen.chooseNum(1, 13); y <- Gen.chooseNum(1900, 2100)
        h <- Gen.chooseNum(0, 24); mi <- Gen.chooseNum(0, 60); s <- Gen.chooseNum(0, 61)
      } yield f"$y%04d-$m%02d-$d%02d $h%d:$mi%d:$s%d"),
      2 -> Gen.listOfN(8, Gen.numChar).map(_.mkString),
      1 -> Gen.asciiPrintableStr.map(_.take(22)),
      1 -> Gen.oneOf("2023-01-01  10:00:00", " 20230101 ", "0-0-0", "1:2:3"))
    val in = sample(dateish, 500)
    val rows = in.toDF("s")
      .select(col("s"), DateFormats.parseDate(col("s")).as("k"),
        DateFormats.parseDateExpr(col("s")).as("e"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.getDate(1)) == Option(r.getDate(2)),
        s"kernel vs expr for '${r.getString(0)}'")
    }
  }

  test("fuzz: C1 numeric-clean kernel == expression formulation") {
    val numish: Gen[String] = Gen.frequency(
      4 -> dirtyGen,
      2 -> Gen.oneOf("5.", ".5", "+.5", "-.", ".", "+", "5..", "1.2.3",
        "--5", "+-3", "0.1.", "$ 1 200,50", "1,234.56", "12,5", "-,5", "1e3"),
      1 -> Gen.asciiPrintableStr.map(_.take(16)))
    val rows = sample(numish, 400).toDF("s")
      .select(col("s"), Cleaners.cleanNumeric(col("s")).as("k"),
        Cleaners.cleanNumericExpr(col("s")).as("e"))
      .collect()
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val e = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(k == e, s"cleanNumeric kernel vs expr for '${r.getString(0)}'")
    }
  }

  test("fuzz: tokenHash kernel == HOF charHash formula on ASCII strings") {
    val asciiGen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '-')))
      .map(_.mkString.take(30))
    val in = sample(asciiGen, 300).filter(_.nonEmpty)
    val rows = in.toDF("s")
      .select(col("s"),
        graft.ops.TextOps.tokenHash(col("s")).as("k"),
        (graft.ops.TextOps.charHash(col("s")) % lit(graft.ops.TextOps.HashP)).as("e"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"tokenHash kernel vs HOF for '${r.getString(0)}'")
    }
  }

  test("fuzz: vector kernels == HOF forms on arbitrary double vectors") {
    import graft.ops.SimilarityOps
    val vecGen: Gen[Seq[Double]] = for {
      dims <- Gen.oneOf(1, 3, 8, 64)
      v <- Gen.listOfN(dims, Gen.chooseNum(-1000000, 1000000)
        .map(_.toDouble / 10007.0))
    } yield v
    // zero-norm vectors are outside the cosine contract (under ANSI the
    // HOF divide throws where the kernel's Java division yields NaN)
    val pairs = sample(vecGen, 300)
      .map(v => if (v.forall(_ == 0.0)) 1.0 +: v.drop(1) else v)
      .map(v => (v, v.reverse))
    val rows = pairs.toDF("a", "b").select(
      SimilarityOps.dot(col("a"), col("b")).as("kd"),
      SimilarityOps.dotHof(col("a"), col("b")).as("hd"),
      SimilarityOps.cosine(col("a"), col("b")).as("kc"),
      SimilarityOps.cosineHof(col("a"), col("b")).as("hc")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact, no tolerance
      assert(r.getDouble(2) == r.getDouble(3))
    }
    // bucket's dims parameter must equal the vector length (the plane
    // table is indexed positionally) — fuzz it at fixed dims
    val v64 = sample(Gen.listOfN(64,
      Gen.chooseNum(-1000000, 1000000).map(_.toDouble / 10007.0)), 100)
    val brows = v64.map(Tuple1(_)).toDF("a").select(
      SimilarityOps.bucket(col("a"), 0, 64, 8).as("kb"),
      SimilarityOps.bucketHof(col("a"), 0, 64, 8).as("hb")).collect()
    brows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("approx scale mode: same types, near-identical winsorize stats at sf0.001") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity").cast("string").as("q"),
        col("l_extendedprice").cast("string").as("p"))
    val exact = AutoEtl.transform(li, EtlConfig.exact)
    val approx = AutoEtl.transform(li, EtlConfig(
      detectionSample = Some(0.5), approxPercentiles = true))
    assert(exact.columnTypes == approx.columnTypes)
    assert(exact.summary.totalRows == approx.summary.totalRows)
    val em = exact.summary.numericColumns("p").mean
    val am = approx.summary.numericColumns("p").mean
    assert(math.abs(em - am) / em < 0.05)
  }
}

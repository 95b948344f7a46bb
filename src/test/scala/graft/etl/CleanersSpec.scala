package graft.etl

import org.apache.spark.sql.functions._

/** C1/C2/C4 cleaner goldens: eurodecimals (trap P8), the three distinct
  * null-like sets (P6), title-case escapees (P2), CPython str.title vs
  * initcap divergence (P3).
  */
class CleanersSpec extends EtlSpecBase {
  import spark.implicits._

  private def runNumeric(in: Seq[String]): Seq[Option[Double]] = {
    in.toDF("s").select(Cleaners.cleanNumeric(col("s")).as("v"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
  }

  test("C1 numeric clean: strip/comma-to-dot/cast goldens") {
    val cases = Seq(
      "100.50"     -> Some(100.5),
      "200,75"     -> Some(200.75),
      "1,234.56"   -> None,          // comma->dot breaks it, like pandas ref
      "1.234,56"   -> None,
      "$ 1 200,50" -> Some(1200.5),
      "+3"         -> Some(3.0),
      "-17"        -> Some(-17.0),
      "1e3"        -> Some(13.0),    // 'e' stripped BEFORE cast: "13"
      "N/A"        -> None,          // strips to "" -> null
      "-.5"        -> Some(-0.5),
      "abc"        -> None,
      ""           -> None,
    )
    assert(runNumeric(cases.map(_._1)) == cases.map(_._2))
  }

  test("C2 text clean: trim + 8 null-like spellings; ws collapse gated") {
    val in = Seq("  John  ", "N/A", "n/a", "None", "NaN", "nan", "null", "NULL", "ok  x")
    val noCollapse = in.toDF("s")
      .select(Cleaners.cleanText(col("s"), collapseWhitespace = false).as("v"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(noCollapse == Seq(Some("John"), None, None, None, None, None, None, None, Some("ok  x")))
    val collapsed = Seq("a   b\t c").toDF("s")
      .select(Cleaners.cleanText(col("s"), collapseWhitespace = true).as("v"))
      .collect().head.getString(0)
    assert(collapsed == "a b c")
  }

  test("P3: pyTitle replicates CPython str.title(), not initcap") {
    val cases = Seq(
      "n/a"         -> "N/A",
      "hello world" -> "Hello World",
      "a-b"         -> "A-B",
      "3rd place"   -> "3Rd Place",
      "MIXED CaSe"  -> "Mixed Case",
      "o'neill"     -> "O'Neill",
      ""            -> "",
    )
    val got = cases.map(_._1).toDF("s")
      .select(PyText.pyTitle(col("s")).as("v")).collect().toSeq.map(_.getString(0))
    assert(got == cases.map(_._2))
  }

  test("P2: categorical null-likes checked AFTER title-casing") {
    val cases = Seq(
      "nan"   -> Some("Nan"),  // escapes the null map
      "NULL"  -> Some("Null"), // escapes
      "null"  -> Some("Null"), // escapes
      "n/a"   -> None,         // -> "N/A" -> caught
      "N/A"   -> None,
      "  ok " -> Some("Ok"),
      ""      -> None,
    )
    val got = cases.map(_._1).toDF("s")
      .select(Cleaners.cleanCategoricalBase(col("s")).as("v"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got == cases.map(_._2))
  }

  test("C4 rare fold: in-list to Other, empty set is identity") {
    val df = Seq("A", "B", "Rare1", "Rare2").toDF("s")
    val folded = df.select(Cleaners.foldRare(col("s"), Seq("Rare1", "Rare2")).as("v"))
      .collect().toSeq.map(_.getString(0))
    assert(folded == Seq("A", "B", "Other", "Other"))
    val id = df.select(Cleaners.foldRare(col("s"), Nil).as("v"))
      .collect().toSeq.map(_.getString(0))
    assert(id == Seq("A", "B", "Rare1", "Rare2"))
  }

  test("cleaners are idempotent on their own output (property smoke)") {
    val in = Seq("  x Y ", "100,5", "N/A", "a   b", "nan")
    val once = in.toDF("s").select(Cleaners.cleanText(col("s"), true).as("v"))
    val twice = once.select(Cleaners.cleanText(col("v"), true).as("v"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}

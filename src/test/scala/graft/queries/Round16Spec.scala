package graft.queries

import org.apache.spark.sql.functions._

/** Round-16 units: the q400 disjoint-vocabulary closed form and the
  * MatchOps short-string generator guards (ADVICE r15). */
class Round16Spec extends PlantedQuerySpec {

  import spark.implicits._

  private val Ln2Micro = 693147L

  test("q400: a disjoint-vocabulary source pair emits the closed-form " +
    "kl = js = ln 2 row instead of vanishing") {
    val docs = Seq(
      (1L, "a a b", "en", "s1", 5L),   // s1 and s2 share a, b
      (2L, "a b b b", "en", "s2", 7L),
      (3L, "x y z", "en", "s3", 5L))   // s3 shares NOTHING
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = plant("documents" -> docs)
    val got = run("q400_js_divergence", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // all three pairs present; both s3 pairs are maximally divergent
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("s1", "s2"), ("s1", "s3"), ("s2", "s3")), got.toSeq.toString)
    got.filter(_._2 == "s3").foreach { t =>
      assert(t._3 == Ln2Micro && t._4 == Ln2Micro && t._5 == Ln2Micro,
        t.toString)
    }
    // and the shared pair is strictly less divergent than ln 2
    val shared = got.find(t => t._1 == "s1" && t._2 == "s2").get
    assert(shared._5 > 0L && shared._5 < Ln2Micro, shared.toString)
  }

  test("deletionVariants01/2: short strings emit no junk variants " +
    "(descending-sequence guard)") {
    val df = Seq("", "a", "ab").toDF("name")
    val v01 = df.select(col("name"),
        graft.ops.MatchOps.deletionVariants01("name").as("v"))
      .select(col("name"), size(col("v")).as("n"),
        // every non-identity variant must carry a REAL position >= 1
        size(filter(col("v"), x =>
          x.getField("p1") =!= -1 && x.getField("p1") < 1)).as("junk"))
      .as[(String, Int, Int)].collect()
      .map { case (k, n, j) => k -> ((n, j)) }.toMap
    // "" -> identity only; "a" -> identity + 1 deletion; "ab" -> identity + 2
    assert(v01("") == ((1, 0)) && v01("a") == ((2, 0)) && v01("ab") == ((3, 0)),
      v01.toString)
    val v2 = df.select(col("name"),
        size(graft.ops.MatchOps.deletionVariants2("name")).as("n"))
      .as[(String, Int)].collect().toMap
    // L(L-1)/2: 0 for "" and "a", 1 for "ab"
    assert(v2("") == 0 && v2("a") == 0 && v2("ab") == 1, v2.toString)
  }

  test("globalNtile matches Spark's ntile exactly: remainder spread, " +
    "ties, n < k, desc") {
    import org.apache.spark.sql.expressions.Window
    // 23 rows over 10 tiles (n mod k = 3 -> first 3 tiles take 3 rows),
    // with value ties broken by id; also exercises n < k via the slice
    val rows = Seq.tabulate(23)(i => ((i * 7 + 3) % 5 * 10L, i.toLong))
    for ((n, k) <- Seq((23, 10), (7, 10), (20, 4))) {
      val df = rows.take(n).toDF("v", "id")
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
        .select("id", "t").as[(Long, Long)].collect().toMap
      val got = graft.ops.LayoutOps.globalNtile(df, "v", "id", k, "t",
          desc = true, nBuckets = 4)
        .select("id", "t").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k: $got vs $want")
    }
  }

  test("censusCum desc with tie column matches the plain global window") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((30L, 1L, 5L), (30L, 2L, 7L), (10L, 3L, 1L),
      (20L, 4L, 2L), (20L, 5L, 4L), (40L, 6L, 9L))
      .toDF("v", "pk", "m")
    val w = Window.orderBy(col("v").desc, col("pk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum(col("m")).over(w))
      .select("pk", "cum").as[(Long, Long)].collect().toMap
    val got = graft.ops.LayoutOps.censusCum(df, "v", Seq("m"),
        inclusive = true, desc = true, tieCol = Some("pk"), nBuckets = 3)
      .select(col("pk"), col("__cum_m")).as[(Long, Long)].collect().toMap
    assert(got == want, s"$got vs $want")
  }

  test("deletionBestMatch: 1-char names link exactly without the 2-del " +
    "junk tier firing") {
    val dirty = Seq((1L, "a"), (2L, "zq")).toDF("id", "name")
    val clean = Seq((10L, "a"), (11L, "ab"), (12L, "xyzw"))
      .toDF("id", "name")
    val got = graft.ops.MatchOps.deletionBestMatch(dirty, clean)
      .as[(Long, Long, Long)].collect().toSeq
    // "a" -> exact 10 at 0; "zq" is ed 2 from BOTH "a" (substitute +
    // delete) and "ab" (two substitutions) -> tie breaks to rid 10
    assert(got == Seq((1L, 10L, 0L), (2L, 10L, 2L)), got.toString)
  }
}

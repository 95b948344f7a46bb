package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 fourth wave: q393 — domain-agnostic fuzzy-match blocking
  * (the scale path MatchOps' scaladoc promised for q105), made real
  * and gated by q105's OWN oracle.
  *
  * The obvious candidate — q-gram prefix filtering — was built first
  * and MEASURED OUT: these names share a long boilerplate prefix
  * ("Customer#000..."), so each name has too few rare grams and the
  * ubiquitous grams land inside every prefix — 1.06e9 candidate pairs
  * at sf0.1 (the prefix bound q*d+1 = 9 exceeds the ~6 distinctive
  * grams a name has). Deletion-neighborhood signatures (FastSS) don't
  * care about shared affixes: a signature is a near-complete string,
  * so it always carries the distinguishing characters.
  */
object Round14dQueries {

  // -- q393: fuzzy match via deletion-neighborhood join -------------------------------
  // Every name emits its <=2-deletion variants (1 + L + L(L-1)/2 ~ 172
  // signatures at L = 18); ed(s, t) <= 2 implies the variant sets
  // intersect (delete the edited positions from each side), so an
  // equi-join on the variant string is a recall-LOSSLESS candidate
  // generator with no blocking key to design. Candidates dedup to id
  // pairs before the thresholded levenshtein verify; the best-match
  // window is q105's. Scale shape: a constant ~172x map-side
  // expansion + ONE string-keyed equi-join whose groups are tiny
  // because every signature retains the distinguishing characters —
  // the skew that killed the q-gram prefix join cannot form.
  // variants carry their sorted deleted POSITIONS (-1 = unused): on
  // low-entropy strings (dense digits here) bare FastSS over-matches
  // badly — two keys sharing any 7-of-9-digit subsequence collide
  // (34.7M candidate pairs measured at sf0.1). In a TRUE ed<=2
  // alignment the i-th deleted position on each side marks the same
  // edit point, so sorted positions match pairwise within the net
  // indel shift (<= 2); requiring that as a join residual kills the
  // subsequence junk without touching recall.
  private def variants(nameCol: String): Column = expr(
    s"flatten(array(" +
      s" array(struct($nameCol AS s, -1 AS p1, -1 AS p2))," +
      s" transform(sequence(1, length($nameCol)), i ->" +
      s"   struct(concat(substring($nameCol, 1, i-1)," +
      s"     substring($nameCol, i+1, length($nameCol))) AS s," +
      s"     i AS p1, -1 AS p2))," +
      s" flatten(transform(sequence(1, length($nameCol) - 1), i ->" +
      s"   transform(sequence(i + 1, length($nameCol)), j ->" +
      s"     struct(concat(substring($nameCol, 1, i-1)," +
      s"       substring($nameCol, i+1, j-i-1)," +
      s"       substring($nameCol, j+1, length($nameCol))) AS s," +
      s"       i AS p1, j AS p2))))))")

  // sound alignment-compatibility of two sorted deletion-position
  // lists (sizes 0..2, -1-padded): empty lists always pass (one-sided
  // indel scripts); singletons must sit within the shift bound of ONE
  // of the other side's entries; (2,2) matches pairwise in order.
  private def compat(a1: Column, a2: Column, b1: Column, b2: Column): Column = {
    def near(x: Column, y: Column) = abs(x - y) <= 2
    val aSize = when(a1 === -1, 0).when(a2 === -1, 1).otherwise(2)
    val bSize = when(b1 === -1, 0).when(b2 === -1, 1).otherwise(2)
    aSize === 0 || bSize === 0 ||
      (aSize === 1 && bSize === 1 && near(a1, b1)) ||
      (aSize === 1 && bSize === 2 && (near(a1, b1) || near(a1, b2))) ||
      (aSize === 2 && bSize === 1 && (near(a1, b1) || near(a2, b1))) ||
      (aSize === 2 && bSize === 2 && near(a1, b1) && near(a2, b2))
  }

  // The argmin over (dist, rid) is settled TIER BY TIER: a row with a
  // dist-0 candidate needs every dist-0 candidate (rid ties) but NO
  // deeper search; likewise dist 1. On dense data almost everything
  // resolves in the cheap tiers — an exact-string join, then a
  // one-deletion join — and only the residue pays the full <=2
  // neighborhood against the (one) full clean index. On sparse data
  // the tiers are all small. This is the spatial topKWithin
  // resolve-early discipline applied to edit distance.
  private def q393(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.read(spark, sfDir, "customer")
    val clean = c.select(col("c_custkey").as("id"),
      col("c_name").as("name")).localCheckpoint(true)
    val dirty = c.select(col("c_custkey").as("id"),
      Round7cQueries.dirtyName(col("c_name"), col("c_custkey"))
        .as("name")).localCheckpoint(true)
    def best(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy("id").orderBy(col("dist"), col("rid"))
      cand.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("id"), col("rid").as("match_id"),
          col("dist").cast("long").as("dist"))
    }
    def sigs(df: DataFrame, idAs: String, maxDel: Int) = df
      .select(col("id").as(idAs), explode(variants("name")).as("v"))
      .where(if (maxDel >= 2) lit(true) else col("v.p2") === -1)
      .select(col(idAs), xxhash64(col("v.s")).as("sig"),
        col("v.p1").as(s"${idAs}_p1"), col("v.p2").as(s"${idAs}_p2"))
    def verified(a: DataFrame, maxDel: Int): DataFrame = a
      .join(sigs(clean, "rid", maxDel).hint("shuffle_hash"), "sig")
      .where(compat(col("id_p1"), col("id_p2"),
        col("rid_p1"), col("rid_p2")))
      .select(col("id"), col("rid")).distinct()
      .join(dirty.select(col("id"), col("name")), "id")
      .join(clean.select(col("id").as("rid"), col("name").as("rname")),
        "rid")
      .select(col("id"), col("rid"),
        levenshtein(col("name"), col("rname"), 2).as("dist"))
    // tier 0: identical strings (all dist-0 candidates, complete)
    val t0 = dirty
      .join(clean.select(col("id").as("rid"), col("name")), "name")
      .select(col("id"), col("rid"), lit(0).as("dist"))
      .localCheckpoint(true)
    val rem1 = dirty.join(t0.select("id").distinct(), Seq("id"),
      "left_anti")
    // tier 1: one-deletion neighborhood — complete for dist <= 1
    val t1 = verified(sigs(rem1, "id", 1), 1).where(col("dist") === 1)
      .localCheckpoint(true)
    val rem2 = rem1.select("id", "name")
      .join(t1.select("id").distinct(), Seq("id"), "left_anti")
    // tier 2: the full <=2-deletion neighborhood for the residue
    val t2 = verified(sigs(rem2, "id", 2), 2)
      .where(col("dist") >= 0 && col("dist") <= 2)
    best(t0).unionAll(best(t1)).unionAll(best(t2)).orderBy("id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q393_fuzzy_deletion_join", q393,
      Some(Round7cQueries.q105Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MatchOps

/** Round-14 fourth wave: q393 — domain-agnostic fuzzy-match blocking
  * (the scale path MatchOps' scaladoc promised for q105), made real
  * and gated by q105's OWN oracle. Since round 15 the machinery lives
  * in [[MatchOps.deletionBestMatch]] (it is q105's default path now);
  * q393 stays registered as the always-on gate twin.
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
  // Gated by q105's right(name,3)-blocked oracle. The equivalence is
  // fixture-dependent (ADVICE r14): it holds because both planted typo
  // classes act strictly left of the last-3 suffix AND no out-of-block
  // candidate at dist<=2 beats an in-block best on TPC-H key-shaped
  // names (verified by brute force at sf0.01/sf0.1). The deletion path
  // is recall-LOSSLESS, the blocked oracle is not — so a future
  // fixture change that breaks either property fails this gate loudly
  // rather than silently, which is the point of keeping it.
  private[queries] def q393(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.read(spark, sfDir, "customer")
    val clean = c.select(col("c_custkey").as("id"),
      col("c_name").as("name"))
    val dirty = c.select(col("c_custkey").as("id"),
      Round7cQueries.dirtyName(col("c_name"), col("c_custkey"))
        .as("name"))
    MatchOps.deletionBestMatch(dirty, clean)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q393_fuzzy_deletion_join", q393,
      Some(Round7cQueries.q105Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.MatchOps

/** Round-14 fourth wave: q393 — the q-gram prefix-filter blocking that
  * MatchOps' scaladoc promised as q105's 100 TB path, made real and
  * gated by q105's OWN oracle (the blocking is recall-lossless for
  * edit distance <= 2 on these name lengths, so the best-match table
  * is bit-identical).
  */
object Round14dQueries {

  // -- q393: fuzzy match via q-gram prefix blocking ----------------------------------
  // q105 re-run with NO domain-knowledge block key: candidates come
  // from shared RARE 4-grams under the prefix-filter bound. Two names
  // within edit distance d share all but <= q*d distinct grams (an
  // edit destroys at most q gram occurrences), so with every name
  // keeping its q*d+1 = 9 globally-rarest grams (one global (df, gram)
  // order), any true pair shares a kept gram — the PPJoin argument
  // (q201) applied to edit distance. The ubiquitous "Customer#" grams
  // rank most frequent and never enter a prefix, which is exactly how
  // the skew that would break naive q-gram joins self-resolves; q = 4
  // (not 3) because these digit-heavy names saturate the trigram
  // domain and gram selectivity is the whole filter. The gram-rank
  // window runs over the DISTINCT-GRAM census — bounded by the
  // alphabet^q, not the data.
  private val QgramPrefix = 9

  private def grams(nameCol: String): Column = array_distinct(
    expr(s"transform(sequence(1, greatest(length($nameCol) - 3, 1))," +
      s" i -> substring($nameCol, i, 4))"))

  private def prefixGrams(df: DataFrame, rank: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy("grk")
    df.select(col("id"), explode(grams("name")).as("gram"))
      .join(rank, "gram")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= QgramPrefix)
      .select(col("id"), col("gram"))
  }

  private def q393(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.read(spark, sfDir, "customer")
    val clean = c.select(col("c_custkey").as("id"),
      col("c_name").as("name"))
    val dirty = c.select(col("c_custkey").as("id"),
      Round7cQueries.dirtyName(col("c_name"), col("c_custkey"))
        .as("name"))
    // one global (df, gram) order over BOTH sides' distinct grams
    val rank = dirty.unionAll(clean)
      .select(col("id"), explode(grams("name")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .withColumn("grk", row_number().over(
        Window.orderBy(col("df"), col("gram"))).cast("long"))
      .select(col("gram"), col("grk"))
      .localCheckpoint(true) // both prefix passes
    val cand = prefixGrams(dirty, rank)
      .join(prefixGrams(clean, rank)
        .select(col("id").as("rid"), col("gram")), "gram")
      .select(col("id"), col("rid")).distinct()
    val pairs = cand
      .join(dirty.select(col("id"), col("name")), "id")
      .join(clean.select(col("id").as("rid"), col("name").as("rname")),
        "rid")
      .select(col("id"), col("rid"),
        levenshtein(col("name"), col("rname"), 2).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= 2)
    val best = Window.partitionBy("id").orderBy(col("dist"), col("rid"))
    pairs.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("id"), col("rid").as("match_id"),
        col("dist").cast("long").as("dist"))
      .orderBy("id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q393_fuzzy_qgram", q393, Some(Round7cQueries.q105Oracle)),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Round-11 ninth wave: personalized PageRank and the asymmetric
  * (containment) exact similarity join.
  */
object Round11iQueries {

  // -- q215: personalized PageRank -------------------------------------------
  // Random-walk-with-restart relevance to a customer cohort over the
  // undirected trade graph (q150's edges): teleport mass returns only
  // to the custkey % 100 == 1 seeds, so the top-25 ranked nodes are
  // the suppliers/customers most entangled with that cohort — the
  // graph-recommendation primitive q108's global rank can't express.
  // Integer-grid iteration, one edge shuffle per round, TakeOrdered
  // output — see [[GraphOps.personalizedPageRank]].
  private def q215(spark: SparkSession, sfDir: String): DataFrame = {
    val trade = Tables.read(spark, sfDir, "orders")
      .join(Tables.read(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = trade.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(trade.select(col("s").as("src"), col("c").as("dst")))
    val seeds = trade.where(col("c") % 200 === 2)
      .select(col("c").as("node")).distinct()
    GraphOps.personalizedPageRank(edges, seeds)
  }

  private val q215Oracle: String = {
    val trade =
      """SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
    GraphOps.personalizedPageRankSql(
      s"""SELECT c AS src, s AS dst FROM ($trade)
         |UNION ALL SELECT s AS src, c AS dst FROM ($trade)""".stripMargin,
      s"SELECT DISTINCT c AS node FROM ($trade) WHERE c % 200 = 2")
  }

  // -- q216: containment (asymmetric) similarity join ------------------------
  // The snippet-reuse detector q201's symmetric Jaccard misses: doc a
  // is CONTAINED in doc b when |Sa ∩ Sb| / |Sa| ≥ 4/5 — a short quote
  // inside a long doc scores high containment but low Jaccard.
  // Candidate generation keeps the zero-false-negative guarantee with
  // the asymmetric prefix bound: if containment ≥ t, b must hold one
  // of a's first `na − ⌈t·na⌉ + 1` tokens under the global
  // rarest-first order — so a's PREFIX tokens (rare by construction,
  // hence short postings) probe b's FULL token index, never
  // prefix×prefix (which is only sound for the symmetric join) and
  // never all-pairs. ⌈4n/5⌉ = (4n+4) div 5 keeps the bound in
  // integers. Both (a in b) and (b in a) directions emerge naturally
  // as ordered pairs.
  private def q216(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = ExtQueries.nearDupCorpus(spark, sfDir)
      .select(col("doc_id").as("id"),
        graft.ops.DedupOps.shingleHashes(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("id"), col("toks"), size(col("toks")).as("n"))
      .localCheckpoint(true) // freq census, prefix build, index, verify
    val toks = docs.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("tok").asc)
    val prefix = toks.join(freq, "tok")
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select(col("tok"), col("id"))
    val cands = prefix.select(col("tok"), col("id").as("id_a"))
      .join(toks.select(col("tok"), col("id").as("id_b")), "tok")
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = docs.select(col("id"), col("toks"), col("n"))
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta"),
        col("n").as("na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ta"), col("tb"))).cast("long") * 1000000L)
          .as("__i6"), col("na"))
      .select(col("id_a"), col("id_b"),
        expr("__i6 div na").as("cont_ppm"))
      .where(col("cont_ppm") >= 800000L)
      .orderBy("id_a", "id_b")
  }

  private val q216Oracle: String =
    s"""WITH corpus AS (${ExtQueries.nearDupCorpusSql}),
       |docs AS (SELECT id, ${graft.ops.DedupOps.shingleHashesSql("text")} AS toks
       |  FROM corpus),
       |d AS (SELECT id, toks, len(toks) AS n FROM docs WHERE len(toks) > 0),
       |t AS (SELECT id, n, unnest(toks) AS tok FROM d),
       |f AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
       |p AS (SELECT tok, id FROM (
       |    SELECT t.tok, t.id, t.n,
       |      row_number() OVER (PARTITION BY t.id ORDER BY f.df, t.tok) AS pos
       |    FROM t JOIN f USING (tok))
       |  WHERE pos <= n - (4 * n + 4) // 5 + 1),
       |c AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM p a JOIN t b ON a.tok = b.tok AND a.id <> b.id),
       |v AS (SELECT id_a, id_b,
       |    CAST(len(list_intersect(da.toks, db.toks)) AS BIGINT) * 1000000 AS i6,
       |    da.n AS na
       |  FROM c JOIN d da ON c.id_a = da.id JOIN d db ON c.id_b = db.id)
       |SELECT id_a, id_b, CAST(i6 // na AS BIGINT) AS cont_ppm
       |FROM v WHERE i6 // na >= 800000
       |ORDER BY id_a, id_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q215_ppr_cohort", q215, Some(q215Oracle)),
    QueryDef("q216_containment_join", q216, Some(q216Oracle)))
}

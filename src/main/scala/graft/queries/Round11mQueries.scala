package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, MixOps}

/** Round-11 thirteenth wave: the level-3 frequent-itemset lattice and
  * grouped K-fold assignment with a leakage audit.
  */
object Round11mQueries {

  // -- q225: frequent supplier triples (Apriori level 3) ---------------------
  // q151 stops at pairs; this climbs the lattice one level: frequent
  // {a,b,c} supplier triples over order baskets — the co-supply
  // bundles. The cubic fan-out is bounded the q151 way but TIGHTER
  // (baskets of 3..12 items only: a 12-item basket yields 220
  // triples, the documented cap-as-contract; parts were measured
  // support-dry at sf0.1 where suppliers stay dense, so the basket
  // item is l_suppkey). Expansion is a pure map-side generator over
  // the sorted basket arrays (a < b < c free), census is ONE
  // combining aggregate, top-25 ships via TakeOrdered. The level-2
  // Apriori prune (only candidates whose three sub-pairs are
  // frequent) was evaluated and left out deliberately: at min-support
  // 2 on this fixture virtually every pair clears the floor (the
  // q151 adaptive-prune census measured the same), so the three
  // semi-joins would be pure overhead — the basket cap is the binding
  // constraint. At production min-support fractions, reintroduce it
  // exactly as q151 does.
  private val TriMin = 2L
  private val TriMaxItems = 12
  private val TriTopK = 25

  private def q225(spark: SparkSession, sfDir: String): DataFrame = {
    val baskets = GraphOps.cappedBaskets(
      Tables.read(spark, sfDir, "lineitem"),
      col("l_orderkey"), col("l_suppkey"), TriMaxItems)
      .where(size(col("ps")) >= 3)
    val ps = col("ps")
    val triples = flatten(flatten(transform(
      sequence(lit(1), size(ps) - 2), i =>
        transform(sequence(i + 1, size(ps) - 1), j =>
          transform(sequence(j + 1, size(ps)), k =>
            struct(element_at(ps, i).as("a"), element_at(ps, j).as("b"),
              element_at(ps, k).as("c")))))))
    baskets
      .select(explode(triples).as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= TriMin)
      .orderBy(col("support").desc, col("a").asc, col("b").asc, col("c").asc)
      .limit(TriTopK)
  }

  private val q225Oracle: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS pk
       |  FROM lineitem),
       |b AS (SELECT ok, list_sort(list(pk)) AS ps FROM items
       |  GROUP BY ok HAVING count(*) BETWEEN 3 AND $TriMaxItems),
       |e AS (SELECT ps, unnest(range(1, len(ps) + 1)) AS i FROM b),
       |e2 AS (SELECT ps, i, unnest(range(i + 1, len(ps) + 1)) AS j FROM e),
       |e3 AS (SELECT ps, i, j, unnest(range(j + 1, len(ps) + 1)) AS k
       |  FROM e2),
       |t AS (SELECT ps[CAST(i AS INT)] AS a, ps[CAST(j AS INT)] AS b2,
       |    ps[CAST(k AS INT)] AS c
       |  FROM e3)
       |SELECT a, b2 AS b, c, count(*) AS support
       |FROM t GROUP BY 1, 2, 3 HAVING count(*) >= $TriMin
       |ORDER BY support DESC, a, b, c LIMIT $TriTopK""".stripMargin

  // -- q226: grouped K-fold assignment + leakage audit -----------------------
  // Cross-validation where rows of one user must NEVER straddle folds
  // (the leakage that inflates every session-level model's CV score):
  // fold = two-round hash of the GROUP key, so the guarantee is by
  // construction — and the query AUDITS it anyway (n_spanning counted
  // from per-group distinct-fold censuses, provably 0) alongside the
  // per-fold balance a practitioner actually checks. One user-keyed
  // census shuffle; everything after is fold-grain.
  private val KfSeed = 97L
  private val KFolds = 5

  private def q226(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.read(spark, sfDir, "events")
      .select(col("user_id"),
        (MixOps.portableHash2(col("user_id"), KfSeed) % KFolds).as("fold"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("fold")).as("nf"), max(col("fold")).as("fold"))
      .localCheckpoint(true) // feeds the span audit AND the fold census
    val spanning = perUser.agg(
      sum(when(col("nf") > 1, 1L).otherwise(0L)).as("n_spanning"),
      sum(col("n_rows")).as("n_total"))
    perUser.groupBy("fold")
      .agg(count(lit(1)).as("n_groups"), sum(col("n_rows")).as("n_rows"))
      .crossJoin(broadcast(spanning))
      .select(col("fold"), col("n_groups"), col("n_rows"),
        expr("n_rows * 1000000 div n_total").as("rows_ppm"),
        col("n_spanning"))
      .orderBy("fold")
  }

  private val q226Oracle: String = {
    val h = s"((((user_id % ${MixOps.P} + $KfSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH a AS (SELECT user_id, ($h) % $KFolds AS fold FROM events),
       |u AS (SELECT user_id, count(*) AS n_rows,
       |    count(DISTINCT fold) AS nf, max(fold) AS fold
       |  FROM a GROUP BY 1),
       |s AS (SELECT CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_spanning, CAST(sum(n_rows) AS BIGINT) AS n_total
       |  FROM u)
       |SELECT fold, count(*) AS n_groups,
       |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
       |  CAST(sum(n_rows) * 1000000 // s.n_total AS BIGINT) AS rows_ppm,
       |  s.n_spanning
       |FROM u CROSS JOIN s
       |GROUP BY fold, s.n_total, s.n_spanning
       |ORDER BY fold""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q225_supplier_triples", q225, Some(q225Oracle)),
    QueryDef("q226_group_kfold", q226, Some(q226Oracle)))
}

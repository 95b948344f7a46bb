package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation: pre-aggregate on
  * (key, salt) so a key owning 30% of a 100 TB table spreads over
  * `salts` reducers, then combine partials per key. Correct for any
  * associative aggregate (counts/sums here); verified equivalent to
  * the direct groupBy by the t2 oracle (q40).
  *
  * (AQE's skew handling covers JOINS; aggregation skew still wants the
  * salt when one group key dominates — partial aggregation helps only
  * until the map side runs out of distinct (key, salt) slots.)
  */
object SkewOps {

  def saltedAgg(df: DataFrame, key: String, salts: Int,
      sums: Seq[(String, String)]): DataFrame = {
    // deterministic salt (row-content based, not rand()) keeps the op
    // reproducible and restart-safe
    val salted = df.withColumn("__salt",
      pmod(hash(sums.map(c => col(c._1)) :+ col(key): _*), lit(salts)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sums.map { case (c, as) => sum(col(c)).as(s"__s_$as") }: _*)
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        sums.map { case (_, as) => sum(col(s"__s_$as")).as(as) }: _*)
  }

  /** Skew-safe equi-join: the manual salting recipe for when one join
    * key owns a partition-breaking share of the big side. Big rows get
    * a deterministic per-row salt; the small side is replicated once
    * per salt value, so the hot key's rows spread over `salts` tasks
    * while the join result is exactly the plain inner join (every big
    * row finds its small-side match at its own salt). Cost: small side
    * shuffles `salts` times — keep `salts` modest and the small side
    * small. (AQE's skew-join split covers sort-merge cases at runtime;
    * the explicit salt is the portable recipe and also works where AQE
    * can't re-plan, e.g. under a required distribution.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    // position-based salt, NOT content-based: byte-identical rows (the
    // classic skew case — repeated log/event rows) must still spread
    // over `salts` tasks, and any salt value joins correctly because
    // the small side carries all of them. monotonically_increasing_id
    // is a pure function of (partition id, row position), so it is
    // stable under task retry for a deterministic input partitioning.
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val smallR = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallR, Seq(key, "__salt")).drop("__salt")
  }
}

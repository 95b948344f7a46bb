package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross
  *    join of the (small) query set against the corpus. This is the
  *    correctness baseline and, with a broadcast query side, also the
  *    right 100 TB shape for "few queries vs huge corpus" (one scan,
  *    no shuffle of the corpus; per-partition top-k then a tiny final
  *    merge via the window).
  *  - [[annTopK]] — random-hyperplane LSH: bucket signatures per
  *    table, candidates = bucket collisions, exact cosine re-rank.
  *    At scale this replaces the full scan with a (bucket, table)
  *    shuffle join — the classic sub-linear ANN trade.
  *
  * All float math is done in DOUBLE after an explicit element cast
  * (DuckDB promotes float lists differently), and ranking happens on
  * cosine ROUNDED to 4 decimals with an id tiebreak, so both engines
  * rank identically despite last-ulp summation differences.
  */
object SimilarityOps {

  /** Elementwise float→double cast. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** HOF forms: the executable spec of the vector math (interpreted
    * per element — hot paths use the [[VectorKernels]] StaticInvoke
    * twins below; OpsSpec pins kernel == HOF).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Kernel-backed dot product (inputs must already be array<double>). */
  def dot(a: Column, b: Column): Column = ExprBridge.column(StaticInvoke(
    VectorKernels.getClass, DoubleType, "dot",
    Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
    Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
    propagateNull = true, returnNullable = true))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Kernel-backed one-pass cosine. Zero-norm inputs are outside the
    * contract: the kernel's Java division yields NaN where the HOF
    * spec form throws under ANSI mode.
    */
  def cosine(a: Column, b: Column): Column = ExprBridge.column(StaticInvoke(
    VectorKernels.getClass, DoubleType, "cosine",
    Seq(ExprBridge.expression(a), ExprBridge.expression(b)),
    Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
    propagateNull = true, returnNullable = true))

  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), __i -> ($a)[__i] * ($b)[__i])) AS DOUBLE)"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Rounded cosine used for ranking (see class doc). */
  private def cos4(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d)

  /** Exact cosine top-k: for every query vector, the k nearest corpus
    * vectors (self excluded). Query side is broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  // ---- random-hyperplane LSH -------------------------------------------

  /** Deterministic pseudo-random hyperplane coefficient for
    * (table t, bit b, dim i): exact integer mixing, then one exact
    * division — bit-identical in any IEEE engine.
    */
  def planeCoef(t: Int, b: Int, i: Int, dims: Int, bits: Int): Double = {
    val x = (((t.toLong * bits + b) * dims + i + 1L) * 2654435761L) % 2147483647L
    x.toDouble / 2147483647.0 - 0.5
  }

  /** Bucket signature for one LSH table: an int whose bit b is the
    * sign of the projection onto hyperplane (t, b). HOF spec form.
    */
  def bucketHof(v: Column, t: Int, dims: Int, bits: Int): Column =
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(v, array((0 until dims).map(i => lit(planeCoef(t, b, i, dims, bits))): _*),
          (x, p) => x * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Kernel-backed bucket signature (input must be array<double>). */
  def bucket(v: Column, t: Int, dims: Int, bits: Int): Column =
    ExprBridge.column(StaticInvoke(
      VectorKernels.getClass, LongType, "bucket",
      Seq(ExprBridge.expression(v), Literal(t), Literal(dims), Literal(bits)),
      Seq(ArrayType(DoubleType), IntegerType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  def bucketSql(vE: String, t: Int, dims: Int, bits: Int): String = {
    val terms = (0 until bits).map { b =>
      val planes = (0 until dims).map(i => planeCoef(t, b, i, dims, bits)).mkString("[", ", ", "]")
      s"CASE WHEN CAST(list_sum(list_transform(range(1, $dims + 1), __i -> ($vE)[__i] * ($planes)[__i])) AS DOUBLE) > 0 THEN ${1L << b} ELSE 0 END"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Embedding near-duplicate pairs: hyperplane-LSH bucket candidates
    * self-joined per table, verified with exact rounded cosine >=
    * `threshold`. Identical vectors share identical signatures, so
    * exact duplicates are found with guaranteed recall; near-dups
    * follow the usual LSH recall curve.
    */
  def nearDupPairs(
      corpus: DataFrame, threshold: Double,
      tables: Int = 2, bits: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .select(col("vec_id"), col("v"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucket(col("v"), t, dims, bits).as("bk"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cand = b.select(col("t"), col("bk"), col("vec_id").as("id_a"), col("v").as("va"))
      .join(b.select(col("t"), col("bk"), col("vec_id").as("id_b"), col("v").as("vb")),
        Seq("t", "bk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"), cos4(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** IVF-style ANN: the first `nCentroids` corpus vectors (by id) act
    * as a deterministic coarse quantizer. Assignment is ONE map-side
    * projection — the centroids are collected (bounded by
    * `nCentroids`) and inlined as literals, so each row costs
    * `nCentroids` kernel cosines and the corpus never shuffles for
    * assignment. Queries probe their `nprobe` nearest cells;
    * candidates = cell collisions; exact rounded-cosine re-rank.
    *
    * vs [[annTopK]] (random hyperplanes): IVF cells adapt to the data
    * distribution — the classic trade is better recall per probe on
    * clustered embeddings, at the cost of a (tiny) training/collect
    * step. Ties and ranking use the same rounded-cosine + id ordering
    * as the rest of the module, so the DuckDB oracle replicates cell
    * assignment bit-for-bit.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 8, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cents: Array[(Long, Seq[Double])] = c.orderBy("vec_id").limit(nCentroids)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def cellStructs(vec: Column) = array(cents.map { case (cid, cv) =>
      struct((-cos4(vec, typedLit(cv))).as("nc"), lit(cid).as("cid"))
    }: _*)
    val assigned = c.select(col("vec_id"), col("v"),
      element_at(array_sort(cellStructs(col("v"))), 1).getField("cid").as("cell"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(slice(array_sort(cellStructs(col("qv"))), 1, nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cid").as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** ANN top-k: LSH-bucket candidates (any of `tables` tables), exact
    * cosine re-rank. Recall < 1 by design; the oracle replicates the
    * same buckets so results still match exactly.
    */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 2, bits: Int = 8, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String) = {
      val base = df.select(col(idCol).as(id), asDouble(col(vecCol)).as(vec))
      base.select(col(id), col(vec), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucket(col(vec), t, dims, bits).as("bk"))): _*)).as("tb"))
        .select(col(id), col(vec), col("tb.t").as("t"), col("tb.bk").as("bk"))
    }
    val c = withBuckets(corpus, "vec_id", "v")
    val q = withBuckets(queries, "query_id", "qv")
    val cand = c.join(broadcast(q), Seq("t", "bk"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cand.select(col("query_id"), col("vec_id"), cos4(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }
}

package graft.queries

import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TextKernels

/** Hand-computed / plain-Scala-model units for q335-q338. */
class Round13hSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q335 nearest centroid: hand-computed 2-D centroids incl. a " +
    "NEGATIVE dim sum (trunc-div pin) and one true misclassification") {
    val dir = plant("embeddings" -> Seq(
      (0L, Seq(-1.0f, 0.0f), 0), (1L, Seq(-0.5f, 2.0f), 0),
      (2L, Seq(1.0f, 1.0f), 0),
      (3L, Seq(2.0f, 0.0f), 1), (4L, Seq(2.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label"))
    // c0 = [-(5000 div 3), 10000] = [-1666, 10000] (trunc, NOT floor);
    // c1 = [20000, 10000]. Vec 2 ([10000,10000]): d0 = 11666² =
    // 136095556 > d1 = 1e8 -> predicted 1 (a real misclassification).
    val got = run("q335_nearest_centroid", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L), (1L, 1L, 2L)),
      got.mkString(", "))
  }

  test("q336 CDC chunking: matches a plain-Scala chunker over the real " +
    "kernel hash; identical twin docs double chunks but not distincts") {
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa" +
      " lambda mu nu xi omicron pi rho sigma tau upsilon"
    val textB = "one two three four five six seven eight nine ten"
    val dir = plant("documents" -> Seq(
      (1L, "s1", textA), (2L, "s1", textA), // twins: all chunks dup
      (3L, "s2", textB))
      .toDF("doc_id", "source", "text"))
    def model(texts: Seq[String]): (Long, Long, Long, Long) = {
      val chunks = texts.flatMap { t =>
        val hs = t.trim.split("\\s+").toSeq
          .map(w => TextKernels.tokenHash(UTF8String.fromString(w)))
        val withPos = hs.zipWithIndex.map { case (h, i) => (i + 1L, h) }
        var cid = 0L
        withPos.map { case (p, h) =>
          if (p == 1 || h % 16 == 0) cid += 1
          (cid, p, h)
        }.groupBy(_._1).values.map { g =>
          val minp = g.map(_._2).min
          val fp = g.map(x => x._2 * x._3).sum - (minp - 1) * g.map(_._3).sum
          (g.size.toLong, fp)
        }
      }
      val n = chunks.size.toLong
      val nd = chunks.map(_._2).distinct.size.toLong
      val nt = chunks.map(_._1).sum
      (n, nd, (n - nd) * 1000000L / n, nt * 1000L / n)
    }
    val (n1, d1, dup1, tpc1) = model(Seq(textA, textA))
    val (n2, d2, dup2, tpc2) = model(Seq(textB))
    assert(dup1 >= 500000L) // twins: at least half the chunks are dups
    assert(dup2 == 0L)
    val got = run("q336_cdc_chunking", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("s1", n1, d1, dup1, tpc1), ("s2", n2, d2, dup2, tpc2)),
      got.mkString(", "))
  }

  test("q337 k-center greedy: hand-traced 1-D farthest-point walk with " +
    "a radius tie resolved to the smaller id") {
    val pts = Seq(0.0f, 1.0f, 10.0f, 4.0f, 6.0f, 2.5f, 9.0f, 0.2f)
    val dir = plant("embeddings" -> pts.zipWithIndex
      .map { case (x, i) => (i.toLong, Seq(x)) }.toDF("vec_id", "embedding"))
    val got = run("q337_kcenter_coreset", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 0L, 10000000000L), (2L, 2L, 1600000000L), (3L, 3L, 400000000L),
      (4L, 4L, 225000000L), (5L, 5L, 100000000L), (6L, 1L, 100000000L)),
      got.mkString(", "))
  }

  test("q338 join-order cost: hand-computed Selinger sizes; the FK-first " +
    "orders tie as best and the cross-product orders lose") {
    val dir = plant(
      "customer" -> Seq(1L, 2L, 3L).toDF("c_custkey"),
      "orders" -> Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L))
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> Seq(1L, 1L, 2L, 2L, 3L, 4L).toDF("l_orderkey"))
    val got = run("q338_join_order_cost", dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, "C*O*L", 4L, 6L, 10L, true), (2L, "O*C*L", 4L, 6L, 10L, true),
      (3L, "O*L*C", 6L, 6L, 12L, false), (4L, "L*O*C", 6L, 6L, 12L, false),
      (5L, "C*L*O", 18L, 6L, 24L, false), (6L, "L*C*O", 18L, 6L, 24L, false)),
      got.mkString(", "))
  }
}

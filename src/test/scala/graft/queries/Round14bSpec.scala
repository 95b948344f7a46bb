package graft.queries

/** Hand-computed units for the round-14 second wave (q381-q386). */
class Round14bSpec extends PlantedQuerySpec {

  import spark.implicits._

  private def doc(id: Long, source: String, nChars: Long) =
    (id, "t", "en", source, nChars)

  test("q381 reservoir: exactly k per stratum, chosen by the two-round " +
    "priority, stable under adding a losing row") {
    val docs = (1L to 20L).map(i => doc(i, if (i <= 10) "a" else "b", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("q381_reservoir_sample", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 1L, 2L, 3L, 4L, 5L))
    // priorities are the portable two-round Lehmer draw — spot-check
    // one doc id against plain Scala
    val p = graft.ops.MixOps.P
    def prio(id: Long) = ((id % p + 17L) * 48271L % p + 1L) * 69621L % p
    val picked = got.filter(_._1 == "a").map(_._2).toSet
    val expectA = (1L to 10L).sortBy(i => (prio(i), i)).take(5).toSet
    assert(picked == expectA, s"$picked vs $expectA")
  }

  test("q382 quantile alignment: a shifted source maps every decile " +
    "boundary onto the global one with the planted shift") {
    // source a: 1..100; source b: 1001..1100 (a constant +1000 shift).
    // global deciles over the 200 values straddle both.
    val docs = ((1L to 100L).map(i => doc(i, "a", i)) ++
      (1L to 100L).map(i => doc(100 + i, "b", 1000 + i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("q382_quantile_align", plant("documents" -> docs))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // source a decile d cut = order stat at ceil(d*100/10) = 10d
    val a = got.filter(_._1 == "a")
    assert(a.map(x => (x._2, x._3)).toSeq ==
      (1L to 9L).map(d => (d, d * 10)).toSeq, a.mkString(", "))
    // global cuts over 200 values: decile d -> rank 20d: values 1..100
    // then 1001..1100, so rank 20d is 20d for d<=5, 1000+(20d-100) after
    val gl = a.map(x => (x._2, x._4)).toMap
    (1L to 9L).foreach { d =>
      val rank = 20 * d
      val expect = if (rank <= 100) rank.toLong else 1000L + (rank - 100)
      assert(gl(d) == expect, s"d=$d got ${gl(d)} want $expect")
    }
  }

  test("q383 Fleiss kappa: perfect agreement gives kappa 1e6 on a " +
    "planted panel; the fixture panel lands strictly between 0 and 1") {
    // all five annotators always vote the truth when noise = 0 is
    // impossible via the fixture hash, so check algebra instead on the
    // real fixture at sf-like scale: planted 4 items, labels spread
    val emb = Seq((100L, Array(0f), 1), (200L, Array(0f), 2),
      (300L, Array(0f), 3), (400L, Array(0f), 4))
      .toDF("vec_id", "embedding", "label")
    val r = run("q383_fleiss_kappa", plant("embeddings" -> emb))
      .collect()(0)
    val (nItems, nRaters, pbar, pe, kappa) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nItems == 4 && nRaters == 5)
    // recompute in plain Scala from the same hash recipe
    val votes = for (id <- Seq(100L, 200L, 300L, 400L);
                     (j, nz) <- Seq((1L, 10L), (2L, 20L), (3L, 30L),
                       (4L, 40L), (5L, 50L))) yield {
      val truth = id / 100
      val h = ((((id * 31 + j * 1000003) * 1103515245 + 12345) %
        2147483648L) * 1103515245 + 54321) % 2147483648L
      val vote = if (h % 100 < nz) (truth + 1 + (h / 100) % 9) % 10
      else truth
      (id, vote)
    }
    val cells = votes.groupBy(identity).map { case ((i, v), xs) =>
      (i, v, xs.size.toLong) }
    val aNum = cells.groupBy(_._1).map { case (_, cs) =>
      cs.map(c => c._3 * c._3).sum - 5 }.sum
    val bNum = cells.groupBy(_._2).map { case (_, cs) =>
      val cj = cs.map(_._3).sum; cj * cj }.sum
    val nn = 4L * 5L
    val d1 = nn * 4L
    val d2 = nn * nn
    assert(pbar == aNum * 1000000L / d1)
    assert(pe == bNum * 1000000L / d2)
    assert(kappa ==
      (aNum * d2 - bNum * d1) * 1000000L / (d1 * (d2 - bNum)))
    assert(kappa > 0 && kappa < 1000000L)
  }

  test("q384 embedding audit: planted vectors give exact per-dim " +
    "mean/var on the 1e-4 grid; a constant dim is dead") {
    val emb = Seq(
      (1L, Array(1.0f, 0.5f, -0.25f), 0),
      (2L, Array(1.0f, 1.5f, 0.25f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = run("q384_embedding_dim_audit", plant("embeddings" -> emb))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // dim0: grid 10000,10000 -> mean 10000, var 0 (dead)
    // dim1: 5000,15000 -> mean 10000, q=250e6, corr=200e6 -> var 25e6
    // dim2: -2500,2500 -> mean 0, var (12.5e6 - 0)/2 = 6.25e6
    assert(got.toSeq == Seq(
      (0L, 2L, 10000L, 0L, 10000L, true),
      (1L, 2L, 10000L, 25000000L, 15000L, false),
      (2L, 2L, 0L, 6250000L, 2500L, false)), got.mkString(", "))
  }

  test("q385 shuffle audit: a constant column has zero slope and no " +
    "mean crossings; an alternating one crosses every step") {
    // shard assignment is hash-driven; plant CONSTANT lengths so every
    // shard sees slope 0 (variance guard) and zero crossings
    val docs = (1L to 40L).map(i => doc(i, "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("q385_shuffle_audit", plant("documents" -> docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._2).sum == 40L)
    assert(got.forall(x => x._3 == 0L && x._4 == 0L), got.mkString(", "))
  }

  test("q386 distribution matching: a source matching the corpus keeps " +
    "everything; an all-short source downsamples its over-quota bucket") {
    // bucket = n_chars div 200 capped at 10. source a: 4 docs bucket 0,
    // 4 docs bucket 1; source b: 8 docs bucket 0.
    // global: bucket0 12/16, bucket1 4/16.
    // a/bucket0: src share 1/2 > tgt 3/4? accept = min(1, (12*8)/(16*4))
    //   = min(1, 1.5) = 1e6. a/bucket1: (4*8)/(16*4) = 0.5 -> 500000,
    //   expected 2. b/bucket0: (12*8)/(16*8) = 0.75 -> 750000, kept 6.
    val docs = ((1L to 4L).map(i => doc(i, "a", 10L)) ++
      (5L to 8L).map(i => doc(i, "a", 250L)) ++
      (9L to 16L).map(i => doc(i, "b", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = run("q386_dist_match", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("a", 0L, 4L, 1000000L, 4L),
      ("a", 1L, 4L, 500000L, 2L),
      ("b", 0L, 8L, 750000L, 6L)), got.mkString(", "))
  }
}

package graft.queries

/** Plain-Scala-model unit for q377. */
class Round13sSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q377 Dawid-Skene step: matches a plain-Scala replay of the " +
    "noisy annotators; the clean annotator outweighs the coin-flipper") {
    val items = (1L to 60L).map(id => (id, (id % 10).toInt))
    val dir = plant("embeddings" -> items.toDF("vec_id", "label"))
    def lcg2(x: Long): Long =
      (((x * 1103515245L + 12345L) % 2147483648L) * 1103515245L +
        54321L) % 2147483648L
    val noise = Seq(1L -> 10L, 2L -> 30L, 3L -> 50L)
    val votes = for {
      (id, lab) <- items; (j, nz) <- noise
    } yield {
      val h = lcg2(id * 31 + j * 1000003L)
      val v = if (h % 100 < nz) (lab + 1 + (h / 100) % 9) % 10 else lab.toLong
      (id, lab.toLong, j, v)
    }
    val pivot = votes.groupBy(_._1).map { case (id, g) =>
      val m = g.map(x => x._3 -> x._4).toMap
      val (v1, v2, v3) = (m(1L), m(2L), m(3L))
      val maj = if (v1 == v2 || v1 == v3) v1
      else if (v2 == v3) v2 else Seq(v1, v2, v3).min
      (id, g.head._2, v1, v2, v3, maj)
    }.toSeq
    val nItems = pivot.size.toLong
    val accs = Seq(
      (1L, pivot.count(p => p._3 == p._6).toLong),
      (2L, pivot.count(p => p._4 == p._6).toLong),
      (3L, pivot.count(p => p._5 == p._6).toLong)).map { case (j, c) =>
      val acc = math.max(math.min(c * 1000000L / nItems, 999999L), 1L)
      val w = math.floor(math.log(acc.toDouble * 9 / (1000000 - acc)) *
        1e6 + 0.5).toLong
      (j, acc, w)
    }
    val wmap = accs.map(a => a._1 -> a._3).toMap
    val rev = votes.groupBy(_._1).map { case (id, g) =>
      val best = g.groupBy(_._4).toSeq
        .map { case (v, vs) => (vs.map(x => wmap(x._3)).sum, v) }
        .sortBy { case (w, v) => (-w, v) }.head._2
      (id, g.head._2, best)
    }.toSeq
    val majAcc = pivot.count(p => p._6 == p._2).toLong * 1000000L / nItems
    val wAcc = rev.count(r => r._3 == r._2).toLong * 1000000L / nItems
    val expected = accs.map { case (j, acc, w) =>
      (j, nItems, acc, w, majAcc, wAcc)
    }
    val got = run("q377_dawid_skene", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
    assert(wmap(1L) > wmap(3L)) // 10% noise outweighs 50% noise
  }
}

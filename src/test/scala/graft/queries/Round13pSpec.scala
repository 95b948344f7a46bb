package graft.queries

import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TextKernels

/** Hand-computed / plain-Scala-model units for q367-q370. */
class Round13pSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q367 watermark detect: matches a plain-Scala bigram-parity " +
    "model over the real kernel hash") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val dir = plant("documents" -> Seq((1L, "s1", t1), (2L, "s2", t2))
      .toDF("doc_id", "source", "text"))
    val P = 1000000007L
    def model(text: String): (Long, Long) = {
      val hs = text.trim.split("\\s+").toSeq
        .map(w => TextKernels.tokenHash(UTF8String.fromString(w)))
      val fps = hs.sliding(2).map(p => p(0) * P + p(1)).toSeq
      (fps.size.toLong, fps.count(_ % 2 == 0).toLong)
    }
    val expected = Seq("s1" -> model(t1), "s2" -> model(t2)).map {
      case (s, (n, g)) =>
        val z2 = (2 * g - n) * (2 * g - n) * 1000 / n
        (s, n, g, g * 1000000 / n, z2, z2 > 4000)
    }
    val got = run("q367_watermark_detect", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }

  test("q368 Wasserstein-1D: hand-computed two-step CDF gap integrates " +
    "to exactly 83.333 cents") {
    def ev(t: String, v: Double, i: Long) =
      (i, t, v, ts("2024-01-01T00:00:00Z"))
    val dir = plant("events" -> Seq(
      ev("click", 1.00, 0), ev("click", 1.00, 1), ev("click", 3.00, 2),
      ev("view", 2.00, 3), ev("view", 3.00, 4))
      .toDF("event_id", "event_type", "value", "ts"))
    // F_click = [2/3, 2/3, 1] vs F_view = [0, 1/2, 1] on {100,200,300}:
    // W1 = 2/3*100 + 1/6*100 = 83.333 -> 83333 milli-cents
    val got = run("q368_wasserstein_1d", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("view", 3L, 2L, 83333L)), got.mkString(", "))
  }

  test("q369 k-truss support: one strong triangle plus a support-0 " +
    "pendant edge; reverse-cumulative counts") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val li = edges.zipWithIndex.flatMap { case ((a, b), e) =>
      (0 until 4).flatMap { rep => // weight 4 per edge
        val ok = e * 4L + rep + 1
        Seq((ok, a), (ok, b))
      }
    }
    val dir = plant("lineitem" -> li.toDF("l_orderkey", "l_suppkey"))
    val got = run("q369_ktruss_support", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 4L), (1L, 3L, 3L)), got.mkString(", "))
  }

  test("q370 learning curve: matches a plain-Scala model of the hash " +
    "split, per-fraction centroids, and eval accuracy") {
    def lcg2h(id: Long): Long =
      ((((id * 1103515245L + 12345L) % 2147483648L) * 1103515245L +
        54321L) % 2147483648L) % 100L
    val ids = (1L to 40L)
    val rows = ids.map { id =>
      val label = (id % 2).toInt
      val x = label * 10.0 + (id % 5) * 0.1
      (id, Seq(x.toFloat), label)
    }
    val dir = plant("embeddings" -> rows.toDF("vec_id", "embedding", "label"))
    def grid(x: Float): Long =
      math.floor(x.toDouble * 10000 + 0.5).toLong
    val pts = rows.map { case (id, v, l) => (id, grid(v.head), l.toLong) }
    val ev = pts.filter(p => lcg2h(p._1) >= 80)
    assert(ev.nonEmpty)
    val expected = Seq(25L, 50L, 100L).map { frac =>
      val tr = pts.filter { p =>
        val h = lcg2h(p._1); h < 80 && h * 100 < 80 * frac
      }
      val cents = tr.groupBy(_._3).map { case (l, g) =>
        val s = g.map(_._2).sum
        val n = g.size
        val cu = if (s < 0) -((-s) / n) else s / n
        (l, cu)
      }.toSeq.sortBy(_._1)
      val correct = ev.count { case (_, xu, l) =>
        val best = cents.map { case (cl, cu) =>
          ((xu - cu) * (xu - cu), cl)
        }.min
        best._2 == l
      }
      (frac, tr.size.toLong, ev.size.toLong,
        correct.toLong * 1000000L / ev.size)
    }
    val got = run("q370_learning_curve", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected, s"got ${got.mkString(", ")}")
  }
}

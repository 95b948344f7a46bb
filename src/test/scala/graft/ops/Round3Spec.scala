package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-3 hardening: loud kernel bounds, simhash chunk validation,
  * row-atomic as-of payload, pointer-doubling cluster convergence, and
  * the exact re-check of the sampled categorical gate.
  */
class Round3Spec extends EtlSpecBase {
  import spark.implicits._

  test("VectorKernels fail loudly on embedding length mismatch (no OOB garbage)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(SimilarityOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.toString.contains("length mismatch") ||
      Option(e.getCause).exists(_.toString.contains("length mismatch")))
    // equal lengths still work
    val ok = df.select(SimilarityOps.dot(col("a"), col("a"))).collect()
    assert(ok(0).getDouble(0) == 14.0)
  }

  test("simhashNearDups rejects only the degenerate maxDist range") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // maxDist >= 32 -> 0-bit chunks, one global bucket (quadratic)
    intercept[IllegalArgumentException] {
      DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = 32)
    }
    intercept[IllegalArgumentException] {
      DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = -1)
    }
    // non-divisor values are coarser but valid (recall by pigeonhole)
    Seq(0, 2, 3, 4, 6, 31).foreach { d =>
      DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = d).collect()
    }
  }

  test("asofJoin is row-atomic: a null field in the picked right row stays null") {
    val left = Seq(("k", 10L, "L")).toDF("key", "ts", "tag")
    // two right rows tie at ts=5; the pick (greatest payload tuple =
    // px 'c') carries py = null, which must NOT back-fill from the
    // ('a', 'x') row
    val right = Seq(
      ("k", 5L, "a", "x"),
      ("k", 5L, "c", null.asInstanceOf[String])).toDF("key", "ts", "px", "py")
    val out = EventOps.asofJoin(left, right, "key", "ts").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("asof_px") == "c")
    assert(out(0).getAs[String]("asof_py") == null) // atomic, not blended
    assert(out(0).getAs[Long]("asof_ts") == 5L)
  }

  test("dupClusters converges on a 100-node chain (diameter >> old 30-iter cap)") {
    val pairs = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = DedupOps.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 100)
    assert(out.values.toSet == Set(1L)) // whole chain labeled with min id
  }

  test("dupClusters throws (not silently truncates) when maxIters is exhausted") {
    val pairs = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DedupOps.dupClusters(pairs, maxIters = 1)
    }
  }

  test("dupClusters does NOT throw when labels converge exactly on the last iteration") {
    // a single edge converges in one write iteration: maxIters = 1 must
    // return the fixpoint, not mistake "last iteration wrote" for
    // "not converged"
    val out = DedupOps.dupClusters(Seq((1L, 2L)).toDF("id_a", "id_b"), maxIters = 1)
      .orderBy("member_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L)))
  }

  test("dupClusters releases its per-iteration checkpoint blocks eagerly") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    DedupOps.dupClusters(pairs).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // sym + final labels (+ the last prop at worst) may remain; the
    // O(iterations) intermediate label/prop frames must not
    assert(after - before <= 3, s"leaked checkpoint blocks: $before -> $after")
  }

  test("piiCount equals the number of placeholders redactPii inserts on overlapping PII") {
    val df = Seq(
      (1L, "ping 1.2.3.4@example.com"),       // ONE email redaction, not email+IP
      (2L, "a@b.com and 9.9.9.9 and 555-123-4567")) // three distinct
      .toDF("id", "t")
    val out = df.select($"id", TextOps.redactPii($"t").as("r"),
        TextOps.piiCount($"t").as("n")).orderBy("id").collect()
    assert(out(0).getString(1) == "ping <EMAIL>")
    assert(out(0).getLong(2) == 1L)
    assert(out(1).getString(1) == "<EMAIL> and <IP> and <PHONE>")
    assert(out(1).getLong(2) == 3L)
  }

  test("redactPii scrubs emails, phones and IPv4s; counts match; clean text untouched") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 555-123-4567"),
      (2L, "server 10.0.255.7 rebooted"),
      (3L, "no pii here at all")).toDF("id", "t")
    val out = df.select($"id", TextOps.redactPii($"t").as("r"),
        TextOps.piiCount($"t").as("n")).orderBy("id").collect()
    assert(out(0).getString(1) == "reach me at <EMAIL> or <PHONE>")
    assert(out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == "server <IP> rebooted")
    assert(out(1).getLong(2) == 1L)
    assert(out(2).getString(1) == "no pii here at all")
    assert(out(2).getLong(2) == 0L)
  }

  test("stratified hash sampling is deterministic and tracks the target rates") {
    val df = (1L to 4000L).map(i =>
      (i, if (i % 2 == 0) "view" else "purchase")).toDF("event_id", "event_type")
    def sample() = df.where(
      TextOps.tokenHash($"event_id".cast("string")) % 100 <
        when($"event_type" === "view", 10).otherwise(50))
      .collect().map(_.getLong(0)).toSet
    val s1 = sample()
    assert(s1 == sample()) // same rows every run — no rand()
    val views = s1.count(_ % 2 == 0) / 2000.0
    val purchases = s1.count(_ % 2 == 1) / 2000.0
    assert(math.abs(views - 0.10) < 0.03, s"view rate $views")
    assert(math.abs(purchases - 0.50) < 0.05, s"purchase rate $purchases")
  }

  test("contamination join flags planted n-gram overlap only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "src0"),      // shares 3-grams with train doc 10
      (2L, "totally disjoint words here", "src0"), // clean
      (10L, "alpha beta gamma epsilon", "srcX"),
      (11L, "unrelated training content four", "srcX")).toDF("doc_id", "text", "source")
    val ev = docs.where($"source" === "src0")
      .select($"doc_id", DedupOps.shingleHashes($"text").as("hs"))
    val evx = ev.select($"doc_id", explode($"hs").as("h"))
    val tr = docs.where($"source" =!= "src0")
      .select(explode(DedupOps.shingleHashes($"text")).as("h")).distinct()
    val hits = evx.join(tr, Seq("h")).groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L)) // exactly "alpha beta gamma"
  }

  test("ORC round-trip preserves the all-string demo frame") {
    import graft.etl.{Demo, Io}
    val tmp = "/tmp/graft_orc_spec.orc"
    Io.write(Demo.dirtyDemo(spark), tmp)
    val back = Io.read(spark, tmp).select(Demo.columns.map(col): _*)
    assert(back.orderBy("id").collect().toSeq ==
      Demo.dirtyDemo(spark).orderBy("id").collect().toSeq)
  }

  test("sampled detection demotes a skewed high-cardinality column the sample saw as categorical") {
    import graft.etl.{AutoEtl, ColType, EtlConfig}
    // 5 hot values cover 99.4% of rows; 60 singletons in the tail.
    // A 1% sample sees ~6 distinct (< 50 -> Categorical in-sample),
    // but the exact count is 65 (>= 50) -> must demote.
    val rows = (1 to 10000).map { i =>
      if (i <= 9940) s"hot${i % 5}" else s"rare$i"
    }
    val df = rows.toDF("c")
    val sampled = AutoEtl.transform(df, EtlConfig(detectionSample = Some(0.01)))
    sampled.unpersist()
    val exact = AutoEtl.transform(df)
    exact.unpersist()
    assert(exact.columnTypes("c") != ColType.Categorical) // ground truth
    assert(sampled.columnTypes("c") == exact.columnTypes("c"))
  }
}

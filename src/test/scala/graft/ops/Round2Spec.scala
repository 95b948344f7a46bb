package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-2 additions: VectorKernels == HOF pins, hash-first exact
  * dedup, the LSH hot-band cap, and asof-join tie determinism.
  */
class Round2Spec extends EtlSpecBase {
  import spark.implicits._

  // deterministic pseudo-random doubles in [-0.5, 0.5)
  private def fakeVec(seed: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      (((seed.toLong * dims + i + 1) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
    }

  test("VectorKernels dot/cosine/bucket are bit-identical to the HOF spec forms") {
    val dims = 64
    val vecs = (0 until 20).map(s => (s.toLong, fakeVec(s, dims))).toDF("id", "v")
    val a = col("v")
    val b = reverse(col("v"))
    val rows = vecs.select(
      SimilarityOps.dot(a, b).as("kd"),
      SimilarityOps.dotHof(a, b).as("hd"),
      SimilarityOps.cosine(a, b).as("kc"),
      SimilarityOps.cosineHof(a, b).as("hc"),
      SimilarityOps.bucket(a, 1, dims, 8).as("kb"),
      SimilarityOps.bucketHof(a, 1, dims, 8).as("hb")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exact, not approx
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getLong(4) == r.getLong(5))
    }
    // sanity: buckets take multiple values over the corpus
    assert(rows.map(_.getLong(4)).distinct.length > 1)
  }

  test("exactDedup == groupBy(text) on a corpus with planted duplicates") {
    val docs = ((1L to 40L).map(i => (i, s"unique doc number $i body")) ++
      (101L to 110L).map(i => (i, "shared boilerplate body")) ++
      Seq((201L, "pair text"), (202L, "pair text"))).toDF("doc_id", "text")
    val expected = docs.groupBy("text")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
      .select("rep", "n").orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = DedupOps.exactDedup(docs).orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.exists(_ == (101L, 10L))) // the planted cluster collapsed
  }

  test("exactDedup groups null texts together, like groupBy(text)") {
    val docs = Seq((1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, "b"))
      .toDF("doc_id", "text")
    val expected = docs.groupBy("text")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
      .select("rep", "n").orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = DedupOps.exactDedup(docs).orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.contains((2L, 2L))) // both nulls collapse to rep=2
  }

  test("nearDupPairs hot-band cap drops oversized bands instead of going quadratic") {
    // 300 identical docs: every band bucket has 300 members -> with a
    // cap of 50 all bands are skipped and no candidate explosion runs;
    // distinct satellite pairs are unaffected (their bands stay small).
    val cluster = (1L to 300L).map(i => (i, "the same exact boilerplate text repeated"))
    val satellites = Seq(
      (1001L, "satellite alpha one two three four five"),
      (1002L, "satellite alpha one two three four five"))
    val df = (cluster ++ satellites).toDF("doc_id", "text")
    val capped = DedupOps.nearDupPairs(df, "doc_id", "text", maxBandSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped == Seq((1001L, 1002L)))
    // uncapped control on a small slice: cluster pairs ARE found
    val small = (cluster.take(3) ++ satellites).toDF("doc_id", "text")
    val uncapped = DedupOps.nearDupPairs(small, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1001L, 1002L)))
  }

  test("simhashNearDups: identical docs pair at distance 0, unrelated docs don't pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("dupClusters: chains merge transitively, separate components stay apart") {
    // 1-2, 2-3, 3-4 (a chain, diameter 3) plus the isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = DedupOps.dupClusters(pairs).orderBy("member_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("saltedJoin == plain inner join, including a planted hot key") {
    val big = ((1L to 200L).map(i => (42L, i)) ++ // hot key
      (1L to 50L).map(i => (i, i * 100))).toDF("k", "payload")
    val small = Seq((42L, "hot"), (7L, "cold"), (99L, "unmatched"))
      .toDF("k", "tag")
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 4)
      .orderBy("k", "payload").collect().map(_.toSeq).toSeq
    val plain = big.join(small, Seq("k"))
      .orderBy("k", "payload").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(salted.count(_.head == 42L) == 201) // 200 hot + key 42 from the ramp
  }

  test("asofJoin picks deterministically among duplicate right timestamps") {
    val left = Seq(("k", 10L, "L")).toDF("key", "ts", "tag")
    // three right rows at the same (key, ts) — the greatest payload
    // tuple must win, every run
    val right = Seq(("k", 5L, "a"), ("k", 5L, "c"), ("k", 5L, "b"))
      .toDF("key", "ts", "px")
    (1 to 3).foreach { _ =>
      val out = EventOps.asofJoin(left, right, "key", "ts").collect()
      assert(out.length == 1)
      assert(out(0).getAs[String]("asof_px") == "c")
    }
  }

  test("ivfTopK: ranks are contiguous from 1 and the probe recalls near-identical vectors") {
    val dims = 16
    // 30 vectors; vec 25 is a near-copy of vec 20 (same cell, top hit)
    val base = (0 until 30).map(s => (s.toLong, fakeVec(s, dims)))
    val vecs = base.map { case (id, v) =>
      if (id == 25L) (id, base(20)._2.map(_ * 1.001)) else (id, v)
    }.toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(vecs, vecs.where($"vec_id" === 20), 3,
      nCentroids = 4, nprobe = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(out(0).getAs[Long]("vec_id") == 25L) // the planted near-dup
    assert(out(0).getAs[Double]("cos") > 0.999)
  }

  test("EtlModel applies statelessly to a stream: micro-batch union == batch apply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.etl.{AutoEtl, Demo}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = AutoEtl.fit(Demo.dirtyDemo(spark))
    val stream = MemoryStream[(String, String, String, String, String, String)]
    val streamDf = stream.toDS().toDF(Demo.columns: _*)
    val sink = "graft_model_stream"
    spark.catalog.dropTempView(sink)
    val q = model(streamDf).writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val rows = Demo.rows.map(r => (r(0), r(1), r(2), r(3), r(4), r(5)))
    stream.addData(rows.take(5)); q.processAllAvailable()
    stream.addData(rows.drop(5)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table(sink).orderBy("id").collect().toSeq
    val batch = model(Demo.dirtyDemo(spark)).orderBy("id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 10)
  }

  test("streamWithRefit re-fits on drift: numeric batch then text batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.etl.AutoEtl
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val seen = scala.collection.mutable.Map[Long, Seq[org.apache.spark.sql.Row]]()
    val q = AutoEtl.streamWithRefit(stream.toDS().toDF("c"), refitEvery = 1) {
      (batch, id) => seen.synchronized { seen(id) = batch.orderBy("c").collect().toSeq }
    }
    // batch 0: clearly numeric -> model types c numeric, cleans to doubles
    stream.addData((1 to 20).map(i => s"$i.5"))
    q.processAllAvailable()
    // batch 1: drifted to free text -> refit -> text cleaning (strings survive)
    stream.addData(Seq("  hello world  ", "N/A", "some text value"))
    q.processAllAvailable()
    q.stop()
    assert(seen(0L).map(_.getDouble(0)).sorted.head == 1.5)
    // refit on the text batch: trimmed, 'N/A' null-mapped, then
    // mode-imputed with the smallest tied value ('hello world')
    val b1 = seen(1L).map(_.getString(0)).sorted
    assert(b1 == Seq("hello world", "hello world", "some text value"))
  }

  test("EtlConfig.autoSampleBytes flips detection to sampled above the size estimate") {
    import graft.etl.{AutoEtl, ColType, EtlConfig}
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // threshold 1 byte -> always sampled; numeric/date columns must
    // still be typed correctly from the 1% sample
    val sampled = AutoEtl.transform(orders, EtlConfig(autoSampleBytes = Some(1L)))
    sampled.unpersist()
    assert(sampled.columnTypes("o_orderkey") == ColType.Numeric)
    assert(sampled.summary.totalRows == orders.count()) // total stays exact
    // threshold MaxValue -> never sampled; same code path as exact
    val exact = AutoEtl.transform(orders, EtlConfig(autoSampleBytes = Some(Long.MaxValue)))
    exact.unpersist()
    assert(exact.columnTypes == AutoEtl.transform(orders).columnTypes)
  }

  test("sampled detection (atScale) keeps report counters sane") {
    import graft.etl.{Action, AutoEtl, EtlConfig}
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val r = AutoEtl.transform(orders, EtlConfig.atScale)
    r.unpersist()
    val total = r.summary.totalRows
    assert(total == orders.count()) // exact even when detection sampled
    r.report.actions.values.flatten.foreach {
      case Action.NumericCleaned(n) => assert(n >= 0 && n <= total)
      case Action.DateCleaned(p, t) => assert(p >= 0 && p <= t && t == total)
      case _ =>
    }
  }

  test("EtlModel round-trips through Java serialization (plain values only)") {
    import graft.etl.{AutoEtl, Demo}
    val model = AutoEtl.fit(Demo.dirtyDemo(spark))
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(model); oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
    val back = in.readObject().asInstanceOf[graft.etl.EtlModel]
    assert(back == model)
    // the deserialized model still cleans identically
    val a = model(Demo.dirtyDemo(spark)).orderBy("id").collect().toSeq
    val b = back(Demo.dirtyDemo(spark)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("EtlModel.apply drops the columns the fit decided to drop") {
    import graft.etl.{AutoEtl, Imputer}
    // 10 rows, one column 90% null -> Drop decision must survive the
    // fit/apply round-trip
    val df = (1 to 10).map(i =>
      (i.toString, if (i == 1) "x" else null, s"v$i"))
      .toDF("id", "mostly_null", "keep")
    val model = AutoEtl.fit(df)
    assert(model.decisions("mostly_null") == Imputer.Drop)
    val out = model(df)
    assert(out.columns.toSeq == Seq("id", "keep"))
    assert(out.count() == 10)
  }

  test("writeJdbc executes a real JDBC write + readback (embedded Derby)") {
    import graft.etl.Io
    val db = "graft_spec_jdbc"
    val url = s"jdbc:derby:memory:$db;create=true"
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5), (3L, null: String, 3.5))
      .toDF("id", "v", "score")
    Io.writeJdbc(df, url, "cleaned_data")
    // overwrite semantics = the reference's if_exists="replace": a second
    // write must replace, not append or fail
    Io.writeJdbc(df, url, "cleaned_data")
    val back = Io.readJdbc(spark, url, "cleaned_data")
      .select("id", "v", "score").orderBy("id")
    assert(back.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq ==
      Seq((1L, "x", 1.5), (2L, "y", 2.5), (3L, null, 3.5)))
    Io.dropDerbyInMemory(db)
  }

  test("readJdbc partitioned read issues one range query per partition") {
    import graft.etl.Io
    val db = "graft_spec_jdbc_part"
    val url = s"jdbc:derby:memory:$db;create=true"
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    Io.writeJdbc(df, url, "t")
    val back = Io.readJdbc(spark, url, "t", Some(("id", 1L, 100L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 5050L)
    Io.dropDerbyInMemory(db)
  }

  test("writeJdbc against an unreachable driver still surfaces the JDBC error") {
    // the non-Derby path: url/table/mode flow into DataFrameWriter.jdbc
    val df = Seq((1, "x")).toDF("id", "v")
    val e = intercept[Exception] {
      graft.etl.Io.writeJdbc(df, "jdbc:sqlite:/tmp/graft_t.db", "cleaned_data")
    }
    val msg = e.toString + Option(e.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("driver") || msg.contains("jdbc"))
  }
}

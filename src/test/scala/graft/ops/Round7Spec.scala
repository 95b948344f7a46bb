package graft.ops

import graft.etl.EtlSpecBase
import org.apache.spark.sql.functions._

/** Round-7 units: context-window chunking, token-budget sequence
  * packing, incremental ingest dedup, and the Bloom-prefiltered exact
  * blocklist filter.
  */
class Round7Spec extends EtlSpecBase {

  import spark.implicits._

  // ---- charChunks --------------------------------------------------------

  test("charChunks: sliding starts, clipped tail, overlap region identity") {
    // 10-char alphabet prefix, size 4 / stride 3 -> starts 0,3,6,9
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
    val got = TextOps.charChunks(df, "id", "text", size = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_len").as[(Int, Int)].collect().toSeq
    assert(got == Seq((0, 4), (1, 4), (2, 4), (3, 1)),
      s"starts 0/3/6/9 with the last chunk clipped to 1 char: $got")
    // adjacent chunks overlap by size - stride chars: recompute the
    // chunk text independently and compare fingerprints
    val fps = TextOps.charChunks(df, "id", "text", 4, 3)
      .orderBy("chunk_idx").select("chunk_fp").as[Long].collect().toSeq
    val expect = Seq("abcd", "defg", "ghij", "j").map(s =>
      Seq(s).toDF("t").select(TextOps.fingerprint(col("t"))).as[Long].head())
    assert(fps == expect)
  }

  test("charChunks: empty and null texts produce no chunks; short text one chunk") {
    val df = Seq((1L, ""), (2L, null: String), (3L, "ab")).toDF("id", "text")
    val got = TextOps.charChunks(df, "id", "text", 200, 150)
      .select("id", "chunk_idx", "chunk_len").as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((3L, 0, 2)), s"only the non-empty doc chunks: $got")
  }

  test("charChunks: fingerprints match independently-derived chunk texts (unicode + long)") {
    val cases = Seq("ab", "abcdefghijklmnopqrstuvwxyz0123456789",
      "αβγδε ζηθικ λμνξο πρστυ φχψω", "xy " * 400)
    val size = 7; val stride = 5
    cases.zipWithIndex.foreach { case (s, i) =>
      val df = Seq((i.toLong, s)).toDF("id", "text")
      val got = TextOps.charChunks(df, "id", "text", size, stride)
        .orderBy("chunk_idx").select("chunk_len", "chunk_fp")
        .as[(Int, Long)].collect().toSeq
      // independent derivation on code points (Spark substr counts
      // code points, not UTF-16 units)
      val cps = s.codePoints().toArray
      val starts = 0 to ((cps.length - 1) / stride)
      val expect = starts.map { j =>
        val chunk = new String(cps, j * stride, math.min(size, cps.length - j * stride))
        (chunk.codePointCount(0, chunk.length),
          Seq(chunk).toDF("t").select(TextOps.fingerprint(col("t"))).as[Long].head())
      }
      assert(got == expect, s"case $i: $got vs $expect")
    }
  }

  // ---- temperatureSample -------------------------------------------------

  test("temperatureSample: flattens the source distribution, deterministic") {
    val df = ((1L to 1000L).map(i => (i, "A")) ++
      (1001L to 1100L).map(i => (i, "B")) ++
      (1101L to 1110L).map(i => (i, "C"))).toDF("id", "src")
    val sample = MixOps.temperatureSample(df, "id", "src",
      tau = 2.0, targetNum = 3, targetDen = 10, seed = 1L)
    val kept = sample.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tau=2 rates: A ~0.235, B ~0.744, C capped at 1.0 — the keep RATE
    // must grow as the source shrinks (the whole point of temperature)
    assert(kept("C") == 10L, s"capped source keeps everything: $kept")
    val rateA = kept("A").toDouble / 1000
    val rateB = kept("B").toDouble / 100
    assert(rateA < rateB && rateB < 1.0, s"rates not flattened: $kept")
    // hash-gate sanity: close to the analytic rates
    assert(math.abs(rateA - 0.235) < 0.08 && math.abs(rateB - 0.744) < 0.15, kept.toString)
    val again = MixOps.temperatureSample(df, "id", "src", 2.0, 3, 10, 1L)
      .select("id").as[Long].collect().toSet
    assert(again == sample.select("id").as[Long].collect().toSet)
  }

  test("temperatureSample: oversized source domain fails loudly, not OOM") {
    // per-source rates are driver-side literals — a source column with
    // more than MaxSources distinct values must raise (VERDICT r11 #4),
    // and the probe itself is LIMIT-bounded so the collect never grows
    // with the adversarial domain
    val over = spark.range(1, MixOps.MaxSources + 2)
      .selectExpr("id", "concat('s', id) AS src")
    val e = intercept[IllegalArgumentException] {
      MixOps.temperatureSample(over, "id", "src", 2.0, 1, 2, 1L).count()
    }
    assert(e.getMessage.contains("source domain exceeds"))
    // and a domain comfortably under the cap still works
    val wide = (1L to 200L).map(i => (i, s"s$i")).toDF("id", "src")
    assert(MixOps.temperatureSample(wide, "id", "src", 2.0, 1, 2, 1L)
      .count() > 0)
  }

  // ---- packSequences -----------------------------------------------------

  test("packSequences: prefix-sum identity, straddling docs, determinism") {
    val docs = (1L to 200L).map(i => (i, 30L + i % 50)).toDF("id", "n_tok")
    val packed = MixOps.packSequences(docs, "id", "n_tok",
      budget = 256L, seed = 11L, nShards = 3)
    val rows = packed.select("id", "shard", "pack", "off", "n_tok")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // totality: every doc placed exactly once
    assert(rows.map(_._1).sorted == (1L to 200L))
    // per shard, in mix order: off/pack are exactly the running token
    // count split by the budget — including docs straddling boundaries
    rows.groupBy(_._2).foreach { case (_, inShard) =>
      val inOrder = inShard.sortBy(r => (r._3, r._4, r._1)) // (pack, off, id)
      var cum = 0L
      inOrder.foreach { case (id, _, pack, off, nTok) =>
        assert(pack == cum / 256 && off == cum % 256,
          s"doc $id expected start $cum -> (${cum / 256}, ${cum % 256}), got ($pack, $off)")
        cum += nTok
      }
    }
    // a different seed produces a different layout; the same seed is stable
    val again = MixOps.packSequences(docs, "id", "n_tok", 256L, 11L, 3)
      .select("id", "shard", "pack", "off", "n_tok")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) == rows.sortBy(_._1))
    val reseeded = MixOps.packSequences(docs, "id", "n_tok", 256L, 12L, 3)
      .select("id", "shard", "pack", "off", "n_tok")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(reseeded.sortBy(_._1) != rows.sortBy(_._1))
  }

  // ---- incrementalDedup --------------------------------------------------

  test("incrementalDedup: corpus hits dropped, in-batch dup keeps min id") {
    val corpus = Seq((1L, "seen text one"), (2L, "seen text two")).toDF("id", "text")
    val batch = Seq(
      (10L, "brand new text"),   // admitted
      (11L, "seen text one"),    // in corpus -> dropped
      (12L, "brand new text"),   // in-batch dup of 10 -> dropped
      (13L, "another new text")  // admitted
    ).toDF("id", "text")
    val got = DedupOps.incrementalDedup(batch, corpus, "id", "text")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(10L, 13L), s"admitted: $got")
  }

  // ---- unigramLogprob ----------------------------------------------------

  test("unigramLogprob: common-token docs score lower surprisal than rare-token docs") {
    val docs = Seq(
      (1L, "the the the the"), // all corpus-common tokens
      (2L, "qqq www eee rrr"), // all singletons
      (3L, "the the zzz yyy")  // mixed
    ).toDF("id", "text")
    val got = TextOps.unigramLogprob(docs, "id", "text")
      .select("id", "n_tok", "nll").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_._1 == 4L))
    // N = 12 tokens, V = 7 distinct, denom 19: "the" (c=6) -> -ln(7/19),
    // singletons -> -ln(2/19); mixed sits strictly between
    assert(got(1L)._2 < got(3L)._2 && got(3L)._2 < got(2L)._2, got.toString)
    val expect1 = -math.log(7.0 / 19.0)
    assert(math.abs(got(1L)._2 - expect1) < 1e-12, s"${got(1L)._2} vs $expect1")
  }

  // ---- kmeansAssign ------------------------------------------------------

  test("kmeansAssign: planted clusters recovered; deterministic across runs") {
    // 3 tight clusters at distant centers; ids 1/2/3 (the init seeds)
    // are planted one per cluster so Lloyd's can separate them
    val centers = Map(0 -> 0f, 1 -> 10f, 2 -> -10f)
    val rows = (1L to 30L).map { i =>
      val cl = ((i - 1) % 3).toInt
      val c = centers(cl)
      val jitter = (i % 7).toFloat * 0.01f
      (i, Array(c + jitter, c - jitter, c, jitter))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.kmeansAssign(df, k = 3, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(got.size == 30)
    // every member of a planted cluster shares its seed's cell
    rows.foreach { case (i, _) =>
      val cl = ((i - 1) % 3).toInt
      assert(got(i) == got(cl + 1L), s"vec $i not with its planted cluster seed")
    }
    assert(got.values.toSet.size == 3)
    val again = SimilarityOps.kmeansAssign(df, k = 3, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(again == got)
  }

  // ---- gopherFlags -------------------------------------------------------

  test("gopherFlags: each rule rejects its planted violation; clean doc passes") {
    // 60 tokens, all distinct (zero trigram repetition), mean length in
    // [3, 10], two distinct stopwords, all-alphanumeric
    val good = ("the of " + (1 to 58).map(i => s"word$i").mkString(" ")).trim
    val docs = Seq(
      (1L, good),                              // passes all
      (2L, "short doc only four"),             // r_ntok: 4 < 50
      (3L, ("a " * 60).trim),                  // r_wlen: mean len 1 < 3
      (4L, (("the of " + "12 34 56 78 " * 2) * 8).trim), // r_alpha: 2/26 words alphabetic... adjusted below
      (5L, ("alpha beta gamma delta " * 15).trim),  // r_stop: zero English stopwords
      (6L, ("the of and x y z " * 12).trim)    // r_rep: same 6-gram repeated -> high trigram repetition
    ).toDF("doc_id", "text")
    val got = TextOps.gopherFlags(docs, "doc_id", "text", minTok = 4)
      .select("doc_id", "r_ntok", "r_wlen", "r_alpha", "r_stop", "r_rep", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, true, true, true, true, true)), got(1L).toString)
    assert(!got(3L)._3 && !got(3L)._7, s"mean-wlen rule: ${got(3L)}")
    assert(!got(4L)._4 && !got(4L)._7, s"alpha-frac rule: ${got(4L)}")
    assert(!got(5L)._5 && !got(5L)._7, s"stopword rule: ${got(5L)}")
    assert(!got(6L)._6 && !got(6L)._7, s"repetition rule: ${got(6L)}")
    // and with the default minTok=50, the short doc fails r_ntok
    val strict = TextOps.gopherFlags(docs, "doc_id", "text")
      .where($"doc_id" === 2L).select("r_ntok", "pass")
      .as[(Boolean, Boolean)].head()
    assert(strict == ((false, false)))
  }

  test("gopherFlags: null/empty text fails closed on every rule") {
    val docs = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.gopherFlags(docs, "doc_id", "text")
      .select("doc_id", "pass").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false))
  }

  // ---- tfidfTopTerms -----------------------------------------------------

  test("tfidfTopTerms: corpus-wide terms score zero, rare repeated terms rank first") {
    val docs = Seq(
      (1L, "common common rare rare rare common"),
      (2L, "common other other"),
      (3L, "common third")
    ).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", kTop = 2)
      .select("doc_id", "term", "rank").as[(Long, String, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // "common" appears in all 3 docs -> idf = ln(1) = 0: never top-ranked
    // over a doc-local term; doc 1's top term is "rare" (tf 3, df 1)
    assert(got(1L).head == "rare", got.toString)
    assert(got(2L).head == "other", got.toString)
    // doc 3: only "third" has positive score; "common" fills rank 2 at 0.0
    assert(got(3L) == Seq("third", "common"), got.toString)
  }

  // ---- assignSplit -------------------------------------------------------

  test("assignSplit: exhaustive, deterministic, fractions honored, eval set stable") {
    val df = (1L to 10000L).toDF("id")
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = MixOps.assignSplit(df, "id", seed = 13L, fracs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 10000L)
    assert(math.abs(got("train") - 8000L) < 200, got.toString)
    assert(math.abs(got("val") - 1000L) < 100, got.toString)
    // determinism: the test-set membership is identical across runs
    def testIds() = MixOps.assignSplit(df, "id", 13L, fracs)
      .where($"split" === "test").select("id").as[Long].collect().toSet
    assert(testIds() == testIds())
    // a different seed reassigns
    val other = MixOps.assignSplit(df, "id", 14L, fracs)
      .where($"split" === "test").select("id").as[Long].collect().toSet
    assert(other != testIds())
  }

  test("assignSplit: rejects bad fraction specs") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      MixOps.assignSplit(df, "id", 1L, Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      MixOps.assignSplit(df, "id", 1L, Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  // ---- bm25TopK ----------------------------------------------------------

  test("bm25TopK: tf raises score with saturation, shorter docs win ties, rare terms worth more") {
    val filler = "xx yy zz " * 10
    val docs = Seq(
      (1L, "needle " + filler),                   // 1 hit, long doc
      (2L, "needle needle needle " + filler),     // 3 hits, long doc
      (3L, "needle"),                             // 1 hit, minimal doc
      (4L, filler.trim),                          // no hits
      (5L, "haystack " + filler)                  // hits only the COMMON term
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
        terms = Seq("needle", "haystack"), kTop = 10)
      .as[(Long, Long)].collect()
    val scores = got.toMap
    assert(!scores.contains(4L), "doc with no query terms must not appear")
    assert(scores(2L) > scores(1L), "higher tf must score higher")
    assert(scores(2L) < 3 * scores(1L), "tf saturates below linear")
    assert(scores(3L) > scores(1L), "same tf in a shorter doc scores higher")
    // doc 5 matches only 'haystack' (df 1, same as needle's docs 1-3 df 3:
    // haystack is RARER -> its single hit outscores doc 1's needle hit)
    assert(scores(5L) > scores(1L), scores.toString)
    // descending by score, doc-id tiebreak
    assert(got.sortBy(r => (-r._2, r._1)).toSeq == got.toSeq)
  }

  // ---- ngrams ------------------------------------------------------------

  test("ngrams: keeps multiplicity, shingles is its distinct set") {
    val df = Seq((1L, "a b a b a b")).toDF("id", "text")
    val n = df.select(TextOps.ngrams($"text", 3).as("g"))
      .select(explode($"g")).as[String].collect().toSeq
    assert(n == Seq("a b a", "b a b", "a b a", "b a b"))
    val s = df.select(DedupOps.shingles($"text", 3).as("g"))
      .select(explode($"g")).as[String].collect().toSeq
    assert(s == Seq("a b a", "b a b"))
    // short doc: empty, not a descending sequence artifact
    val short = Seq((1L, "a b")).toDF("id", "text")
      .select(TextOps.ngrams($"text", 3).as("g"))
      .select(size($"g")).as[Int].head()
    assert(short == 0)
  }

  // ---- snapshotDiff ------------------------------------------------------

  test("snapshotDiff: all four classes, presence by row not text nullity") {
    val prev = Seq(
      (1L, "stable text"),
      (2L, "will change"),
      (3L, "will vanish"),
      (5L, null: String)       // present with NULL text
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "stable text"),     // unchanged
      (2L, "has changed"),     // changed
      (4L, "brand new"),       // added
      (5L, null: String)       // null == null -> unchanged, NOT added
    ).toDF("doc_id", "text")
    val got = DedupOps.snapshotDiff(prev, cur)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"), got.toString)
    // a null text BECOMING real text is a change, not an add
    val cur2 = Seq((5L, "now real")).toDF("doc_id", "text")
    val got2 = DedupOps.snapshotDiff(prev.where($"doc_id" === 5L), cur2)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got2 == Map(5L -> "changed"), got2.toString)
  }

  // ---- perKeyQuota -------------------------------------------------------

  test("perKeyQuota: hard per-group ceiling, keeps the best rows, under-quota groups intact") {
    val rows = (1L to 30L).map(i => (i, "big", i % 10)) ++   // 30 rows, scores 0-9
      (31L to 33L).map(i => (i, "small", 5L))                 // 3 rows
    val df = rows.toDF("id", "src", "score")
    val got = MixOps.perKeyQuota(df, "src",
        Seq($"score".desc, $"id"), quota = 5)
      .select("id", "src", "score").as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2)
    assert(bySrc("big").length == 5, s"quota must cap: ${bySrc("big").toSeq}")
    assert(bySrc("small").length == 3, "under-quota group must be intact")
    // the kept "big" rows are exactly the top-5 by (score desc, id asc)
    val expect = (1L to 30L).map(i => (i, i % 10)).sortBy(r => (-r._2, r._1))
      .take(5).map(_._1).toSet
    assert(bySrc("big").map(_._1).toSet == expect)
  }

  // ---- logregScore -------------------------------------------------------

  test("logregScore: learns a separable signal, deterministic, zero-token docs excluded") {
    // label == 1 exactly when the doc is stopword-dense: feature x2
    // (en-stopword ratio) separates perfectly, so 3 GD steps must push
    // the dense docs' probabilities above the sparse docs'
    val dense = (1L to 20L).map(i => (i, "the a of and to in is the a of", 1))
    val sparse = (21L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta", 0))
    val docs = (dense ++ sparse ++ Seq((41L, "", 0), (42L, null: String, 0)))
      .toDF("doc_id", "text", "y")
    val got = TrainOps.logregScore(docs, "doc_id", "text", $"y", iters = 3, lr = 0.5)
      .select("doc_id", "p4", "pred").as[(Long, Double, Int)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(!byId.contains(42L), "null-text doc must be excluded")
    val pDense = dense.map(d => byId(d._1)._2).min
    val pSparse = sparse.map(d => byId(d._1)._2).max
    assert(pDense > pSparse,
      s"separable signal not learned: min dense $pDense <= max sparse $pSparse")
    // identical docs get identical scores; a re-run is bit-identical
    assert(dense.map(d => byId(d._1)._2).toSet.size == 1)
    val again = TrainOps.logregScore(docs, "doc_id", "text", $"y", 3, 0.5)
      .select("doc_id", "p4", "pred").as[(Long, Double, Int)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("logregScore: zero iterations rejected; one iteration moves off the 0.5 prior") {
    val docs = Seq((1L, "the the the", 1), (2L, "xxx yyy zzz", 0))
      .toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      TrainOps.logregScore(docs, "doc_id", "text", $"y", iters = 0)
    }
    val p = TrainOps.logregScore(docs, "doc_id", "text", $"y", iters = 1)
      .select("p4").as[Double].collect()
    assert(p.exists(_ != 0.5), "one step must move the weights")
  }

  // ---- kmeansOutliers ----------------------------------------------------

  test("kmeansOutliers: flags the planted far point per cluster, integer cut exact") {
    // two tight clusters of 20 + one planted far member in each
    val rows =
      (1L to 20L).map(i => (i, Array(0f + (i % 5) * 0.01f, 0f, 0f, 0f))) ++
      (21L to 40L).map(i => (i, Array(10f + (i % 5) * 0.01f, 10f, 10f, 10f))) ++
      Seq((41L, Array(3f, 0f, 0f, 0f)),      // far from cluster A center
          (42L, Array(13f, 10f, 10f, 10f)))  // far from cluster B center
    val df = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.kmeansOutliers(df, k = 2, iters = 3, pct = 95)
      .select("vec_id", "is_out").as[(Long, Int)].collect().toMap
    assert(got.size == 42)
    assert(got(41L) == 1 && got(42L) == 1, s"planted outliers must flag: $got")
    // integer rule: out iff rk·100 > 95·21 = 1995, i.e. ranks 20 and
    // 21 of each 21-member cell — the planted point plus the farthest
    // regular member (the centroid is pulled toward the outlier, so
    // the zero-offset members are farthest; id tiebreak flags id 20/40)
    assert(got.values.sum == 4, s"two flags per 21-member cell: $got")
    assert(got(20L) == 1 && got(40L) == 1, got.toString)
    // pct bounds validated
    intercept[IllegalArgumentException] {
      SimilarityOps.kmeansOutliers(df, 2, 1, pct = 100)
    }
  }

  // ---- normalizeText -----------------------------------------------------

  test("normalizeText: NFC composes, controls strip, spaces collapse, edges trim") {
    val cases = Seq(
      ("café", "café"),                       // NFC composition
      ("ab", "ab"),                           // control stripped
      ("a  b", "a b"),                        // strip BEFORE collapse
      ("a   b  c", "a b c"),                        // space runs collapse
      ("  padded  ", "padded"),                     // edge trim
      ("tab\there", "tabhere"),                     // \t is a C0 control here
      ("", ""),
      ("café", "café")                         // already-NFC unchanged
    )
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }.toDF("id", "t")
    val got = df.select($"id", TextOps.normalizeText($"t").as("n"))
      .as[(Int, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i) == want, s"case $i: '${got(i)}' != '$want'")
    }
    // null propagates
    val n = Seq((1, null: String)).toDF("id", "t")
      .select(TextOps.normalizeText($"t")).collect()(0)
    assert(n.isNullAt(0))
    // composed and decomposed inputs normalize to the same fingerprint
    val fp = Seq(("café x", "café x")).toDF("a", "b")
      .select(TextOps.fingerprint(TextOps.normalizeText($"a")),
        TextOps.fingerprint(TextOps.normalizeText($"b"))).as[(Long, Long)].head()
    assert(fp._1 == fp._2)
  }

  // ---- blocklistFilter ---------------------------------------------------

  test("blocklistFilter: exact even at absurd fpp (every false positive verified)") {
    val corpus = (1L to 100L).map(i => (i, s"document number $i body")).toDF("id", "text")
    val blocklist = corpus.where($"id" % 10 === 0)
    // fpp 0.5: the Bloom passes ~half the corpus as candidates; the
    // anti-join verify must still produce the exact complement
    val got = DedupOps.blocklistFilter(corpus, blocklist, "id", "text", fpp = 0.5)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == (1L to 100L).filter(_ % 10 != 0))
    // and text-level blocking, not id-level: a doc whose TEXT matches a
    // blocklisted text is removed even with a different id
    val corpus2 = corpus.unionByName(Seq((999L, "document number 10 body")).toDF("id", "text"))
    val got2 = DedupOps.blocklistFilter(corpus2, blocklist, "id", "text")
      .select("id").as[Long].collect().toSeq.sorted
    assert(!got2.contains(999L))
  }
}

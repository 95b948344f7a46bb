package graft.queries

/** Hand-computed units for q305-q307. */
class Round12qSpec extends PlantedQuerySpec {

  import spark.implicits._

  test("q305 bitmaps: 62-bit word packing, cross-word intersection, " +
    "pairs sharing no word are absent") {
    // click days {0, 1, 62}: word0 mask 0b11, word1 bit0.
    // view days {1, 62, 63}: word0 bit1, word1 0b11.
    // inter = 1 (day 1) + 1 (day 62) = 2; union 4 -> jaccard 500000.
    // error day {200} (word 3) shares no word -> no pair rows.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ev(id: Long, ty: String, day: Int) =
      (id, ty, java.sql.Timestamp.from(
        base.plus(java.time.Duration.ofDays(day))))
    val dir = plant("events" -> Seq(
      ev(0L, "click", 0), ev(1L, "click", 1), ev(2L, "click", 62),
      ev(3L, "view", 1), ev(4L, "view", 62), ev(5L, "view", 63),
      ev(6L, "error", 200))
      .toDF("event_id", "event_type", "ts"))
    val plain = run("q305_bitmap_days", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(plain.toSeq == Seq(
      ("click", "view", 3L, 3L, 2L, 4L, 500000L)), plain.mkString(", "))
  }

  test("q306 GIF: packed bit-field decode (flag + 2^(exp+1)), " +
    "corrupted magic comes back NULL") {
    val dir = plant("documents" -> Seq(
      (0L, 50L), (1L, 100L), (2L, 200L))
      .toDF("doc_id", "n_chars"))
    val got = run("q306_gif_metadata", dir).collect()
      .map(r => (r.getLong(0),
        (1 to 5).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
    assert(got.toSeq == Seq(
      (0L, Seq(None, None, None, None, None)),
      (1L, Seq(Some(101L), Some(2L), Some(0L), Some(0L), Some(1L))),
      (2L, Seq(Some(201L), Some(3L), Some(1L), Some(8L), Some(1L)))),
      got.mkString(", "))
  }

  test("gifHeader rejects out-of-range fields instead of masking them") {
    import graft.ops.MultimodalKernels
    // in-range builds fine
    assert(MultimodalKernels.gifHeader(65535, 1, hasGct = true, 7,
      valid = true).length == 13)
    for ((w, h, e) <- Seq((0, 1, 0), (65536, 1, 0), (1, 0, 0),
        (1, 65536, 0), (1, 1, -1), (1, 1, 8))) {
      val thrown = intercept[IllegalArgumentException](
        MultimodalKernels.gifHeader(w, h, hasGct = false, e, valid = true))
      assert(thrown.getMessage.contains("gif"), thrown.getMessage)
    }
  }

  test("q307 second-order lift: the pre-previous event doubles the " +
    "click->next prediction; pure first-order rows sit at lift 1e6") {
    // u1 repeats signup,click,purchase; u2 repeats error,click,view:
    // P(purchase | click) = 1/2 but P(purchase | signup,click) = 1
    // -> lift 2e6 for both pattern heads; the 4 rotated triples are
    // fully first-order (lift exactly 1e6).
    def seqOf(user: Long, pat: Seq[String], reps: Int, idBase: Long) =
      (0 until pat.length * reps).map { i =>
        (idBase + i, user, pat(i % pat.length),
          ts(f"2024-01-01T${i / 60}%02d:${i % 60}%02d:00Z"))
      }
    val rows = seqOf(1L, Seq("signup", "click", "purchase"), 6, 0L) ++
      seqOf(2L, Seq("error", "click", "view"), 6, 100L)
    val dir = plant("events" -> rows
      .toDF("event_id", "user_id", "event_type", "ts"))
    val got = run("q307_markov2_lift", dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("error", "click", "view", 6L, 1000000L, 500000L, 2000000L),
      ("signup", "click", "purchase", 6L, 1000000L, 500000L, 2000000L),
      ("click", "purchase", "signup", 5L, 1000000L, 1000000L, 1000000L),
      ("click", "view", "error", 5L, 1000000L, 1000000L, 1000000L),
      ("purchase", "signup", "click", 5L, 1000000L, 1000000L, 1000000L),
      ("view", "error", "click", 5L, 1000000L, 1000000L, 1000000L)),
      got.mkString(", "))
  }
}

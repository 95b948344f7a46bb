package graft.queries

import org.apache.spark.sql.Row

/** Hand-computed edge units for the round-10 fifth wave (q162-q165),
  * driven through the REAL registered queries on planted fixtures
  * (VERDICT r10 #4).
  */
class Round10eSpec extends PlantedQuerySpec {

  import spark.implicits._

  // ---- q163: linear gap interpolation ---------------------------------------

  test("q163: interpolates exactly between observed days — floor (not " +
    "truncate) on the negative-slope segment, non-%3 days excluded") {
    // observed days are epoch-days % 3 == 0 present in orders:
    //   day 3 (1970-01-04): 60.00 + 40.004 -> 6000 + 4000 = 10000 cents
    //   day 9 (1970-01-10): 251.00        -> 25100
    //   day 12 (1970-01-13): 99.49        -> 9949
    // day 5 (1970-01-06) has an order but 5 % 3 != 0 -> NOT observed.
    val orders = Seq(
      (ts("1970-01-04T00:00:00Z"), 60.0),
      (ts("1970-01-04T12:00:00Z"), 40.004),
      (ts("1970-01-06T00:00:00Z"), 123.45),
      (ts("1970-01-10T00:00:00Z"), 251.0),
      (ts("1970-01-13T00:00:00Z"), 99.49)
    ).toDF("o_orderdate", "o_totalprice")
    val got = run("q163_linear_interp", plant("orders" -> orders))
      .collect()
      .map(r => (r.getDate(0).toString,
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    // rising segment: pv=10000, nv=25100, span 6 days, delta 15100:
    //   d+1: +floor(15100*1/6)=2516 ... d+5: +floor(15100*5/6)=12583
    // falling segment: pv=25100, nv=9949, span 3, delta -15151:
    //   +floor(-15151*1/3)=-5051 (floor, NOT the -5050 truncation),
    //   +floor(-15151*2/3)=-10101
    val expected = Seq(
      ("1970-01-04", Some(10000L), 10000L),
      ("1970-01-05", None, 12516L),
      ("1970-01-06", None, 15033L),
      ("1970-01-07", None, 17550L),
      ("1970-01-08", None, 20066L),
      ("1970-01-09", None, 22583L),
      ("1970-01-10", Some(25100L), 25100L),
      ("1970-01-11", None, 20049L),
      ("1970-01-12", None, 14999L),
      ("1970-01-13", Some(9949L), 9949L))
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q163: a single observed day degenerates to a one-day hull") {
    val orders = Seq((ts("1970-01-04T00:00:00Z"), 60.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = run("q163_linear_interp", plant("orders" -> orders))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("1970-01-04", 6000L, 6000L)), got.mkString(", "))
  }

  // ---- q162: content-address census -----------------------------------------

  test("q162: sha-256 shard census matches an independent JVM digest " +
    "of the planted reference multiset") {
    val texts = (1L to 8L).map(i => i -> s"document body $i")
    val docs = texts.toDF("doc_id", "text")
    val got = run("q162_content_hash", plant("documents" -> docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent digest path: java MessageDigest, not Spark's sha2
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val refs = texts.map(_._2) ++ texts.filter(_._1 % 7 == 0).map(_._2)
    val expected = refs.map(sha).groupBy(_.take(2)).toSeq
      .map { case (shard, ds) => (shard, ds.size.toLong, ds.distinct.size.toLong) }
      .sortBy(_._1)
    assert(got.toSeq == expected, got.mkString(", "))
    // and the planted dup (doc 7, referenced twice) is visible: one
    // shard somewhere carries n_refs > n_objects
    assert(got.map(r => r._2 - r._3).sum == 1L)
  }
}

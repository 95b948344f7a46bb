package graft.queries

/** Hand-computed edge units for the round-10 seventh wave (q170-q174),
  * driven through the REAL registered queries on planted fixtures
  * (VERDICT r10 #4). Centerpiece: the Merkle reconciliation drill on
  * a MULTI-bucket diff — removal, mutation, and untouched buckets in
  * one run.
  */
class Round10gSpec extends PlantedQuerySpec {

  import spark.implicits._

  // q174 derives snapshot B from A inside the query: id % 1999 == 0
  // rows are REMOVED, id % 997 == 0 rows get p_u+1 (MUTATED).
  // Buckets are id % 64. Planted ids and their fates:
  //   id 1    -> bucket 1:  untouched
  //   id 128  -> bucket 0:  untouched
  //   id 997  -> bucket 37: mutated
  //   id 1994 -> bucket 10: mutated (2*997)
  //   id 1999 -> bucket 15: removed
  test("q174: drill-down hits exactly the removed/mutated buckets, " +
    "with a NULL b-side count for a bucket that vanished entirely") {
    val orders = Seq(
      (1L, 10.0, "O"), (128L, 20.0, "O"), (997L, 30.0, "F"),
      (1994L, 40.0, "O"), (1999L, 50.0, "F")
    ).toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val got = run("q174_merkle_diff", plant("orders" -> orders))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val expected = Seq(
      (10L, 1L, Some(1L), 1L),  // mutated: both sides present, 1 diff id
      (15L, 1L, None, 1L),      // removed: bucket absent from B entirely
      (37L, 1L, Some(1L), 1L))  // mutated
    assert(got.toSeq == expected, got.mkString(", "))
  }

  test("q174: identical snapshots produce an empty diff") {
    // ids that neither the removal nor the mutation modulus touches
    val orders = Seq((1L, 10.0, "O"), (2L, 20.0, "O"), (65L, 30.0, "F"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val got = run("q174_merkle_diff", plant("orders" -> orders)).collect()
    assert(got.isEmpty, got.mkString(", "))
  }
}

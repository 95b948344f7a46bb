package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension (type 2) merge: apply an update batch to
  * a versioned dimension, closing changed rows and opening new
  * versions — the warehouse MERGE pattern, expressed as one
  * full-outer join + generator (no MERGE INTO dependency, no
  * driver-side loops).
  *
  * Version bounds are BATCH IDS (exact integers), not wall-clock
  * timestamps: deterministic, oracle-able, and what an idempotent
  * ingest pipeline wants anyway (re-running batch N must not mint new
  * versions).
  *
  * Scale shape: the 100 TB dimension's PAYLOAD never shuffles. A
  * full-outer join would force it to (Spark cannot broadcast any side
  * of a full-outer hash join), so the merge decomposes: the
  * versioning pass is a LEFT join streaming the dimension against the
  * broadcast update batch, and insert detection anti-joins the batch
  * against the dimension's 8-byte KEY COLUMN only. Then a per-row
  * generator emits 1-2 version rows; unchanged and untouched rows
  * pass through unmodified.
  */
object ScdOps {

  /** Merge `updates` (key, attr) into `current` (key, attr,
    * valid_from) at batch `newBatch`. Returns (key, attr, valid_from,
    * valid_to, is_current):
    *  - key absent from updates, or update equals current → row kept
    *    open as-is;
    *  - changed → old row closed at `newBatch` + new open row;
    *  - brand-new key → one open row starting at `newBatch`.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
      attr: String, newBatch: Long): DataFrame = {
    val c = current.select(col(key), col(attr).as("__c_attr"),
      col("valid_from").as("__c_from"))
    val u = updates.select(col(key), col(attr).as("__u_attr"),
      lit(true).as("__has_u"))
    val j = c.join(u, Seq(key), "left")
    val hasU = coalesce(col("__has_u"), lit(false))
    val nullTo = lit(null).cast(LongType)
    val keepOpen = struct(col("__c_attr").as("attr"),
      col("__c_from").as("valid_from"), nullTo.as("valid_to"),
      lit(true).as("is_current"))
    val closeOld = struct(col("__c_attr").as("attr"),
      col("__c_from").as("valid_from"), lit(newBatch).as("valid_to"),
      lit(false).as("is_current"))
    val openNew = struct(col("__u_attr").as("attr"),
      lit(newBatch).as("valid_from"), nullTo.as("valid_to"),
      lit(true).as("is_current"))
    // null-safe compare: a NULL attr on either side must mean "equal
    // iff both NULL" — plain === would make NULL->NULL updates mint a
    // spurious close+reopen (breaking idempotence) and NULL->value /
    // value->NULL fall through the oracle's three branches entirely
    val versions = when(!hasU || (col("__u_attr") <=> col("__c_attr")),
        array(keepOpen))
      .otherwise(array(closeOld, openNew))
    val existing = j.select(col(key), explode(versions).as("v"))
      .select(col(key), col("v.attr").as(attr),
        col("v.valid_from").as("valid_from"),
        col("v.valid_to").as("valid_to"),
        col("v.is_current").as("is_current"))
    val inserts = u.join(current.select(col(key)), Seq(key), "left_anti")
      .select(col(key), col("__u_attr").as(attr),
        lit(newBatch).as("valid_from"), nullTo.as("valid_to"),
        lit(true).as("is_current"))
    existing.union(inserts)
  }

  /** Time-travel over a [[scd2Merge]]-shaped dimension: the rows
    * current AS OF batch `batch` — opened at or before it, not yet
    * closed at it (`valid_from ≤ batch < valid_to`, open rows have
    * NULL `valid_to`). A pure map-side filter: version reconstruction
    * costs one predicate, never a join or a window — the payoff of
    * batch-id version bounds.
    */
  def scd2AsOf(dim: DataFrame, batch: Long): DataFrame =
    dim.where(col("valid_from") <= batch &&
      (col("valid_to").isNull || col("valid_to") > batch))

  /** [[scd2AsOf]] oracle rendering over a dimension subquery. */
  def scd2AsOfSql(dimSql: String, batch: Long): String =
    s"""SELECT * FROM ($dimSql)
       |WHERE valid_from <= $batch
       |  AND (valid_to IS NULL OR valid_to > $batch)""".stripMargin

  /** CDC log compaction: collapse an ordered change log of
    * (key, seq, op, payload...) rows — `op` ∈ {upsert, delete} — to
    * the CURRENT state: per key, the payload of the highest-`seq`
    * entry, dropped entirely when that entry is a delete. The
    * replicated-table catch-up a warehouse runs over a Debezium/binlog
    * feed, as ONE aggregate.
    *
    * `seq` must be unique per key (every real CDC feed's guarantee —
    * log offsets are totally ordered); on a tie `max_by`'s pick is
    * undefined. The whole row rides in one struct through one
    * `max_by`, so the result is row-atomic (no cross-version column
    * mixing) and the aggregate combines map-side: the 100 TB log
    * shuffles one partially-reduced row per (partition, key), never
    * the raw feed. Returns (key, payload..., last_seq).
    */
  def cdcApply(log: DataFrame, key: String, seq: String, op: String,
      payloadCols: Seq[String]): DataFrame =
    log.groupBy(col(key))
      .agg(max_by(struct(col(op).as("__op") +: payloadCols.map(col): _*),
          col(seq)).as("__last"),
        max(col(seq)).as("last_seq"))
      .where(col("__last").getField("__op") =!= "delete")
      .select(col(key) +:
        payloadCols.map(c => col("__last").getField(c).as(c)) :+
        col("last_seq"): _*)

  /** [[cdcApply]] oracle rendering. `logSql` must yield
    * (key, seq, op, payload...).
    *
    * The payload pick MUST be a single struct-valued `arg_max` (then
    * unpacked), mirroring Spark's `max_by(struct, seq)`: DuckDB's
    * `arg_max(v, seq)` SKIPS rows where `v` is NULL, so a per-column
    * rendering would resurrect a stale non-NULL value whenever the
    * highest-seq CDC row carries a NULL payload column — common in
    * real feeds. `struct_pack` is never NULL even when every field
    * is, so the struct form is row-atomic regardless of payload
    * nullness (verified: per-column arg_max over
    * {(1,10.0),(2,20.0),(3,NULL)} returns 20.0; the struct form
    * returns NULL).
    */
  def cdcApplySql(logSql: String, key: String, seq: String, op: String,
      payloadCols: Seq[String]): String = {
    val packed = (s"__op := $op" +: payloadCols.map(c => s"$c := $c"))
      .mkString(", ")
    val picks = payloadCols
      .map(c => s"(__last).$c AS $c").mkString(",\n  ")
    s"""WITH __cdc_agg AS (
       |  SELECT $key,
       |    arg_max(struct_pack($packed), $seq) AS __last,
       |    CAST(max($seq) AS BIGINT) AS last_seq
       |  FROM ($logSql)
       |  GROUP BY $key)
       |SELECT $key,
       |  $picks,
       |  last_seq
       |FROM __cdc_agg
       |WHERE (__last).__op <> 'delete'""".stripMargin
  }

  /** [[scd2Merge]] oracle rendering. `curSql` must yield (key, attr,
    * valid_from), `updSql` (key, attr).
    */
  def scd2MergeSql(curSql: String, updSql: String, key: String,
      attr: String, newBatch: Long): String =
    s"""WITH __cur AS ($curSql),
       |__upd AS ($updSql),
       |__j AS (SELECT coalesce(c.$key, u.$key) AS $key,
       |    c.$attr AS c_attr, c.valid_from AS c_from, u.$attr AS u_attr,
       |    c.$key IS NOT NULL AS has_c, u.$key IS NOT NULL AS has_u
       |  FROM __cur c FULL OUTER JOIN __upd u ON c.$key = u.$key)
       |SELECT $key, c_attr AS $attr, c_from AS valid_from,
       |  CAST(NULL AS BIGINT) AS valid_to, true AS is_current
       |FROM __j WHERE has_c AND (NOT has_u OR u_attr IS NOT DISTINCT FROM c_attr)
       |UNION ALL
       |SELECT $key, c_attr, c_from, $newBatch, false
       |FROM __j WHERE has_c AND has_u AND u_attr IS DISTINCT FROM c_attr
       |UNION ALL
       |SELECT $key, u_attr, $newBatch, CAST(NULL AS BIGINT), true
       |FROM __j WHERE has_u AND (NOT has_c OR u_attr IS DISTINCT FROM c_attr)""".stripMargin
}

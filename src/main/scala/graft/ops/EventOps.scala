package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-stream operators over the `events` fixture: JSON property
  * extraction, event-time tumbling / sliding / session windows.
  *
  * Each windowing op exists in BATCH form (below, oracle-verified
  * against DuckDB time_bucket / gaps-and-islands SQL) and in
  * STREAMING form ([[streaming]]) on `readStream` sources with
  * watermarks — identical expressions, so batch results ARE the
  * expected streaming outputs (Structured Streaming's unified model).
  *
  * Scale: tumbling/sliding aggs are partial+final hash aggregates
  * (one shuffle on the group keys); session windows shuffle on
  * user_id. Window starts are emitted as epoch seconds/micros
  * (bigint) — timestamps don't round-trip parquet identically across
  * engines, exact integers do.
  */
object EventOps {

  /** props is a JSON string like {"k": 87}; extraction by regexp so
    * the oracle is engine-identical (DuckDB's json extension isn't
    * assumed).
    */
  def jsonK(props: Column): Column =
    regexp_extract(props, "\"k\": ([0-9]+)", 1)
      .try_cast(org.apache.spark.sql.types.IntegerType) // no-match -> '' -> null (ANSI-safe)

  def jsonKSql(e: String): String =
    s"""TRY_CAST(regexp_extract($e, '"k": ([0-9]+)', 1) AS INTEGER)"""

  /** Tumbling 1-hour windows: (window start epoch-sec, event_type) →
    * count + 2-decimal sum(value).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor(sum(col("value")) * 100 + lit(0.5)).cast("double") / 100.0).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  val tumblingSql: String =
    """SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS ws, event_type,
      |  count(*) AS n, (floor(sum(value) * 100 + 0.5) / 100.0) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2). */
  def slidingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"))

  /** DuckDB: generate the 2 covering window starts per event. */
  val slidingSql: String =
    """SELECT ws, event_type, count(*) AS n
      |FROM (SELECT epoch(time_bucket(INTERVAL 30 MINUTE, ts))::BIGINT - k * 1800 AS ws,
      |             event_type
      |      FROM events, unnest([0, 1]) AS u(k)) b
      |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** Session windows per user with a gap timeout: (user_id, session
    * start epoch-µs, events-in-session). A gap of EXACTLY `gap` still
    * merges (Spark's session windows are end-inclusive — verified
    * empirically; the islands oracle below uses strict `>`).
    */
  def sessionize(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"), col("n"))

  /** Gaps-and-islands twin (strict > for the end-inclusive boundary). */
  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, epoch_us(min(ts)) AS session_start, count(*) AS n
      |FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** As-of join: for every left row, the latest right row with
    * `right.ts <= left.ts` for the same key (ties include the
    * equal-timestamp right row, matching DuckDB `ASOF JOIN ... >=`).
    *
    * Spark has no native as-of join; the classic scalable shape is
    * union-the-sides + running `last(_, ignoreNulls)` over
    * (key, ts, side): ONE shuffle on the key, a linear per-partition
    * scan, no range-join row explosion. `right` must be
    * (key, ts, payload...) with payload names disjoint from `left`'s;
    * output = left.* + `asof_<payload>`... + `asof_ts`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(!payload.contains("__ts"),
      "asofJoin: right payload column named __ts collides with the struct's timestamp field")
    val l = left.withColumn("__side", lit(1))
    // The whole right row rides in ONE struct and is picked by ONE
    // `last(ignoreNulls)`, so the result is row-ATOMIC: a null payload
    // field in the picked row stays null instead of back-filling from
    // an earlier right row (which per-column last() would do). Payload
    // columns still break (key, ts) ties deterministically — the pick
    // is the greatest payload tuple at the shared timestamp.
    val r = right.withColumn("__side", lit(0))
      .withColumn("__rrow", struct(col(ts).as("__ts") +: payload.map(col): _*))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc +: col("__side").asc +: payload.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        // getField, not a "__asof.<c>" string path: a payload name
        // containing a dot would break dotted-path resolution
        payload.map(c => col("__asof").getField(c).as(s"asof_$c")) :+
        col("__asof").getField("__ts").as("asof_ts"): _*)
  }

  /** Range self-join: pairs of events of the same key with
    * `0 < b.ts - a.ts <= window`. A naive theta-join is a per-key cross
    * product; the scalable shape is BUCKETING — bin timestamps to
    * window-sized buckets, explode the left side into (bucket,
    * bucket+1), equi-join on (key, bucket), then apply the exact range
    * filter. Every qualifying pair matches exactly one bucket replica,
    * so no dedup pass is needed; the join is a plain hash join on
    * (key, bucket).
    */
  def rangeSelfJoin(events: DataFrame, key: String, ts: String,
      windowMicros: Long): DataFrame = {
    val e = events.select(col(key), col("event_id"),
      unix_micros(col(ts)).as("tus"))
    val a = e.withColumn("__b",
        explode(array(expr(s"tus div $windowMicros"), expr(s"tus div $windowMicros") + 1)))
      .select(col(key), col("event_id").as("a_id"), col("tus").as("a_tus"), col("__b"))
    val b = e.withColumn("__b", expr(s"tus div $windowMicros"))
      .select(col(key), col("event_id").as("b_id"), col("tus").as("b_tus"), col("__b"))
    a.join(b, Seq(key, "__b"))
      .where(col("b_tus") > col("a_tus") && col("b_tus") <= col("a_tus") + windowMicros)
      .select(col(key), col("a_id"), col("b_id"),
        (col("b_tus") - col("a_tus")).as("delta_us"))
  }

  /** Ordered funnel analysis: for each user, the earliest time of
    * step 0, then the earliest step-1 event within `deadlineHours` of
    * that, then the earliest step-2 event within the deadline of THAT,
    * etc. Returns (userCol, t0 .. t{n-1}) as epoch-microsecond longs,
    * null from the first step the user never reached (a LEFT join per
    * step keeps non-converters).
    *
    * Scale shape: one user-keyed aggregate plus one user-keyed left
    * join per step — every exchange keys on the same user column, so
    * AQE reuses the partitioning across steps; nothing collects and
    * no per-user event lists materialize (the alternative
    * collect_list + per-row scan formulation holds a user's whole
    * history in one row — this one never does).
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], deadlineHours: Int): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(deadlineHours > 0, s"deadlineHours must be positive: $deadlineHours")
    val e = events.select(col(userCol), col(typeCol), col(tsCol))
    var acc = e.where(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t0"))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val nxt = e.where(col(typeCol) === step).as("e")
        .join(acc.select(col(userCol).as("__u"), col(s"t$i")),
          col(userCol) === col("__u") &&
            col(tsCol) >= col(s"t$i") &&
            col(tsCol) <= col(s"t$i") + expr(s"INTERVAL $deadlineHours HOURS"))
        .groupBy(col(userCol)).agg(min(tsCol).as(s"t${i + 1}"))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    acc.select(col(userCol) +: steps.indices.map(i =>
      unix_micros(col(s"t$i")).as(s"t${i}_us")): _*)
  }

  /** [[funnelSteps]] oracle rendering over the `events` view. */
  def funnelStepsSql(userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], deadlineHours: Int): String = {
    val s0 =
      s"""__s0 AS (SELECT $userCol, min($tsCol) AS t0 FROM events
         |  WHERE $typeCol = '${steps.head}' GROUP BY 1)""".stripMargin
    val rest = steps.tail.zipWithIndex.map { case (step, i) =>
      s"""__s${i + 1} AS (SELECT e.$userCol, min(e.$tsCol) AS t${i + 1}
         |  FROM events e JOIN __s$i s ON e.$userCol = s.$userCol
         |   AND e.$tsCol >= s.t$i
         |   AND e.$tsCol <= s.t$i + INTERVAL $deadlineHours HOUR
         |  WHERE e.$typeCol = '$step' GROUP BY 1)""".stripMargin
    }
    val joins = steps.indices.tail
      .map(i => s"LEFT JOIN __s$i USING ($userCol)").mkString(" ")
    val cols = steps.indices.map(i => s"epoch_us(t$i) AS t${i}_us").mkString(", ")
    s"""WITH ${(s0 +: rest).mkString(",\n")}
       |SELECT $userCol, $cols FROM __s0 $joins""".stripMargin
  }

  /** First-order Markov transition matrix of event types per user:
    * count and conditional probability of `cur` following `prev` in
    * the user's (ts, event_id)-ordered stream — the behavioral
    * signature a sequence model or anomaly detector starts from.
    * Returns (prev, cur, n, p) with p = n / Σ_cur n (ONE division of
    * exact integers). (ts, event_id) is a total order, so lag is
    * deterministic on any layout.
    *
    * Scale shape: one user-keyed window (each user's history stays
    * on one partition — the sessionize shape) + one tiny
    * (prev, cur)-keyed count; the per-prev totals are a window over
    * the type×type matrix (constant-size).
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val seq = Window.partitionBy(userCol).orderBy(col(tsCol), col("event_id"))
    val tr = events
      .withColumn("prev", lag(col(typeCol), 1).over(seq))
      .where(col("prev").isNotNull)
    val cnt = tr.groupBy(col("prev"), col(typeCol).as("cur"))
      .agg(count(lit(1)).as("n"))
    cnt.withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("prev")).cast("double"))
      .orderBy("prev", "cur")
  }

  /** [[transitionMatrix]] oracle rendering over the `events` view. */
  def transitionMatrixSql(userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): String =
    s"""WITH tr AS (SELECT lag($typeCol) OVER (PARTITION BY $userCol
       |      ORDER BY $tsCol, event_id) AS prev, $typeCol AS cur
       |  FROM events),
       |cnt AS (SELECT prev, cur, count(*) AS n FROM tr
       |  WHERE prev IS NOT NULL GROUP BY 1, 2)
       |SELECT prev, cur, n,
       |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE) AS p
       |FROM cnt ORDER BY prev, cur""".stripMargin

  /** Structured Streaming variants: identical expressions over a
    * streaming frame, with an event-time watermark bounding state.
    * Used with MemoryStream in tests; `readStream.parquet(dir)` in
    * production.
    */
  object streaming {

    /** Custom arbitrary-state operator: running event count per user
      * via `mapGroupsWithState` (the escape hatch when built-in window
      * aggs can't express the state machine). Emits the updated total
      * for every user touched in a micro-batch; state is one long per
      * user, bounded by the user-id domain.
      */
    final case class UserCount(user_id: Long, n: Long)

    def runningCountsPerUser(events: DataFrame): Dataset[UserCount] = {
      val spark = events.sparkSession
      import spark.implicits._
      events.selectExpr("user_id").as[Long]
        .groupByKey(identity)
        .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
          (uid, it, state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + it.size
            state.update(n)
            UserCount(uid, n)
        }
    }
    def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
      events.withWatermark("ts", watermark)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))

    def sessionize(events: DataFrame, gap: String = "10 minutes",
        watermark: String = "2 hours"): DataFrame =
      events.withWatermark("ts", watermark)
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start"), col("n"))

    /** Closed sessions via `flatMapGroupsWithState` with an event-time
      * timeout — the fully-custom state machine (per-user open-session
      * buffer; a session is EMITTED only once it closes, either because
      * a later event arrives beyond the gap or because the watermark
      * passes the timeout). Demonstrates the arbitrary-state API the
      * built-in session_window can't express (e.g. sessions that also
      * carry custom accumulated payloads).
      */
    final case class SessionState(start: Long, lastTs: Long, n: Long)
    final case class ClosedSession(user_id: Long, session_start: Long, n: Long)

    def closedSessions(events: DataFrame, gapMicros: Long = 10L * 60 * 1000000,
        watermark: String = "10 minutes"): Dataset[ClosedSession] = {
      val spark = events.sparkSession
      import spark.implicits._
      events.withWatermark("ts", watermark)
        .selectExpr("user_id", "unix_micros(ts) AS tus", "ts")
        .as[(Long, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[SessionState, ClosedSession](
          org.apache.spark.sql.streaming.OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
          (uid, rows, state: GroupState[SessionState]) =>
            if (state.hasTimedOut) {
              val s = state.get
              state.remove()
              Iterator(ClosedSession(uid, s.start, s.n))
            } else {
              val sorted = rows.map(_._2).toSeq.sorted
              var st = state.getOption
              val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
              sorted.foreach { t =>
                st match {
                  case Some(s) if t - s.lastTs <= gapMicros =>
                    st = Some(s.copy(lastTs = t, n = s.n + 1))
                  case Some(s) =>
                    closed += ClosedSession(uid, s.start, s.n)
                    st = Some(SessionState(t, t, 1))
                  case None =>
                    st = Some(SessionState(t, t, 1))
                }
              }
              st.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp((s.lastTs + gapMicros) / 1000 + 1)
              }
              closed.iterator
            }
        }
    }
  }
}

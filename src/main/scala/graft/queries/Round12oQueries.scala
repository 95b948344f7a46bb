package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.MixOps

/** Round-12 fifteenth wave: marketing/experimentation analytics the
  * engine still owed — multi-touch attribution by Markov removal
  * effects (q297), the sample-ratio-mismatch health check every A/B
  * platform runs before reading an experiment (q298), local-DP
  * randomized response with debiased frequency estimation (q299), and
  * the interval-overlap self-join (q300). All integer grids; the one
  * driver-side step (q297's absorption recursion) rides a ≤36-row
  * census — the k-means bounded-collect class — and the oracle
  * replays the identical truncated-ppm recursion as unrolled CTEs.
  */
object Round12oQueries {

  // -- q297: Markov removal-effect attribution ----------------------------------
  // Which channels actually DRIVE conversion? Per-user journeys
  // (segments split after each purchase) feed a first-order Markov
  // census START/{click,view,signup,error}/{CONV,NULL}; transition
  // probabilities are ppm trunc-div picks; the 12-step conversion
  // mass a(START) is computed for the base chain and for each
  // channel-removed chain (transitions from AND into the channel
  // dropped, no renormalization — the standard removal-effect
  // definition), and a channel's attribution share is its removal
  // effect over the sum of positive effects. The fact-sized work is
  // the per-user window + the census shuffle; the recursion runs on
  // the collected ≤36-row census in exact integer arithmetic
  // (a_i ← T[i→CONV] + (Σ_j T[i→j]·a_j) div 1e6, division AFTER the
  // sum), replayed verbatim by the oracle's 12 unrolled CTEs.
  private val MkChannels = Seq("click", "error", "signup", "view")
  private val MkSteps = 12

  private def q297(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq0 = Tables.read(spark, sfDir, "events")
      .select(col("user_id"), col("event_type").as("et"), col("ts"),
        col("event_id"))
      .withColumn("seg", coalesce(sum(when(col("et") === "purchase", 1L))
        .over(wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wSeg = Window.partitionBy(col("user_id"), col("seg"))
      .orderBy(col("ts"), col("event_id"))
    val nxt = seq0
      .withColumn("net", lead(col("et"), 1).over(wUser))
      .withColumn("nseg", lead(col("seg"), 1).over(wUser))
      .withColumn("rn", row_number().over(wSeg))
    val absorb = (c: org.apache.spark.sql.Column) =>
      when(c === "purchase", "CONV").otherwise(c)
    val trans = nxt.where(col("rn") === 1)
      .select(lit("START").as("f"), absorb(col("et")).as("t"))
      .unionAll(nxt.where(col("et") =!= "purchase" &&
          col("net").isNotNull && col("nseg") === col("seg"))
        .select(col("et").as("f"), absorb(col("net")).as("t")))
      .unionAll(nxt.where(col("et") =!= "purchase" &&
          (col("net").isNull || col("nseg") =!= col("seg")))
        .select(col("et").as("f"), lit("NULL").as("t")))
    val census = trans.groupBy(col("f"), col("t"))
      .agg(count(lit(1)).as("c"))
    val rowt = census.groupBy(col("f").as("rf")).agg(sum(col("c")).as("rt"))
    // ≤ 36 rows: (START + 4 channels) × (4 channels + CONV + NULL)
    val tp: Map[(String, String), Long] = census
      .join(rowt, col("f") === col("rf"))
      .select(col("f"), col("t"), expr("c * 1000000 div rt").as("p_u"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def converge(removed: Option[String]): Long = {
      val keep = tp.filter { case ((f, t), _) =>
        !removed.contains(f) && !removed.contains(t)
      }
      val states = "START" +: MkChannels
      var a = states.map(_ -> 0L).toMap
      for (_ <- 0 until MkSteps) {
        a = states.map { f =>
          val direct = keep.getOrElse((f, "CONV"), 0L)
          val carried = MkChannels.map(j =>
            keep.getOrElse((f, j), 0L) * a(j)).sum / 1000000L
          f -> (direct + carried)
        }.toMap
      }
      a("START")
    }
    val base = converge(None)
    val effects = MkChannels.map { c =>
      val without = converge(Some(c))
      (c, base, without, base - without)
    }
    val te = effects.map(_._4).filter(_ > 0).sum
    effects.map { case (c, b, w, e) =>
      (c, b, w, e,
        if (te > 0 && e > 0) Some(e * 1000000L / te) else None)
    }.toDF("channel", "base_conv_ppm", "conv_without_ppm",
      "removal_effect_ppm", "share_ppm")
      .orderBy(col("channel"))
  }

  private val q297Oracle: String = {
    val iters = (1 until MkSteps).map { k =>
      s"""a$k AS (SELECT tps.s, tps.f,
         |    coalesce(sum(CASE WHEN t = 'CONV' THEN p_u END), 0)
         |    + coalesce(CAST(sum(p_u * a.a) // 1000000 AS BIGINT), 0) AS a
         |  FROM tps LEFT JOIN a${k - 1} a ON a.s = tps.s AND a.f = tps.t
         |    AND tps.t NOT IN ('CONV', 'NULL')
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val scenVals = ("BASE" +: MkChannels).map(s => s"('$s')").mkString(",")
    s"""WITH seq AS (SELECT user_id, event_type AS et, ts, event_id,
       |    coalesce(count(*) FILTER (event_type = 'purchase') OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
       |  FROM events),
       |nxt AS (SELECT user_id, seg, et, ts, event_id,
       |    lead(et) OVER w AS net, lead(seg) OVER w AS nseg,
       |    row_number() OVER w2 AS rn
       |  FROM seq
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       |    w2 AS (PARTITION BY user_id, seg ORDER BY ts, event_id)),
       |trans AS (
       |  SELECT 'START' AS f,
       |    CASE WHEN et = 'purchase' THEN 'CONV' ELSE et END AS t
       |  FROM nxt WHERE rn = 1
       |  UNION ALL
       |  SELECT et, CASE WHEN net = 'purchase' THEN 'CONV' ELSE net END
       |  FROM nxt WHERE et <> 'purchase' AND net IS NOT NULL
       |    AND nseg = seg
       |  UNION ALL
       |  SELECT et, 'NULL'
       |  FROM nxt WHERE et <> 'purchase'
       |    AND (net IS NULL OR nseg <> seg)),
       |census AS (SELECT f, t, count(*) AS c FROM trans GROUP BY 1, 2),
       |rowt AS (SELECT f, CAST(sum(c) AS BIGINT) AS rt
       |  FROM census GROUP BY 1),
       |tp AS (SELECT f, t, CAST(c * 1000000 // rt AS BIGINT) AS p_u
       |  FROM census JOIN rowt USING (f)),
       |scen AS (SELECT s FROM (VALUES $scenVals) v(s)),
       |tps AS (SELECT s, f, t, p_u FROM tp, scen
       |  WHERE f <> s AND t <> s),
       |a0 AS (SELECT s, f,
       |    coalesce(sum(CASE WHEN t = 'CONV' THEN p_u END), 0) AS a
       |  FROM tps GROUP BY 1, 2),
       |$iters,
       |fin AS (SELECT s, a FROM a${MkSteps - 1} WHERE f = 'START'),
       |basep AS (SELECT a AS ab FROM fin WHERE s = 'BASE'),
       |eff AS (SELECT s AS channel, CAST(ab AS BIGINT) AS base_conv_ppm,
       |    CAST(a AS BIGINT) AS conv_without_ppm,
       |    CAST(ab - a AS BIGINT) AS removal_effect_ppm
       |  FROM fin, basep WHERE s <> 'BASE'),
       |tot AS (SELECT CAST(sum(CASE WHEN removal_effect_ppm > 0
       |    THEN removal_effect_ppm ELSE 0 END) AS BIGINT) AS te FROM eff)
       |SELECT channel, base_conv_ppm, conv_without_ppm,
       |  removal_effect_ppm,
       |  CASE WHEN te > 0 AND removal_effect_ppm > 0
       |    THEN CAST(removal_effect_ppm * 1000000 // te AS BIGINT)
       |  END AS share_ppm
       |FROM eff, tot ORDER BY channel""".stripMargin
  }

  // -- q298: sample-ratio mismatch (SRM) check -----------------------------------
  // The pre-read health check of every experiment platform: assign
  // orders to 50/30/20 arms with the portable two-round hash
  // ([[MixOps.assignSplit]] — the same assignment q80 ships), then
  // chi-square goodness-of-fit of observed arm counts against the
  // nominal fractions. Expected counts are exact rationals
  // (n·num/10), each χ² term is ONE fixed IEEE expression over exact
  // integers — (10·O − n·num)² / (10·n·num) — landed on the 1e-6 grid
  // before the sum, and the 5% verdict compares against the
  // χ²(0.95, df=2) literal 5.991465 in ppm. One aggregate over the
  // assignment; everything else is 3 rows.
  private val SrmSeed = 20240401L
  private val SrmFracs = Seq(("control", 0.5), ("treat_a", 0.3),
    ("treat_b", 0.2))
  private val SrmNum = Map("control" -> 5L, "treat_a" -> 3L,
    "treat_b" -> 2L)
  private val Chi2Crit95Df2Ppm = 5991465L

  private def q298(spark: SparkSession, sfDir: String): DataFrame = {
    val arms = MixOps.assignSplit(
      Tables.read(spark, sfDir, "orders").select(col("o_orderkey")),
      "o_orderkey", SrmSeed, SrmFracs)
    val counts = arms.groupBy(col("split").as("arm"))
      .agg(count(lit(1)).as("observed"))
      .localCheckpoint(true) // total + per-arm terms
    val tot = counts.agg(sum(col("observed")).as("__n"))
    val byArm = counts.crossJoin(broadcast(tot))
      .withColumn("num", element_at(
        typedLit(SrmNum), col("arm")))
      .select(col("arm"), col("observed"),
        expr("__n * num div 10").as("expected_floor"),
        floor(
          pow(col("observed") * 10 - col("__n") * col("num"), 2)
            .cast("double") /
            (col("__n") * col("num") * 10).cast("double") * 1000000 +
            lit(0.5)).cast(LongType).as("term_u"))
      .localCheckpoint(true) // summed once more for the verdict
    val chi = byArm.agg(sum(col("term_u")).as("chi2_u"))
    byArm.crossJoin(broadcast(chi))
      .select(col("arm"), col("observed"), col("expected_floor"),
        col("term_u"), col("chi2_u"),
        (col("chi2_u") > Chi2Crit95Df2Ppm).as("srm"))
      .orderBy(col("arm"))
  }

  private val q298Oracle: String = {
    val assign = MixOps.assignSplitSql("o_orderkey", SrmSeed, SrmFracs)
    val numCase = SrmNum.toSeq.sortBy(_._1)
      .map { case (a, n) => s"WHEN '$a' THEN $n" }.mkString(" ")
    s"""WITH arms AS (SELECT $assign AS arm FROM orders),
       |counts AS (SELECT arm, count(*) AS observed FROM arms GROUP BY 1),
       |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM counts),
       |byarm AS (SELECT arm, observed,
       |    CAST(CASE arm $numCase END AS BIGINT) AS num, n
       |  FROM counts, tot),
       |terms AS (SELECT arm, observed,
       |    CAST(n * num // 10 AS BIGINT) AS expected_floor,
       |    CAST(floor(
       |      CAST((observed * 10 - n * num) * (observed * 10 - n * num)
       |        AS DOUBLE) / CAST(n * num * 10 AS DOUBLE)
       |      * 1000000 + 0.5) AS BIGINT) AS term_u
       |  FROM byarm),
       |chi AS (SELECT CAST(sum(term_u) AS BIGINT) AS chi2_u FROM terms)
       |SELECT arm, observed, expected_floor, term_u, chi2_u,
       |  chi2_u > $Chi2Crit95Df2Ppm AS srm
       |FROM terms, chi ORDER BY arm""".stripMargin
  }

  // -- q299: local-DP randomized response + debias -------------------------------
  // Generalized randomized response over event_type (k = 5): each
  // report stays truthful when the first hash draw clears the p = 3/4
  // threshold, otherwise reports a uniform draw over ALL k types from
  // the second hash — both draws replayable integer hashes (the
  // q128/q217 replayed-randomness pattern), so the mechanism is
  // deterministic and the unbiased estimator
  // est = (20·obs − n) / 15 (exactly (obs − n·q_other)/(q_true −
  // q_other) with q_true = 4/5, q_other = 1/20) is an integer
  // cross-multiplication. The signed division is sign·(abs div 15) on
  // both engines; the audit emits per-type absolute error vs truth.
  private val LdpSeedKeep = 7101L
  private val LdpSeedDraw = 7102L
  private val LdpTypes = Seq("click", "error", "purchase", "signup", "view")

  private def q299(spark: SparkSession, sfDir: String): DataFrame = {
    val p = MixOps.P
    val keepT = math.floor(0.75 * p).toLong
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"))
    val reported = ev.select(col("event_type"),
        when(MixOps.portableHash2(col("event_id"), LdpSeedKeep) < keepT,
          col("event_type"))
          .otherwise(element_at(
            typedLit(LdpTypes),
            (MixOps.portableHash2(col("event_id"), LdpSeedDraw) % 5 + 1)
              .cast("int")))
          .as("reported"))
      .localCheckpoint(true) // truth census + report census
    val truth = reported.groupBy(col("event_type").as("ty"))
      .agg(count(lit(1)).as("true_n"))
    val obs = reported.groupBy(col("reported").as("ty"))
      .agg(count(lit(1)).as("reported_n"))
    val n = reported.agg(count(lit(1)).as("__n"))
    truth.join(obs, Seq("ty"), "full")
      .select(col("ty").as("event_type"),
        coalesce(col("true_n"), lit(0L)).as("true_n"),
        coalesce(col("reported_n"), lit(0L)).as("reported_n"))
      .crossJoin(broadcast(n))
      .withColumn("__raw", col("reported_n") * 20 - col("__n"))
      .select(col("event_type"), col("true_n"), col("reported_n"),
        (when(col("__raw") < 0, -1L).otherwise(1L) *
          expr("abs(__raw) div 15")).as("est_n"))
      .withColumn("abs_err_ppm",
        expr("abs(est_n - true_n) * 1000000 div true_n"))
      .orderBy(col("event_type"))
  }

  private val q299Oracle: String = {
    val p = MixOps.P
    val keepT = math.floor(0.75 * p).toLong
    def h2(seed: Long) =
      s"(((event_id % $p + $seed) * 48271) % $p + 1) * 69621 % $p"
    val arr = LdpTypes.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH rep AS (SELECT event_type,
       |    CASE WHEN ${h2(LdpSeedKeep)} < $keepT THEN event_type
       |      ELSE $arr[CAST(${h2(LdpSeedDraw)} % 5 AS INTEGER) + 1]
       |    END AS reported
       |  FROM events),
       |truth AS (SELECT event_type AS ty, count(*) AS true_n
       |  FROM rep GROUP BY 1),
       |obs AS (SELECT reported AS ty, count(*) AS reported_n
       |  FROM rep GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM rep),
       |j AS (SELECT coalesce(truth.ty, obs.ty) AS event_type,
       |    coalesce(true_n, 0) AS true_n,
       |    coalesce(reported_n, 0) AS reported_n,
       |    CAST(coalesce(reported_n, 0) * 20 - n AS BIGINT) AS raw
       |  FROM truth FULL JOIN obs ON truth.ty = obs.ty, n)
       |SELECT event_type, CAST(true_n AS BIGINT) AS true_n,
       |  CAST(reported_n AS BIGINT) AS reported_n,
       |  CAST((CASE WHEN raw < 0 THEN -1 ELSE 1 END)
       |    * (abs(raw) // 15) AS BIGINT) AS est_n,
       |  CAST(abs((CASE WHEN raw < 0 THEN -1 ELSE 1 END)
       |    * (abs(raw) // 15) - true_n) * 1000000 // true_n AS BIGINT)
       |    AS abs_err_ppm
       |FROM j ORDER BY event_type""".stripMargin
  }

  // -- q300: interval-overlap self-join ------------------------------------------
  // Overlapping order-validity windows ([orderdate, orderdate+30d))
  // of the SAME customer, rolled up per market segment — the
  // interval×interval join shape (SCD2 / booking-conflict class). The
  // join is customer-keyed EQUI with the overlap predicate as a
  // residual, so the fan-out is bounded by orders-per-customer, never
  // a time-bucket cartesian; half-open windows make touching
  // intervals disjoint; the customer dimension broadcasts.
  private val OvDays = 30

  private def q300(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Tables.read(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("s"))
      .withColumn("e", date_add(col("s"), OvDays))
    val b = w.select(col("o_custkey").as("ck2"),
      col("o_orderkey").as("ok2"), col("s").as("s2"), col("e").as("e2"))
    val pairs = w.join(b,
        col("o_custkey") === col("ck2") &&
          col("o_orderkey") < col("ok2") &&
          col("s") < col("e2") && col("s2") < col("e"))
      .select(col("o_custkey"),
        datediff(least(col("e"), col("e2")),
          greatest(col("s"), col("s2"))).cast(LongType).as("ov"))
    pairs.join(broadcast(Tables.read(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
      col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ov")).as("sum_overlap_days"))
      .orderBy(col("c_mktsegment"))
  }

  private val q300Oracle: String =
    s"""WITH w AS (SELECT o_custkey, o_orderkey,
       |    CAST(o_orderdate AS DATE) AS s,
       |    CAST(o_orderdate AS DATE) + $OvDays AS e
       |  FROM orders),
       |pairs AS (SELECT a.o_custkey,
       |    CAST(datediff('day', greatest(a.s, b.s), least(a.e, b.e))
       |      AS BIGINT) AS ov
       |  FROM w a JOIN w b ON a.o_custkey = b.o_custkey
       |    AND a.o_orderkey < b.o_orderkey
       |    AND a.s < b.e AND b.s < a.e)
       |SELECT c_mktsegment, count(*) AS n_pairs,
       |  CAST(sum(ov) AS BIGINT) AS sum_overlap_days
       |FROM pairs JOIN customer ON c_custkey = o_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q297_markov_attribution", q297, Some(q297Oracle)),
    QueryDef("q298_srm_check", q298, Some(q298Oracle)),
    QueryDef("q299_ldp_freq", q299, Some(q299Oracle)),
    QueryDef("q300_interval_overlap", q300, Some(q300Oracle)))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid machinery for fixed-radius spatial ops (the q347 DBSCAN census
  * and q357 grid-kNN) whose cell side ADAPTS to point density instead
  * of being pinned to the radius R.
  *
  * The legacy 3x3 scheme (cell side = R) enumerates every candidate
  * pair inside a 9R^2 window; candidate count grows with density^2
  * (the measured 121 s / 154 s at 10x density, VERDICT r13). Here the
  * window's cell offsets are classified ONCE, driver-side, by exact
  * integer min/max distance bounds:
  *
  *  - FULL offsets (max possible cross-cell distance <= R): every
  *    cross pair is within R BY CONSTRUCTION, so the whole offset
  *    contributes through a per-cell COUNT census — never enumerated
  *    point-by-point. At high density this is where almost all of the
  *    quadratic neighbor mass goes, at census (not pair) cost.
  *  - PARTIAL offsets (min <= R < max): the only point-level work — a
  *    ring of width O(cell) straddling the radius boundary (~6*pi*R*s
  *    area vs the legacy 9R^2 box).
  *  - Everything else is provably outside R and dropped at
  *    classification time.
  *
  * With cell ~ density^{-1/2} (see [[adaptiveSide]]) the enumerated
  * ring tracks the geometric boundary, so per-point pair work scales
  * with sqrt(density) instead of density — the 100 TB shape for dense
  * spatial data. Exactness: the classification bounds are integer
  * arithmetic on worst-case in-cell positions, so results are
  * bit-identical to the 3x3 path at ANY cell side; the adaptive
  * queries (q378/q379) are gated by the SAME DuckDB oracles as
  * q347/q357.
  */
object SpatialOps {

  /** Input contract for every point frame in this object (ADVICE
    * r14): x and y must be NONNEGATIVE integers with x/s and y/s
    * below 2^21. Spark's `div` truncates toward zero, so a negative
    * coordinate would fold cells around 0 and silently corrupt the
    * exact offset classification; a caller with signed coordinates
    * shifts them nonnegative first (distance is translation-
    * invariant). [[adaptiveSide]] enforces this driver-side on its
    * one scalar aggregate; the per-point paths document rather than
    * scan — a data-level require would cost a full pass. */
  private def requireNonneg(x0: Long, y0: Long, x1: Long, y1: Long, s: Long): Unit =
    require(x0 >= 0L && y0 >= 0L && x1 / s < M && y1 / s < M,
      s"SpatialOps needs nonnegative coords with coord/s < 2^21, got " +
        s"x in [$x0,$x1], y in [$y0,$y1], s=$s")

  /** (cx, cy) packs into cx*M + cy. 2^21 exceeds any cell-coordinate
    * span this machinery sees (side >= 32 over a <=2^20 grid); an
    * offset that underflows cy lands on a phantom cell no point
    * occupies, so edge cells need no special casing. */
  private val M = 1L << 21

  final case class Offsets(
      full: Seq[(Long, Long)], partial: Seq[(Long, Long)], side: Long) {
    def selfFull: Boolean = full.contains((0L, 0L))
  }

  /** Exact integer reachability classification of cell offsets for
    * radius `r` and cell side `s`: for integer points a in cell (0,0)
    * and b in cell (dx,dy), |xb-xa| ranges over [lo(dx), hi(dx)] with
    * lo(d) = 0 if d=0 else (|d|-1)*s+1 and hi(d) = (|d|+1)*s-1. */
  def classify(r: Long, s: Long): Offsets = {
    require(s >= 1 && r >= 1, s"need positive radius/side, got r=$r s=$s")
    val w = r / s + 2
    val r2 = r * r
    def lo(d: Long): Long = if (d == 0L) 0L else (math.abs(d) - 1) * s + 1
    def hi(d: Long): Long = (math.abs(d) + 1) * s - 1
    val full = Seq.newBuilder[(Long, Long)]
    val partial = Seq.newBuilder[(Long, Long)]
    for (dx <- -w to w; dy <- -w to w) {
      val mind2 = lo(dx) * lo(dx) + lo(dy) * lo(dy)
      if (mind2 <= r2) {
        val maxd2 = hi(dx) * hi(dx) + hi(dy) * hi(dy)
        if (maxd2 <= r2) full += ((dx, dy)) else partial += ((dx, dy))
      }
    }
    Offsets(full.result(), partial.result(), s)
  }

  /** Cell side from measured density: the side whose expected cell
    * occupancy is `target` points. One tiny scalar aggregate of driver
    * state (the k-means discipline). Clamped to [max(r/16, 32), r]; a
    * result of `r` means the density is too low for the ring machinery
    * to pay and callers may keep the legacy 3x3 path. `pts` needs
    * integer columns (x, y). */
  def adaptiveSide(pts: DataFrame, r: Long, target: Long = 4L): Long = {
    val row = pts.agg(count(lit(1)).as("n"),
      min(col("x")).as("x0"), max(col("x")).as("x1"),
      min(col("y")).as("y0"), max(col("y")).as("y1")).collect()(0)
    if (row.isNullAt(1) || row.getLong(0) == 0L) return r
    val s0 = math.max(r / 16L, 32L)
    // the min/max are already in hand — enforce the coordinate
    // contract here, at the smallest side any caller can get back
    requireNonneg(row.getLong(1), row.getLong(3),
      row.getLong(2), row.getLong(4), s0)
    val area = (row.getLong(2) - row.getLong(1) + 1).toDouble *
      (row.getLong(4) - row.getLong(3) + 1).toDouble
    val s = math.sqrt(target.toDouble * area / row.getLong(0)).toLong
    math.max(math.min(s, r), s0)
  }

  private def withCells(pts: DataFrame, s: Long): DataFrame = pts
    .withColumn("__cx", expr(s"x div $s"))
    .withColumn("__cy", expr(s"y div $s"))
    .withColumn("__cell", col("__cx") * M + col("__cy"))

  private def d2(xa: Column, ya: Column, xb: Column, yb: Column): Column =
    (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)

  /** Exact weighted count of points within distance `r` of each point
    * (self excluded): cnt(a) = sum of w(b) over b != a with
    * dist(a,b) <= r. Input needs (id, x, y, `wCol`) with `wCol` a LONG
    * weight, UNIQUE ids, and coordinates per the [[requireNonneg]]
    * contract (nonnegative; coord/s < 2^21). Returns (id, cnt) for
    * EVERY input point (zero-neighbor points included). */
  def withinCounts(pts: DataFrame, r: Long, s: Long, wCol: String): DataFrame =
    withinCountsAB(pts, pts, r, s, wCol, excludeSameId = true)

  /** [[withinCounts]] over two frames: per a-point, the weighted count
    * of b-points within r. With disjoint frames (the DBSCAN border
    * test probes only NON-core points against only CORE points — both
    * sides shrink exactly where density makes the generic pass
    * expensive) pass excludeSameId=false. */
  def withinCountsAB(aPts: DataFrame, bPts: DataFrame, r: Long, s: Long,
      wCol: String, excludeSameId: Boolean): DataFrame = {
    val off = classify(r, s)
    // excludeSameId means "one frame, both roles": the b-side census
    // and home reuse the a-side checkpoint, and the (0,0)-full census
    // mass needs the point's own weight subtracted back out
    val pb = withCells(bPts, s).localCheckpoint(true)
    val pa = if (excludeSameId) pb
    else withCells(aPts, s).localCheckpoint(true)
    val p = pb
    // FULL mass rides the cell census: explode each census cell to the
    // target cells it fully covers, one row per (cell, full offset) —
    // cells, not points, so density never inflates it
    val census = p.groupBy("__cell").agg(sum(col(wCol)).as("__cw"))
    val fullw = if (off.full.isEmpty) null
    else census
      .withColumn("__d", explode(
        array(off.full.map { case (dx, dy) => lit(dx * M + dy) }: _*)))
      .select((col("__cell") + col("__d")).as("__cell"), col("__cw"))
      .groupBy("__cell").agg(sum(col("__cw")).as("__fullw"))
    // PARTIAL ring: the only point-level pairs; partial-aggregated to
    // point grain before any shuffle. The home side rides a
    // shuffle-hash hint (SMJ would SORT the exploded probe side — 5x
    // slower measured at 10x density; hash build is per-partition, so
    // the hint scales where a broadcast hint would not), and probe
    // rows are prefiltered map-side by the point-to-target-cell min
    // distance, which drops the unreachable corner mass before the
    // join ever sees it.
    val home = p.select(col("id").as("__idb"), col("x").as("__xb"),
      col("y").as("__yb"), col(wCol).as("__wb"), col("__cell"))
    val idFilter = if (excludeSameId) col("__ida") =!= col("__idb")
    else lit(true)
    // per-point refinement of the global PARTIAL offsets: from THIS
    // point, a target cell is dropped (min distance > r), fully
    // covered (max distance <= r -> its census count joins in, no
    // point pairs), or boundary (the only rows that reach the
    // point-level join — a ring of one cell-diagonal width around
    // the radius circle)
    def mkProbes(offsets: Seq[(Long, Long)]): DataFrame = pa
      .withColumn("__o", explode(array(offsets.map { case (dx, dy) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")) }: _*)))
        .select(col("id").as("__ida"), col("x").as("__xa"),
          col("y").as("__ya"),
          (if (excludeSameId) col(wCol) else lit(0L)).as("__wa"),
          (col("__o.dx") === 0 && col("__o.dy") === 0).as("__self"),
          (col("__cx") + col("__o.dx")).as("__tx"),
          (col("__cy") + col("__o.dy")).as("__ty"))
        .withColumn("__dxm", greatest(lit(0L), col("__tx") * s - col("__xa"),
          col("__xa") - (col("__tx") * s + (s - 1))))
        .withColumn("__dym", greatest(lit(0L), col("__ty") * s - col("__ya"),
          col("__ya") - (col("__ty") * s + (s - 1))))
        .where(col("__dxm") * col("__dxm") + col("__dym") * col("__dym")
          <= lit(r * r))
        .withColumn("__dxM", greatest(col("__xa") - col("__tx") * s,
          col("__tx") * s + (s - 1) - col("__xa")))
        .withColumn("__dyM", greatest(col("__ya") - col("__ty") * s,
          col("__ty") * s + (s - 1) - col("__ya")))
        .withColumn("__covered",
          col("__dxM") * col("__dxM") + col("__dyM") * col("__dyM")
            <= lit(r * r))
        .select(col("__ida"), col("__xa"), col("__ya"), col("__wa"),
          col("__self"), col("__covered"),
          (col("__tx") * M + col("__ty")).as("__cell"))
    val partw = if (off.partial.isEmpty) null
    else if (excludeSameId) {
      // SAME-frame symmetric form: probe only the half-plane (plus the
      // self offset when partial), check each unordered pair ONCE, and
      // credit both endpoints — the boundary join halves. Covered
      // cells credit forward via the target census and backward via a
      // cell-grain sum of probing weights (every point in a covered
      // cell is within r of the prober by construction).
      val half = off.partial.filter { case (dx, dy) =>
        dy > 0 || (dy == 0 && dx >= 0) }
      val probes = mkProbes(half)
      // self rows NEVER take the census shortcut: two in-cell points
      // may classify differently (one covered, one boundary) and the
      // pair-once accounting below would then double- or drop-credit
      val covNS = probes.where(col("__covered") && !col("__self"))
      val fwd = covNS.join(census.hint("shuffle_hash"), "__cell")
        .select(col("__ida"), col("__cw").as("__wb"))
      val revCredit = pa.select(col("id").as("__ida"), col("__cell"))
        .join(covNS.groupBy("__cell").agg(sum(col("__wa")).as("__rw"))
          .hint("shuffle_hash"), "__cell")
        .select(col("__ida"), col("__rw").as("__wb"))
      val boundaryW = probes.where(!col("__covered") || col("__self"))
        .join(home.hint("shuffle_hash"), "__cell")
        .where((!col("__self") || col("__ida") < col("__idb")) &&
          d2(col("__xa"), col("__ya"), col("__xb"), col("__yb"))
            <= lit(r * r))
        .withColumn("__e", explode(array(
          struct(col("__ida").as("i"), col("__wb").as("w")),
          struct(col("__idb").as("i"), col("__wa").as("w")))))
        .select(col("__e.i").as("__ida"), col("__e.w").as("__wb"))
      fwd.unionAll(revCredit).unionAll(boundaryW)
        .groupBy(col("__ida")).agg(sum(col("__wb")).as("__pw"))
    } else {
      val probes = mkProbes(off.partial)
      val coveredW = probes.where(col("__covered"))
        .join(census.hint("shuffle_hash"), "__cell")
        .select(col("__ida"),
          (col("__cw") - when(col("__self"), col("__wa")).otherwise(0L))
            .as("__wb"))
      val boundaryW = probes.where(!col("__covered"))
        .join(home.hint("shuffle_hash"), "__cell")
        .where(idFilter &&
          d2(col("__xa"), col("__ya"), col("__xb"), col("__yb"))
            <= lit(r * r))
        .select(col("__ida"), col("__wb"))
      coveredW.unionAll(boundaryW)
        .groupBy(col("__ida")).agg(sum(col("__wb")).as("__pw"))
    }
    val base = pa.select(col("id"), col("__cell"),
      (if (excludeSameId) col(wCol) else lit(0L)).as("__w"))
    val withFull = if (fullw == null) base.withColumn("__fullw", lit(0L))
    else base.join(fullw, Seq("__cell"), "left")
    val withPart = if (partw == null) withFull.withColumn("__pw", lit(0L))
    else withFull.join(partw, col("id") === col("__ida"), "left")
    // the (0,0)-full census mass counted the point itself: subtract
    // its own weight back out
    val self = if (off.selfFull) col("__w") else lit(0L)
    withPart.select(col("id"),
      (coalesce(col("__fullw"), lit(0L)) + coalesce(col("__pw"), lit(0L)) -
        self).as("cnt"))
  }

  /** Exact top-`k` nearest neighbors within radius `r` per point,
    * ordered by (d2, id), resolved in two tiers:
    *
    *  1. a 3x3 probe at the FINE side `s` finalizes every point whose
    *     k-th candidate sits at d2 <= s^2 — the block bound puts any
    *     unseen point at distance >= s+1, strictly farther;
    *  2. the remainder (rare exactly where the fine tier pays — dense
    *     data) re-probes with the legacy 3x3-at-R window.
    *
    * Returns (id, topk) with topk a (d2, idb)-sorted struct array of
    * size <= k; points with no neighbor within r emit no row.
    * Coordinates per the [[requireNonneg]] contract. The
    * per-point candidate fold is ONE map-side-combinable aggregation
    * (sorted-array slice), never a whole-partition window sort. */
  def topKWithin(pts: DataFrame, r: Long, s: Long, k: Int): DataFrame = {
    def probe(a: DataFrame, side: Long): DataFrame = {
      val deltas = for (dx <- -1L to 1L; dy <- -1L to 1L) yield dx * M + dy
      val home = withCells(pts, side).select(col("id").as("idb"),
        col("x").as("__xb"), col("y").as("__yb"), col("__cell"))
      withCells(a, side)
        .withColumn("__d", explode(array(deltas.map(lit): _*)))
        .select(col("id"), col("x").as("__xa"), col("y").as("__ya"),
          (col("__cell") + col("__d")).as("__cell"))
        .join(home.hint("shuffle_hash"), "__cell")
        .where(col("id") =!= col("idb"))
        .select(col("id"),
          struct(d2(col("__xa"), col("__ya"), col("__xb"), col("__yb"))
            .as("d2"), col("idb")).as("c"))
        .where(col("c.d2") <= lit(r * r))
    }
    def fold(cand: DataFrame, extra: Seq[Column] = Nil): DataFrame =
      cand.groupBy("id").agg(
        slice(sort_array(collect_list(col("c"))), 1, k).as("topk"),
        extra: _*)
    if (s >= r) {
      // side >= r: the 3x3 block already covers the whole disk
      fold(probe(pts, s))
    } else {
      val fine = fold(probe(pts, s),
        Seq(sum(when(col("c.d2") <= lit(s * s), 1L).otherwise(0L))
          .as("__nclose")))
        .localCheckpoint(true) // resolved rows AND the fallback id set
      // the k-th candidate within distance s is FINAL: the 3x3 block
      // bound puts any unseen point at distance >= s+1
      val resolved = fine.where(col("__nclose") >= k)
        .select(col("id"), col("topk"))
      val pending = pts.join(resolved.select(col("id")), Seq("id"),
        "left_anti")
      resolved.unionAll(fold(probe(pending, r)))
    }
  }

  /** DBSCAN core/border/noise census on the adaptive grid — exact
    * q347 semantics (core: >= minPts neighbors within r; border:
    * non-core with a core neighbor within r; noise: the rest), with
    * both passes riding [[withinCounts]] so the full-disk neighbor
    * mass is never enumerated. `pts` needs (id, x, y). */
  def dbscanCensus(pts: DataFrame, r: Long, minPts: Long, s: Long): DataFrame = {
    val one = pts.withColumn("__one", lit(1L))
    val flags = one.join(
      withinCounts(one, r, s, "__one").withColumnRenamed("cnt", "nbrs"),
      "id")
      .withColumn("__core", (col("nbrs") >= minPts).cast("long"))
      .localCheckpoint(true) // feeds the core-adjacency pass AND the census
    // border test = "any CORE point within r of a NON-core point":
    // both probe sides shrink exactly where density would make a
    // second generic pass expensive (dense data -> almost no non-core
    // points; sparse data -> the pass is cheap anyway)
    val coreCnt = withinCountsAB(
      flags.where(col("__core") === 0L).select("id", "x", "y"),
      flags.where(col("__core") === 1L).select("id", "x", "y")
        .withColumn("__w", lit(1L)),
      r, s, "__w", excludeSameId = false)
      .withColumnRenamed("cnt", "core_nbrs")
    flags.join(coreCnt, Seq("id"), "left")
      .withColumn("cls", when(col("__core") === 1L, "core")
        .when(coalesce(col("core_nbrs"), lit(0L)) >= 1L, "border")
        .otherwise("noise"))
      .groupBy("cls").agg(count(lit(1)).as("n_points"),
        expr("sum(nbrs) * 1000 div count(*)").as("avg_nbrs_milli"))
      .orderBy("cls")
  }

  /** Grid-bounded kNN on the adaptive grid — exact q357 semantics
    * (n_within = neighbor count within r; nn1 + top-3 average over the
    * (d2, id) order), counts via [[withinCounts]], ranks via
    * [[topKWithin]]. `pts` needs (id, x, y). */
  def spatialKnn(pts: DataFrame, r: Long, s: Long, k: Int): DataFrame = {
    val one = pts.withColumn("__one", lit(1L))
    val counts = withinCounts(one, r, s, "__one")
      .withColumnRenamed("cnt", "n_within")
    val agg = topKWithin(pts, r, s, k)
      .select(col("id").as("__ida"),
        col("topk")(0).getField("idb").as("nn1_id"),
        col("topk")(0).getField("d2").as("nn1_d2"),
        expr("aggregate(topk, 0L, (a, x) -> a + x.d2) * 1000" +
          " div size(topk)").as("knn3_avg_d2_milli"))
    pts.select(col("id")).join(counts, Seq("id"), "left")
      .join(agg, col("id") === col("__ida"), "left")
      .select(col("id"), coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("nn1_id"), col("nn1_d2"), col("knn3_avg_d2_milli"))
      .orderBy("id")
  }
}

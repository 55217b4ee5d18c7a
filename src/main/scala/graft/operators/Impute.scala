package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Imputation operators (SURVEY.md §2.3 J1/J4/J5, §2.4 A7/A9/A10).
  *
  * The reference imputes missing values three ways: first-non-null within a
  * group (`R_groupe4.R:181-190`), per-group mode via a join
  * (`R_groupe4.R:194-205`), and 1-nearest-neighbor over (X,Y) coordinates
  * via an O(missing × known) interpreted loop (`R_groupe4.R:113-142`).
  * Here each is a distributed operator with an explicit scale path.
  */
object Impute {

  /** First-row aggregate for the fill operators: payload of the row
    * minimizing `ord` (nulls in `ord` ignored — the masking trick the
    * inclNull variants rely on).
    *
    * When the order column is a primitive numeric this is the typed
    * [[graft.functions.ArgMinBy]] (hash-aggregable for ANY payload type —
    * the fills carry STRING payloads, whose immutable min_by buffer would
    * otherwise sink the whole corpus aggregation into SortAggregate;
    * PLAN_AUDIT.md caught q66 doing exactly that). ArgMinBy's tiebreak
    * reuses the order value: ties beyond it are unspecified for builtin
    * min_by too, and every caller orders by a unique id. Non-numeric order
    * columns keep the builtin (correct, sort-based) path.
    */
  private def firstBy(df: DataFrame, valueCol: String, ord: Column,
                      orderCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(orderCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
        graft.functions.ArgMinBy(col(valueCol), ord.cast("double"), ord.cast("long"))
      case _ => min_by(col(valueCol), ord)
    }
  }

  /** A9 — fill nulls in `valueCol` with the value of the group's first
    * non-null row, "first" defined over `orderCol` (ref `R_groupe4.R:181-184`
    * — R uses physical row order; we use an explicit total order, SURVEY.md
    * §7-1). Implemented as a pre-aggregated fill table + equi-join rather
    * than a window so the fill side can be broadcast when small; at scale
    * both sides hash-partition on the group key (one shuffle each).
    */
  def firstNonNullFill(df: DataFrame, groupKeys: Seq[String], valueCol: String,
                       orderCol: String): DataFrame = {
    val src = df.filter(col(valueCol).isNotNull)
    val fills = src
      .groupBy(groupKeys.map(col): _*)
      .agg(firstBy(src, valueCol, col(orderCol), orderCol).as("__graft_fill"))
    df.join(fills, groupKeys, "left")
      .withColumn(valueCol, coalesce(col(valueCol), col("__graft_fill")))
      .drop("__graft_fill")
  }

  /** A10 — same, but "first including null" (ref `R_groupe4.R:187-190`:
    * `first(fk_situation)` without `na.omit` — if the group's first row is
    * null the fill is null; quirk preserved behind this variant). */
  def firstInclNullFill(df: DataFrame, groupKeys: Seq[String], valueCol: String,
                        orderCol: String): DataFrame = {
    val fills = df.groupBy(groupKeys.map(col): _*)
      .agg(firstBy(df, valueCol, col(orderCol), orderCol).as("__graft_fill"))
    df.join(fills, groupKeys, "left")
      .withColumn(valueCol, coalesce(col(valueCol), col("__graft_fill")))
      .drop("__graft_fill")
  }

  /** A9+A10 fused — several first-row fills sharing ONE group key computed
    * in a single aggregation pass + a single join, instead of one
    * agg+join per column. `specs` is (valueCol, inclNull): inclNull=false
    * reproduces [[firstNonNullFill]] (a null value cannot be chosen — its
    * order key is masked to null, which min_by ignores), true reproduces
    * [[firstInclNullFill]]. Same results as chaining the single-column
    * operators (ImputeSpec proves it); at scale this halves the shuffles
    * of a multi-fill pipeline stage (the reference's part-1 chain fills
    * fk_pied and fk_situation over the same secteur key back-to-back). */
  def firstFills(df: DataFrame, groupKeys: Seq[String],
                 specs: Seq[(String, Boolean)], orderCol: String): DataFrame = {
    require(specs.nonEmpty, "firstFills needs at least one (valueCol, inclNull) spec")
    val aggs = specs.map { case (v, inclNull) =>
      val ord = if (inclNull) col(orderCol) else when(col(v).isNotNull, col(orderCol))
      firstBy(df, v, ord, orderCol).as(s"__graft_fill_$v")
    }
    val fills = df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val joined = df.join(fills, groupKeys, "left")
    val filled = specs.foldLeft(joined) { case (d, (v, _)) =>
      d.withColumn(v, coalesce(col(v), col(s"__graft_fill_$v")))
    }
    filled.drop(specs.map(s => s"__graft_fill_${s._1}"): _*)
  }

  /** A7+J1 — fill nulls with the group's most frequent value (ref
    * `R_groupe4.R:194-205`: mode table + left join + coalesce). The mode
    * table is |groups| rows → broadcast to make the join shuffle-free on
    * the fact side. */
  def modeFill(df: DataFrame, groupKeys: Seq[String], valueCol: String): DataFrame = {
    val modes = Rankings.modePerGroup(df.filter(col(valueCol).isNotNull), groupKeys, valueCol)
      .select((groupKeys.map(col) :+ col(s"${valueCol}_mode")): _*)
    df.join(broadcast(modes), groupKeys, "left")
      .withColumn(valueCol, coalesce(col(valueCol), col(s"${valueCol}_mode")))
      .drop(s"${valueCol}_mode")
  }

  /** J4/J5 — exact 1-nearest-neighbor imputation (ref `R_groupe4.R:113-142`:
    * per missing row, argmin Euclidean distance over all known rows).
    *
    * v1 exact form: crossJoin(missing × known) + rank. Correct at any
    * |missing| but O(|missing|·|known|) — intended for the reference's
    * regime where the missing side is small (broadcast it). Ties broken by
    * (distance, tieBreak) total order — R's loop tie-breaks by lowest row
    * index (`which.min`), mirrored by passing the ingest id as `tieBreak`.
    *
    * For the 100 TB regime use [[knnImputeGrid]].
    *
    * @param missing  rows needing a value; must carry `idCol` (unique)
    * @param known    rows providing values; must carry `payloadCols`
    */
  def knnImputeExact(missing: DataFrame, known: DataFrame,
                     xCol: String, yCol: String, idCol: String,
                     knownTieBreak: String, payloadCols: Seq[String]): DataFrame = {
    val m = missing.select(col(idCol), col(xCol).as("__mx"), col(yCol).as("__my"))
    val k = known.select(
      (Seq(col(xCol).as("__kx"), col(yCol).as("__ky"), col(knownTieBreak).as("__ktb"))
        ++ payloadCols.map(col)): _*)
    // Squared distance: same argmin as Euclidean, but only *, +, - (exact
    // IEEE ops) — deterministic and bit-identical across engines, unlike
    // libm sqrt/pow (matters for oracle parity of the tie ordering).
    val dx = col("__mx") - col("__kx")
    val dy = col("__my") - col("__ky")
    val dist2 = dx * dx + dy * dy
    // argmin as an aggregation, NOT a window: the custom arg_min_by
    // TypedImperativeAggregate (see its scaladoc — builtin min_by over a
    // struct key degrades to SortAggregate) gets map-side partial
    // aggregation in ObjectHashAggregate, so the |missing|×|known| pair
    // stream collapses per partition and only |missing| groups shuffle.
    // The known side is repartitioned so the nested-loop probe parallelizes
    // even when the source collapses to a single input split (a small
    // parquet file); at real scale the input is already many splits and
    // this shuffle is cheap relative to the pair scan it parallelizes.
    broadcast(m).crossJoin(k.repartition(k.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt))
      .groupBy(col(idCol))
      .agg(graft.functions.ArgMinBy(
        struct(payloadCols.map(col): _*), dist2, col("__ktb")).as("__nn"))
      .select((col(idCol) +: payloadCols.map(c => col(s"__nn.$c").as(s"${c}_nn"))): _*)
  }

  /** J4/J5, size-aware — dispatches to [[knnImputeExact]] while the
    * missing side's plan-estimated size fits the session's broadcast
    * threshold, and to [[knnImputeGrid]] (the 100 TB path) beyond it.
    * The switch reads `optimizedPlan.stats.sizeInBytes` against
    * `spark.sql.autoBroadcastJoinThreshold` — the same signal Spark's own
    * broadcast planning uses, so no extra count job; a disabled threshold
    * (-1) always routes to the grid. The grid's cell size defaults to
    * sqrt(extent area / |known|) — one expected known point per cell, so
    * ring 1 probes ~9 candidates — computed from one min/max/count agg
    * over the known side (only when the grid path is taken). Both paths
    * are value-identical (ImputeSpec equivalence tests). */
  def knnImpute(missing: DataFrame, known: DataFrame,
                xCol: String, yCol: String, idCol: String,
                knownTieBreak: String, payloadCols: Seq[String],
                cellSize: Option[Double] = None, maxRounds: Int = 8): DataFrame =
    if (fitsBroadcast(missing))
      knnImputeExact(missing, known, xCol, yCol, idCol, knownTieBreak, payloadCols)
    else
      knnImputeGrid(missing, known, xCol, yCol, idCol, knownTieBreak, payloadCols,
        cellSize.getOrElse(autoCellSize(known, xCol, yCol)), maxRounds)

  private[graft] def fitsBroadcast(df: DataFrame): Boolean = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    threshold > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
  }

  /** ~1 known point per cell in expectation. Degenerate extents (empty or
    * single-point known side) get a unit cell — any positive cell size is
    * correct, the ring escalation/fallback handles sparseness. */
  private[graft] def autoCellSize(known: DataFrame, xCol: String, yCol: String): Double = {
    val r = known.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double"),
      count(lit(1))).head()
    if (r.isNullAt(0) || r.getLong(4) == 0L) return 1.0
    val area = (r.getDouble(1) - r.getDouble(0)) * (r.getDouble(3) - r.getDouble(2))
    if (area <= 0.0) 1.0 else math.sqrt(area / r.getLong(4))
  }

  /** J4/J5 at scale — grid-bucketed exact 1-NN (SURVEY.md §4 "1-NN spatial
    * join optimization", v2 design).
    *
    * Both sides get a cell key `(floor(x/cell), floor(y/cell))`; ring r
    * candidates are the known points in the (2r+1)² cell neighborhood of
    * the missing point. A ring-r nearest candidate at distance d is the true
    * global nearest iff d <= r*cell (any point outside the ring is at least
    * r*cell away). Unresolved rows escalate to ring 2r, doubling until
    * resolved; each round is an equi-join on cell keys (shuffle on cell id,
    * no cross join). With a cell sized to the median NN distance the
    * expected candidate count per row is O(1), so total work is
    * O(|missing| + |known|) per round and the round count is logarithmic.
    *
    * Ties broken identically to [[knnImputeExact]] (distance, tieBreak).
    */
  def knnImputeGrid(missing: DataFrame, known: DataFrame,
                    xCol: String, yCol: String, idCol: String,
                    knownTieBreak: String, payloadCols: Seq[String],
                    cellSize: Double, maxRounds: Int = 8): DataFrame = {
    // Lineage truncation (same rationale as Dedup.canonicalize): the known
    // side is probed every round and both loop variables otherwise chain
    // unionByName/left_anti plans round over round, re-executing the whole
    // upstream clean chain up to maxRounds times and doubling the plan.
    // Checkpoint each once per round so every upstream stage runs exactly
    // once — through the graft.io.Checkpoints seam (executor-local by
    // default; reliable when spark.graft.checkpointDir is set). The
    // emptiness check is a counter over already-materialized checkpoints,
    // not a job re-deriving the chain.
    val k0 = graft.io.Checkpoints.truncate(
      known.select(
        (Seq(col(xCol).as("__kx"), col(yCol).as("__ky"), col(knownTieBreak).as("__ktb"))
          ++ payloadCols.map(col)): _*)
        .withColumn("__kcx", floor(col("__kx") / cellSize))
        .withColumn("__kcy", floor(col("__ky") / cellSize)),
      eager = true)
    var unresolved = graft.io.Checkpoints.truncate(
      missing.select(col(idCol), col(xCol).as("__mx"), col(yCol).as("__my")),
      eager = true)
    var unresolvedCount = unresolved.count()
    var resolved: DataFrame = null
    var ring = 1
    var round = 0
    while (round < maxRounds && unresolvedCount > 0) {
      val r = ring
      // Explode each missing row to its (2r+1)^2 neighbor cells, equi-join on cell.
      val offsets = (-r to r).flatMap(dx => (-r to r).map(dy => (dx, dy)))
      val offsetDf = offsets.map { case (dx, dy) => s"struct(${dx}L as dx, ${dy}L as dy)" }
        .mkString("array(", ",", ")")
      val mCells = unresolved
        .withColumn("__off", explode(expr(offsetDf)))
        .withColumn("__kcx", floor(col("__mx") / cellSize) + col("__off.dx"))
        .withColumn("__kcy", floor(col("__my") / cellSize) + col("__off.dy"))
        .drop("__off")
      val dx = col("__mx") - col("__kx")
      val dy = col("__my") - col("__ky")
      val dist2 = dx * dx + dy * dy
      // same map-side-combinable argmin as knnImputeExact
      val best = mCells.join(k0, Seq("__kcx", "__kcy"))
        .withColumn("__dist2", dist2)
        .groupBy(col(idCol))
        .agg(graft.functions.ArgMinBy(
          struct((col("__dist2") +: payloadCols.map(col)): _*),
          col("__dist2"), col("__ktb")).as("__nn"))
      // Exactness guard: accept only if the best candidate is provably
      // global-nearest (anything outside ring r is at least r*cell away).
      val accepted = graft.io.Checkpoints.truncate(
        best.filter(col("__nn.__dist2") <= lit(r * cellSize * r * cellSize))
          .select((col(idCol) +: payloadCols.map(c => col(s"__nn.$c").as(s"${c}_nn"))): _*),
        eager = true)
      val acceptedCount = accepted.count()
      resolved = if (resolved == null) accepted else resolved.unionByName(accepted)
      if (acceptedCount > 0 && acceptedCount < unresolvedCount) {
        unresolved = graft.io.Checkpoints.truncate(
          unresolved.join(accepted.select(idCol), Seq(idCol), "left_anti"),
          eager = true)
      }
      unresolvedCount -= acceptedCount
      ring *= 2
      round += 1
    }
    if (unresolvedCount == 0 && resolved != null) return resolved
    // Anything still unresolved (pathologically sparse neighborhoods) falls
    // back to the exact cross-join on the (by now tiny) remainder.
    val fallback = Impute.knnImputeExact(
      unresolved.withColumnRenamed("__mx", xCol).withColumnRenamed("__my", yCol),
      k0.withColumnRenamed("__kx", xCol).withColumnRenamed("__ky", yCol)
        .withColumnRenamed("__ktb", knownTieBreak),
      xCol, yCol, idCol, knownTieBreak, payloadCols)
    if (resolved == null) fallback else resolved.unionByName(fallback)
  }
}

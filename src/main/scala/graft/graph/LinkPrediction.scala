package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Common-neighbor link prediction: for every non-adjacent-or-adjacent
  * node pair sharing ≥ `minCommon` neighbors, the neighborhood Jaccard
  * |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| — the classic "who should be connected
  * next" score (Liben-Nowell & Kleinberg 2003).
  *
  * Unlike triangle counting, EVERY wedge (n; u, v) must be enumerated —
  * the apex-orientation trick of [[Triangles]] (count each wedge only
  * from its ≺-smallest corner) would undercount common neighbors — so
  * the self-join cost is inherently Σ deg(n)². The standard mitigation
  * at scale is the `maxDegree` apex cap: a super-hub shared by everyone
  * carries ~zero link-prediction signal (its wedge set is dense noise)
  * and is exactly the node that makes Σ deg² explode; dropping apexes
  * above the cap bounds the join at |nodes|·maxDegree² while leaving
  * informative mid-degree neighborhoods intact (the same df-cap device
  * as Winnowing's `maxDocFreq` boilerplate guard). Union sizes in the
  * denominator use FULL degrees — only apex enumeration is capped, and
  * with the default cap ≫ max degree on the purchase graph the cap is a
  * no-op replayed identically by the oracle.
  *
  * All counts are exact integers; the single float op is the final
  * mirrored division.
  */
object LinkPrediction {

  /** `edges`: undirected simple edges (u, v), u < v, one row per edge.
    * Returns (u, v, common, jaccard) for pairs with common ≥ minCommon. */
  def jaccardPairs(edges: DataFrame, minCommon: Int = 2,
                   maxDegree: Int = 1000): DataFrame = {
    val e = graft.io.Checkpoints.truncate(
      edges.select(col("u"), col("v")), eager = true)
    // both endpoints in one explode pass (the EdgeLayout symmetrize
    // device); deg feeds the cap filter AND both closing degree joins,
    // adjK both sides of the wedge self-join — truncate each so the
    // adjacency build runs once, not 4-5× (the r17 fan-out seam)
    val adj = e.select(explode(array(
        struct(col("u").as("n"), col("v").as("x")),
        struct(col("v").as("n"), col("u").as("x")))).as("__e"))
      .select(col("__e.n").as("n"), col("__e.x").as("x"))
    val deg = graft.io.Checkpoints.truncate(
      adj.groupBy("n").agg(F.count(lit(1)).as("deg")), eager = false)
    val keep = deg.filter(col("deg") <= maxDegree).select("n")
    val adjK = graft.io.Checkpoints.truncate(
      adj.join(keep, Seq("n"), "left_semi"), eager = false)
    val a = adjK.select(col("n"), col("x").as("u"))
    val b = adjK.select(col("n"), col("x").as("v"))
    val pairs = a.join(b, Seq("n")).filter(col("u") < col("v"))
      .groupBy("u", "v").agg(F.count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    pairs
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("common"),
        round(col("common").cast("double") /
          (col("du") + col("dv") - col("common")), 6).as("jaccard"))
  }

  /** Adamic-Adar score: Σ_{n ∈ Γ(u)∩Γ(v)} 1/ln(deg(n)) — common
    * neighbors weighted by informativeness (a shared niche neighbor
    * carries more signal than a shared hub). Same capped wedge join as
    * [[jaccardPairs]]; every apex in a wedge has deg ≥ 2, so ln(deg) > 0
    * always. The AA sum is the one order-dependent float aggregate —
    * rounded 4 dp for cross-engine parity. */
  def adamicAdar(edges: DataFrame, minCommon: Int = 2,
                 maxDegree: Int = 1000): DataFrame = {
    val e = graft.io.Checkpoints.truncate(
      edges.select(col("u"), col("v")), eager = true)
    // same one-pass adjacency + lineage cuts as jaccardPairs above
    val adj = e.select(explode(array(
        struct(col("u").as("n"), col("v").as("x")),
        struct(col("v").as("n"), col("u").as("x")))).as("__e"))
      .select(col("__e.n").as("n"), col("__e.x").as("x"))
    val deg = graft.io.Checkpoints.truncate(
      adj.groupBy("n").agg(F.count(lit(1)).as("deg")), eager = false)
    val adjK = graft.io.Checkpoints.truncate(
      adj.join(deg.filter(col("deg") <= maxDegree), Seq("n")), eager = false)
    val a = adjK.select(col("n"), col("deg"), col("x").as("u"))
    val b = adjK.select(col("n"), col("x").as("v"))
    a.join(b, Seq("n")).filter(col("u") < col("v"))
      .groupBy("u", "v").agg(
        F.count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("deg").cast("double"))), 4).as("aa"))
      .filter(col("common") >= minCommon)
  }
}

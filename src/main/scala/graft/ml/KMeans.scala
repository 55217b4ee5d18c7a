package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the canonical
  * iterative algorithm on Spark, built so every step is ENGINE-REPLAYABLE
  * (the q105 oracle recomputes the whole thing in SQL):
  *
  *   - deterministic init: the k lowest-id corpus vectors (q73's rule);
  *   - assignment: min (squared-L2, centroid-id) per row, evaluated as a
  *     pure column expression — a `least` over k literal structs whose
  *     distance folds are sequential (`zip_with` + `aggregate` == DuckDB
  *     `list_transform` + `list_reduce`, since 0+x == x), so comparisons
  *     are bit-identical;
  *   - update: per-dimension means ROUNDED to 6 dp — the parity seam:
  *     engine summation order differs ~1e-15 and the round collapses it
  *     (the q53 precedent), so the next iteration's literals match the
  *     oracle's CTE exactly.
  *
  * Each iteration is one |k·dims| driver collect (tiny, like the IVF
  * centroid table) plus one map-side-combinable per-dim aggregation; the
  * corpus is never collected and assignment never shuffles. Clusters
  * that empty out simply drop from the centroid list (both engines see
  * the same aggregation, so they drop consistently).
  */
object KMeans {

  /** Nearest-centroid assignment as a pure expression: adds `cluster`. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[(Long, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "kmeans: no centroids")
    val v = col(vecCol)
    def dist2(c: Array[Double]): Column =
      aggregate(
        zip_with(v, array(c.map(lit).toIndexedSeq: _*), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, b) => a + b)
    val terms = centroids.toIndexedSeq.map { case (cid, cv) =>
      struct(dist2(cv).as("d"), lit(cid).as("cid"))
    }
    val nearest =
      if (terms.size == 1) terms.head.getField("cid")
      else least(terms: _*).getField("cid")
    vecs.withColumn("cluster", nearest)
  }

  /** Per-cluster, per-dimension means rounded to 6 dp, collected (k·dims
    * values — the driver-side footprint is the centroid table, never the
    * corpus). */
  def roundedMeans(assigned: DataFrame, vecCol: String,
                   dims: Int): Seq[(Long, Array[Double])] =
    assigned.select(col("cluster"), posexplode(col(vecCol)))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("col")), 6).as("m"))
      .groupBy(col("cluster"))
      .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("m"))).as("byPos"))
      .collect()
      .map { r =>
        val cid = r.get(0) match { case l: Long => l; case i: Int => i.toLong }
        val byPos = r.getMap[Int, Double](1)
        cid -> Array.tabulate(dims)(i => byPos(i))
      }
      .sortBy(_._1).toSeq

  /** Fixed-iteration Lloyd's: init from the k lowest-id vectors, then
    * `iters` rounds of assign → rounded-mean update, returning the final
    * assignment (idCol, cluster). */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): DataFrame = {
    val (centroids, v) = lloydCentroids(vecs, idCol, vecCol, k, iters)
    assign(v, idCol, "__v", centroids).select(col(idCol), col("cluster"))
  }

  /** The trained centroid table (and the double-cast vectors it was
    * trained on): `iters` rounds of assign → rounded-mean update starting
    * from the k lowest-id vectors. `iters = 2` means one update — the
    * centroids q105's second assignment uses. */
  def lloydCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): (Seq[(Long, Array[Double])], DataFrame) = {
    val v = vecs.select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
    val dims = v.select(size(col("__v"))).first().getInt(0)
    var centroids: Seq[(Long, Array[Double])] = v.orderBy(idCol).limit(k).collect()
      .map { r =>
        val id = r.get(0) match { case l: Long => l; case i: Int => i.toLong }
        id -> r.getSeq[Double](1).toArray
      }.sortBy(_._1).toSeq
    var i = 1
    while (i < iters) {
      centroids = roundedMeans(assign(v, idCol, "__v", centroids), "__v", dims)
      i += 1
    }
    (centroids, v)
  }
}

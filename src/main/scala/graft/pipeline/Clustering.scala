package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed document/embedding clustering: Lloyd's k-means over an
  * embedding column, expressed so every step is EXACT integer arithmetic
  * and therefore bit-reproducible on any engine at any parallelism — the
  * property float k-means cannot give (summation order changes the
  * centroids, so two runs of the same pipeline label rows differently).
  *
  * Scheme: vectors are quantized to longs (`floor(x·10⁴+0.5)`); dot
  * products and per-cluster component sums are integer; the centroid
  * update divides component sums by the cluster size with an explicit
  * double `floor` (both operands ≪ 2⁵³, so the division is exact IEEE
  * and floors identically everywhere). Assignment is argmax of integer
  * dots with a lowest-cluster-id tie-break — a total order, no ulp
  * sensitivity anywhere. Cluster ids are stable across rounds (an id
  * whose cluster empties out simply stops existing — no renumbering).
  *
  * Scale shape: assignment is a narrow map against BROADCAST literal
  * centroids (no join, no shuffle); the update is one hash shuffle of
  * (cluster, dim, long) triples — partial-aggregated map-side, payload
  * independent of document size; the centroid table itself (nlist·dim
  * longs) is the only driver-resident state, exactly like the IVF
  * coarse quantizer in [[Similarity]].
  */
object Clustering {

  /** Quantize a float/double vector column to longs at 4 decimal places. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 10000d + 0.5).cast("long"))

  /** Integer dot of a quantized vector column against literal longs.
    * Runs through the codegen [[graft.functions.VectorFunctions.vec_dot]]
    * (fused primitive loop, no interpreted lambda): every term is an
    * exact integer ≪ 2⁵³, so the double accumulation is EXACT regardless
    * of summation order and the final cast loses nothing. */
  private def qdot(qv: Column, cent: Array[Long]): Column =
    graft.functions.VectorFunctions
      .vec_dot(qv, array(cent.map(lit): _*)).cast("long")

  /** argmax over literal (cid, centroid) pairs: max dot, lowest cid on
    * ties (struct max over (dot, -cid) — a total order). Returns
    * struct(cid, dot). */
  private def assign(qv: Column, cents: Seq[(Int, Array[Long])]): Column = {
    val best = array_max(array(cents.map { case (cid, c) =>
      struct(qdot(qv, c).as("d"), lit(-cid).as("ncid"))
    }: _*))
    struct((-best.getField("ncid")).as("cid"), best.getField("d").as("dot"))
  }

  /** One exact Lloyd update: integer component sums per (cluster, dim),
    * centroid component = floor(sum / size). Clusters that captured no
    * rows disappear (both engines drop them identically; surviving ids
    * keep their numbers). */
  private def updateCentroids(asg: DataFrame): Seq[(Int, Array[Long])] = {
    val rows = asg
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"),
        floor(col("s").cast("double") / col("n")).cast("long").as("c"))
      .collect() // nlist·dim rows — the broadcast-scale centroid table
    rows.groupBy(_.getAs[Int]("cid")).toSeq.sortBy(_._1).map { case (cid, rs) =>
      cid -> rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("c")).toArray
    }
  }

  /** K-means cluster assignment: first-`nlist` vectors (by id) seed the
    * centroids, `iters` exact Lloyd rounds refine them, and every vector
    * is labeled with its final cluster and integer affinity. Returns
    * (id, cluster, dot). */
  def kmeansAssign(spark: SparkSession, vecs: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 1): DataFrame = {
    // cached across the seed collect + every Lloyd round: without this,
    // each round's updateCentroids action re-runs the upstream scan +
    // quantize lineage (the same per-round-recompute hazard the
    // connected-components edge cache closes)
    val qvecs = vecs
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .cache()
    try {
      var cents: Seq[(Int, Array[Long])] = qvecs.orderBy("id").limit(nlist)
        .select("qv").collect().zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Long](0).toArray }.toSeq
      require(cents.nonEmpty,
        s"kmeansAssign: input has no vectors to seed $nlist centroids")
      for (_ <- 0 until iters) {
        val asg = qvecs.withColumn("cid", assign(col("qv"), cents).getField("cid"))
        cents = updateCentroids(asg)
      }
      val fin = assign(col("qv"), cents)
      // the returned frame re-derives the narrow scan+quantize once when
      // materialized after the unpersist — centroids (the expensive,
      // action-per-round part) are already folded in as literals
      qvecs.select(col("id"), fin.getField("cid").as("cluster"),
        fin.getField("dot").as("dot"))
    } finally { qvecs.unpersist(blocking = false); () }
  }
}

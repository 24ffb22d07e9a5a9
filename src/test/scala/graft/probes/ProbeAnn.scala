package graft

import org.apache.spark.sql.SparkSession

/** Round-15 probe (VERDICT r14 #2): the ANN/as-of family's r14 bench
  * MEDIANS came in 2.2–3.0× the r12 values on an r12-class host while
  * every pass MINIMUM sat at or below r12's medians — the committed
  * pass arrays point at host noise, but SCALE.md's own rule says a
  * coherent family outside the noise band gets a same-session pinning
  * probe. This runs the six shapes under the exact bench protocol
  * (noop-materialization, GraftExtensions session, warmup pass
  * excluded) for ≥5 interleaved passes and reports min/median/max per
  * query plus the ratio of THIS session's min and median to the r12
  * medians (58e51b9: ivf 0.754, lsh 0.531, pq_refine 1.032, pq 0.740,
  * pq_indexed 2.644, asof 0.509).
  *
  * Reading: min ≈ r12 median with a wide min→max spread = host/JVM
  * noise (commit the adjudication); median ≥2× with a TIGHT spread =
  * a real plan/code regression (per-stage decompose next). */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r12 = Map(
      "ann_ivf_topk" -> 0.754, "ann_lsh_topk" -> 0.531,
      "ann_pq_refine" -> 1.032, "ann_pq_topk" -> 0.740,
      "ann_pq_topk_indexed" -> 2.644, "asof_click_before_purchase" -> 0.509)
    val names = r12.keys.toSeq.sorted
    val qs = names.map(n => n -> SparkEntry.queries(n))
    def mat(n: String): Double = {
      val t0 = System.nanoTime()
      qs.find(_._1 == n).get._2(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(mat) // warmup pass, excluded (codegen + page cache)
    val samples: Map[String, Seq[Double]] = {
      val acc = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      (0 until passes).foreach { _ =>
        names.foreach(n => acc(n) = acc(n) :+ mat(n))
      }
      acc.toMap
    }
    println(f"[probe] ${"query"}%-28s ${"min"}%7s ${"med"}%7s ${"max"}%7s " +
      f"${"min/r12"}%8s ${"med/r12"}%8s")
    names.foreach { n =>
      val ts = samples(n).sorted
      val (mn, md, mx) = (ts.head, ts(ts.size / 2), ts.last)
      println(f"[probe] $n%-28s $mn%7.3f $md%7.3f $mx%7.3f " +
        f"${mn / r12(n)}%8.2f ${md / r12(n)}%8.2f")
      println(s"[probe]   passes: " +
        samples(n).map(t => f"$t%.3f").mkString(", "))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Throwaway scale probe for SCALE.md: the auto-nlist IVF paths at
  * sf0.1 vs a local 10× replica (gen_sf.py), with NO manual nlist —
  * the contract is that leaving nlist unset stays near-linear. */
object ProbeAutoNlist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vecsOf(dir: String): DataFrame =
      graft.tsdb.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val vecs = vecsOf(dir)
      val n = vecs.count()
      println(s"== $dir n=$n autoNlist=${Similarity.autoNlist(n)}")
      def t(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
      t("cosinePairsIvf auto")(Similarity.cosinePairsIvf(vecs, 0.45))
      t("semanticDedup auto")(Similarity.semanticDedup(vecs, 0.45))
      t("ivfTopK auto nprobe=6")(
        Similarity.ivfTopK(vecs.filter(col("id") < 100), vecs, 10, nlist = 0, nprobe = 6))
      vecs.unpersist()
    }
    spark.stop()
  }
}

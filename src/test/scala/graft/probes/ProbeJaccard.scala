package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 probe (VERDICT r14 #4): `dedup_jaccard_pairs` is 141 s at
  * sf1 (31× for 10× data — pair outputs grow ~SF²). Decompose the
  * PPJoin stages: postings, prefix postings, CANDIDATE pairs, length-
  * filtered candidates, VERIFIED pairs — if candidates ≫ true pairs
  * the filter chain needs tightening (length filter / positional
  * filter); if candidates ≈ true pairs the growth is output-inherent
  * and the 141 s is the data, not the plan. Stage frames replicate
  * `pipeline/Dedup.jaccardPairs` exactly (same hashes, same ordering). */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val threshold = 0.8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val sh = graft.pipeline.Dedup.shingled(docs, "doc_id", "text", 3)
    println(s"[probe] docs=${docs.count()} shingled=${sh.count()}")
    time("full jaccardPairs (shipped shape, warm)") {
      graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", 3, threshold).count()
    }
    val t = time("full jaccardPairs (shipped shape, 2nd)") {
      graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", 3, threshold).count()
    }
    println(s"[probe] verified true pairs = $t")
    // ---- stage decomposition (replicates jaccardPairs' frames) ----
    val posts = sh.select(col("doc"), col("nsh"), explode(col("sh")).as("s"))
      .select(col("doc"), col("nsh"), xxhash64(col("s")).as("h")).persist()
    println(s"[probe] postings = ${posts.count()}")
    val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefixLen = (col("nsh") - ceil(col("nsh") * threshold) + 1).cast("int")
    val prefix = posts.join(dfreq, "h").groupBy(col("doc"))
      .agg(first(col("nsh")).as("nsh"),
        array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc"), col("nsh"),
        explode(slice(col("ranked"), lit(1), prefixLen)).as("p"))
      .select(col("doc"), col("nsh"), col("p.h").as("h")).persist()
    println(s"[probe] prefix postings = ${prefix.count()}")
    val a = prefix.select(col("h"), col("doc").as("doc_a"), col("nsh").as("nsh_a"))
    val b = prefix.select(col("h"), col("doc").as("doc_b"), col("nsh").as("nsh_b"))
    val joinedRaw = a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b"))
    val candRaw = time("candidate distinct (no length filter)") {
      joinedRaw.select(col("doc_a"), col("doc_b")).distinct().count()
    }
    println(s"[probe] candidate pairs (shipped)        = $candRaw")
    // LENGTH FILTER: jaccard >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
    val candLen = time("candidate distinct (+ length filter)") {
      joinedRaw.filter(
        least(col("nsh_a"), col("nsh_b")).cast("double") >=
          greatest(col("nsh_a"), col("nsh_b")) * threshold)
        .select(col("doc_a"), col("doc_b")).distinct().count()
    }
    println(s"[probe] candidate pairs (length-filtered) = $candLen")
    println(f"[probe] selectivity: true/candRaw = ${t.toDouble / candRaw}%.4f, " +
      f"true/candLen = ${t.toDouble / candLen}%.4f, " +
      f"lenFilter cut = ${1 - candLen.toDouble / candRaw}%.4f")
    // ---- VERIFY stage in isolation (candidates persisted first) ----
    val candFrame = joinedRaw.filter(
      least(col("nsh_a"), col("nsh_b")).cast("double") >=
        greatest(col("nsh_a"), col("nsh_b")) * threshold)
      .select(col("doc_a"), col("doc_b")).distinct().persist()
    candFrame.count() // materialize outside the timer
    val shp = sh.persist(); shp.count()
    val verified = time("verify stage alone (exact jaccard joins)") {
      candFrame
        .join(shp.select(col("doc").as("doc_a"), col("sh").as("sh_a"),
          col("nsh").as("nsh_a")), "doc_a")
        .join(shp.select(col("doc").as("doc_b"), col("sh").as("sh_b"),
          col("nsh").as("nsh_b")), "doc_b")
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")).cast("double")
          >= threshold)
        .count()
    }
    println(s"[probe] verify output = $verified")
    // ---- POSITIONAL filter potential (safe relational variant) ----
    // prefixes of both docs are heads of the SAME global (df, h) order,
    // so common tokens before a matched one appear before it in BOTH
    // lists: overlap ≤ min(pa, pb) + 1 + min(nsh_a − pa − 1,
    // nsh_b − pb − 1) (0-indexed). A true pair (overlap ≥
    // ⌈t/(1+t)·(|A|+|B|)⌉) passes at EVERY matching row, so filtering
    // rows is lossless for the pair set.
    val prefixPos = posts.join(dfreq, "h").groupBy(col("doc"))
      .agg(first(col("nsh")).as("nsh"),
        array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc"), col("nsh"),
        posexplode(slice(col("ranked"), lit(1), prefixLen)))
      .select(col("doc"), col("nsh"), col("pos"), col("col.h").as("h"))
      .persist()
    prefixPos.count()
    val ap = prefixPos.select(col("h"), col("doc").as("doc_a"),
      col("nsh").as("nsh_a"), col("pos").as("pos_a"))
    val bp = prefixPos.select(col("h"), col("doc").as("doc_b"),
      col("nsh").as("nsh_b"), col("pos").as("pos_b"))
    val alpha = ceil((col("nsh_a") + col("nsh_b")) *
      lit(threshold / (1.0 + threshold)))
    val candPos = time("candidate distinct (+ length + positional)") {
      ap.join(bp, Seq("h")).filter(col("doc_a") < col("doc_b") &&
        least(col("nsh_a"), col("nsh_b")).cast("double") >=
          greatest(col("nsh_a"), col("nsh_b")) * threshold &&
        (least(col("pos_a"), col("pos_b")) + lit(1) +
          least(col("nsh_a") - col("pos_a") - 1,
            col("nsh_b") - col("pos_b") - 1)).cast("double") >= alpha)
        .select(col("doc_a"), col("doc_b")).distinct().count()
    }
    println(f"[probe] candidate pairs (+positional) = $candPos " +
      f"(further cut = ${1 - candPos.toDouble / candLen}%.4f; " +
      f"true/candPos = ${t.toDouble / candPos}%.4f)")
    spark.stop()
  }
}

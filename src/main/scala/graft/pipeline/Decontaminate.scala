package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents sharing verbatim
  * n-gram runs with an evaluation corpus — the standard leak check run
  * before training (n-gram overlap against held-out benchmark suites).
  *
  * Scale shape: the eval side (benchmark suites — thousands of docs, MBs
  * of distinct n-grams) is BROADCAST, so the 100 TB train side never
  * shuffles for the probe: it stays a narrow scan → shingle → hash map
  * stage feeding a broadcast hash join; the only shuffle carries
  * (8-byte doc id, 8-byte gram hash) hit pairs into the per-doc
  * aggregation — and only for docs that hit at all.
  */
object Decontaminate {

  /** (doc, gh) posting per DISTINCT n-gram — hashed int(md5[0:8]) so a
    * SQL oracle reproduces values; 8-byte longs through every shuffle. */
  private def gramPostings(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    // distinct grams hashed BEFORE the explode (native gram_hashes — the
    // identical conv(substring(md5(gram),1,8),16,10) u32 over the same
    // distinct set word_shingles produced): gram strings never
    // materialize as rows (r18 round 2; posting values bit-identical)
    df.select(col(idCol).as("doc"), TextAnalysis.words(col(textCol)).as("ws"))
      .select(col("doc"),
        explode(graft.functions.TextFunctions.gram_hashes(col("ws"), n,
          distinct = true)).as("gh"))

  /** Train docs sharing >= `minHits` distinct `n`-grams with any eval
    * doc: (doc_id, hits = distinct shared grams, evals = distinct eval
    * docs hit). A 32-bit hash collision can only ADD a spurious hit —
    * decontamination wants recall (a leaked doc must be flagged), so
    * over-flagging a handful of docs is the safe failure direction;
    * widen to the full 16-byte md5 when false positives matter. */
  def contamination(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, n: Int, minHits: Long): DataFrame = {
    val tg = gramPostings(train, idCol, textCol, n)
    val eg = gramPostings(evalDf, idCol, textCol, n)
      .select(col("doc").as("eval_id"), col("gh"))
    tg.join(broadcast(eg), "gh")
      .groupBy(col("doc").as(idCol))
      .agg(countDistinct(col("gh")).as("hits"),
        countDistinct(col("eval_id")).as("evals"))
      .filter(col("hits") >= minHits)
  }
}

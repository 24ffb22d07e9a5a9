package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model + per-document cross-entropy scoring —
  * the CCNet-style perplexity quality filter (docs that the corpus LM
  * finds surprising are boilerplate, gibberish, or wrong-language), here
  * trained IN-ENGINE so the whole filter runs in two scans with no
  * external model service.
  *
  * Model: add-k-smoothed bigrams,
  * `p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁) + k·V)`.
  * Training is two map-side-combined groupBy counts (shuffles carry
  * (ngram, count) pairs, never documents). Scoring explodes each doc's
  * bigrams, left-joins the model (unseen bigrams fall back to the same
  * smoothing formula with c=0 — a left join, NOT a filter, so
  * out-of-vocabulary text is penalized rather than skipped), and folds
  * back to one row per doc. At 100 TB the model join is the knob: a
  * natural-language bigram table is ≪ the corpus (millions of rows, not
  * billions) — broadcast it (`hintBroadcast`); a pathological vocabulary
  * falls back to a plain shuffle join on the bigram key.
  */
object LangModel {

  /** Bigrams of the tokenized text: array of (w1, w2) structs, empty for
    * docs with fewer than two tokens. */
  private def bigramsOf(ws: Column): Column =
    when(size(ws) >= 2,
      arrays_zip(slice(ws, lit(1), size(ws) - 1).as("w1"),
        slice(ws, lit(2), size(ws) - 1).as("w2")))
      .otherwise(array())

  /** Train the bigram model: `(w1, w2, c2)` bigram counts joined with
    * `c1` unigram counts of the CONTEXT word, plus the vocabulary size
    * as a one-row frame `(vocab_size)`. Two count aggregations — the
    * shuffles carry counts, never text. */
  def trainBigram(df: DataFrame, textCol: String): (DataFrame, Long) = {
    val ws = TextAnalysis.words(col(textCol))
    // persist the unigram counts: the vocab count below materializes the
    // cache, so the model join reads it instead of re-tokenizing and
    // re-exploding the corpus a second time (r17; the frame is slim —
    // one (word, count) row per DISTINCT word, ≪ corpus). Freed by the
    // ContextCleaner when the model frame becomes unreachable.
    val uni = df.select(explode(ws).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = df.select(explode(bigramsOf(ws)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val vocab = uni.count()
    (bi.join(uni.withColumnRenamed("w", "w1"), "w1")
      .select("w1", "w2", "c2", "c1"), vocab)
  }

  /** Score each document against a trained model: cross-entropy in bits per
    * bigram, `H = −(1/n)·Σ log₂ p(w₂|w₁)`, with add-k smoothing and the
    * SAME formula for unseen bigrams/contexts (c=0). Docs with < 2
    * tokens score null. Output: idCol, n_bigrams, bits_per_bigram.
    *
    * `hintBroadcast` pins a broadcast of the model (right for natural
    * language at any corpus scale); without it Spark's stats decide. */
  def crossEntropy(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, vocabSize: Long, k: Double = 0.5,
      hintBroadcast: Boolean = false): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    require(vocabSize > 0, "vocabSize must be positive")
    val ws = TextAnalysis.words(col(textCol))
    val pairs = docs.select(col(idCol), explode(bigramsOf(ws)).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // persist the model projection: it feeds the bigram join AND the
    // context frame below — without it the whole model-training subtree
    // (two corpus aggregations + a join) executes once per reference
    // (r17; slim (w1, w2, counts) rows, freed by the ContextCleaner)
    val m0 = model.select(col("w1"), col("w2"), col("c2"), col("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = if (hintBroadcast) broadcast(m0) else m0
    // unigram context counts for unseen (w1, w2) where w1 IS in-vocab:
    // the bigram row is absent but c1 must still be the context count —
    // recover it from any model row of that context via a second
    // (context-level) frame, derived without rescanning the corpus
    val ctx0 = m0.groupBy("w1").agg(first(col("c1")).as("c1ctx"))
    val ctx = if (hintBroadcast) broadcast(ctx0) else ctx0
    val joined = pairs
      .join(m, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
    val c2 = coalesce(col("c2").cast("double"), lit(0.0))
    val c1 = coalesce(col("c1").cast("double"), col("c1ctx").cast("double"), lit(0.0))
    val p = (c2 + lit(k)) / (c1 + lit(k * vocabSize))
    val bits = -log2(p)
    joined.select(col(idCol), bits.as("__bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__bits")) / count(lit(1))).as("bits_per_bigram"))
  }

  /** Train-and-score in one call (self-scoring: the standard "how
    * typical of this corpus is each document" signal). */
  def selfCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5, hintBroadcast: Boolean = false): DataFrame = {
    val (model, vocab) = trainBigram(docs, textCol)
    crossEntropy(docs, idCol, textCol, model, vocab, k, hintBroadcast)
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure column expressions (whole-stage codegen, no UDFs) so they run
  * at 100 TB as narrow map stages — no shuffle, no driver state.
  */
object TextAnalysis {

  /** Whitespace word list (lowercased, empty tokens dropped). Native
    * since r18 round 2: the `filter(split(lower(trim(text)), "\s+"), …)`
    * formulation is a higher-order function — interpreted, and it drags
    * every projection containing it out of whole-stage codegen;
    * `split_words` produces the identical array in one codegen byte
    * scan (equivalence spec-pinned on the corpus + edge cases). */
  def words(text: Column): Column =
    graft.functions.TextFunctions.split_words(text)

  /** Raw (case-preserving) whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** BPE-ish subword count: word chunks + standalone punctuation marks
    * (lookahead-free so RE2-based engines agree: chunk count from a
    * non-word split plus a punctuation character count). Native since
    * r18 round 2 — the split/filter/regexp_replace formulation paid two
    * regex passes and an interpreted lambda per row; `bpeish_count` is
    * one byte scan with the identical ASCII `\w`/`\s` classes
    * (equivalence spec-pinned incl. CJK). */
  def bpeishTokenCount(text: Column): Column =
    graft.functions.TextFunctions.bpeish_count(text)

  /** Fixed-token chunking with overlap — the embedding-prep step
    * (retrieval corpora index CHUNKS, not documents): split each doc's
    * token stream into windows of `chunkTokens` words advancing by
    * `chunkTokens − overlap`, re-joined with single spaces. One narrow
    * map + one explode — no shuffle; a 100 TB corpus chunks at scan
    * speed. Chunk starts are `0, step, 2·step, …` while a start <
    * n_tokens, so the final partial window is kept (standard RAG
    * convention) and every token lands in ≥ 1 chunk; a doc shorter than
    * one window yields exactly one chunk. Output: one row per chunk with
    * `chunk_index`, `chunk_start` (token offset), `n_chunk_tokens`,
    * `chunk_text`. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val withWords = df.withColumn("__ws", words(col(textCol)))
      .filter(size(col("__ws")) > 0)
    val starts = sequence(lit(0),
      // last start = step · ⌈(n − chunkTokens) / step⌉, capped at ≥ 0:
      // the first start whose window reaches the end of the doc — the
      // tail chunk may be partial but is never fully contained in its
      // predecessor
      greatest(lit(0),
        ((size(col("__ws")) - chunkTokens + (step - 1)) / step)
          .cast("int") * step), lit(step))
    withWords
      .withColumn("chunk_start", explode(starts))
      // slice is 1-based
      .withColumn("__chunk_ws",
        slice(col("__ws"), col("chunk_start") + 1, lit(chunkTokens)))
      .filter(size(col("__chunk_ws")) > 0)
      .select(col(idCol),
        (col("chunk_start") / step).cast("int").as("chunk_index"),
        col("chunk_start"),
        size(col("__chunk_ws")).as("n_chunk_tokens"),
        array_join(col("__chunk_ws"), " ").as("chunk_text"))
  }

  /** n-gram shingles (distinct) over an ALREADY-MATERIALIZED words column.
    * Always project `words()` into its own column first: referencing a
    * computed array from inside the transform lambda would re-evaluate the
    * regex split per element access (CSE cannot hoist into lambdas).
    * Docs shorter than n words yield an empty array (guarded — Spark's
    * sequence(1,0) would count DOWN, not produce an empty range). */
  def shinglesOfWords(ws: Column, n: Int): Column =
    graft.functions.TextFunctions.word_shingles(ws, n)

  /** Winnowing fingerprint selection (the rolling-hash document
    * fingerprinting scheme of Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every POSITIONAL n-gram (duplicates kept — repeated runs must
    * occupy their positions), slide a window of `w` hashes, select each
    * window's minimum; the distinct selected values are the doc's
    * sketch. Guarantee: two docs sharing any run of >= w+n-1 words share
    * at least one selected fingerprint — the basis for PARTIAL-overlap /
    * containment detection that whole-doc similarity (Jaccard, SimHash)
    * cannot express. Hashes are int(md5[0:8]) so a SQL oracle reproduces
    * them; sketch size is ~2/(w+1) of token count. A native codegen
    * expression (one O(tokens · w) loop per row — the Catalyst-lambda
    * formulation re-hashes the doc per window element, O(tokens²); see
    * [[graft.functions.WinnowUtil]]), so it runs at 100 TB as a narrow
    * map stage. Docs with < n words yield an empty sketch. */
  def winnowHashes(ws: Column, n: Int, w: Int): Column =
    graft.functions.TextFunctions.winnow_hashes(ws, n, w)

  /** Canonical normalized form: lowercase, whitespace collapsed. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Document fingerprint = md5 of the normalized text (content hash for
    * exact dedup; the rolling-hash variant is `simhash` in [[Dedup]]). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Count of characters in a regex class (cross-engine: length-difference
    * of a global regexp_replace, identical in Spark and DuckDB). */
  def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "que", "los", "y"),
    "fr" -> Seq("le", "les", "et", "la"))

  /** Per-language stopword hit count over the word list (native since
    * r18 round 2 — `size(filter(ws, isin…))` is an interpreted
    * higher-order function; `count_in` is one codegen loop). */
  def stopHits(ws: Column, lang: String): Column =
    graft.functions.TextFunctions.count_in(ws, stop(lang))

  /** CJK character count (Han ideograph range). */
  def cjkCount(text: Column): Column =
    charClassCount(text, "[一-鿿]")

  /** N-gram/stopword language-ID heuristic with a deterministic
    * priority tie-break (zh by ideographs, then en/de/es/fr stopwords). */
  def langId(text: Column): Column = {
    val ws = words(text)
    val (en, de, es, fr) = (stopHits(ws, "en"), stopHits(ws, "de"),
      stopHits(ws, "es"), stopHits(ws, "fr"))
    val zh = cjkCount(text)
    when(zh > greatest(en, de, es, fr), "zh")
      .when(en >= greatest(de, es, fr), "en")
      .when(de >= greatest(es, fr), "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Repetition signals (the Gopher/MassiveText-style repetition
    * filters): duplicate-word fraction and most-frequent-bigram
    * fraction, ×10⁴ as integers (`floor(x·10⁴+0.5)` — identical IEEE
    * ops in any engine, immune to decimal-rounding divergence).
    * Bigrams are POSITIONAL (duplicates kept — frequency is the
    * point); the only shuffle carries (doc, bigram) rows for the
    * per-doc mode, partial-aggregated map-side. Docs with < 2 words
    * report 0 for both fractions. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ROW-LOCAL since r18 round 2: the per-doc top-bigram count is a fold
    // over the doc's own bigrams, so shipping every (doc, bigram) posting
    // through an exchange + two aggregations + a join back (the previous
    // formulation) shuffled the corpus to compute values that never leave
    // their row. `top_ngram_count` (native, codegen-friendly) counts the
    // mode in one pass per row — the whole operator is now a narrow map
    // (guide §2.4); counts are exact integers, so output is bit-identical.
    val ws = df.select(col(idCol).as("doc"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)
    ws.select(col("doc"), size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        when(size(col("ws")) >= 2,
          graft.functions.TextFunctions.top_ngram_count(col("ws"), 2))
          .otherwise(lit(0L)).as("top_c"))
      .select(col("doc").as(idCol), col("n_words"),
        floor((col("n_words") - col("n_distinct")) * 10000.0 / col("n_words") + 0.5)
          .cast("long").as("dup_word_e4"),
        when(col("n_words") >= 2,
          floor(col("top_c") * 10000.0 / (col("n_words") - 1) + 0.5).cast("long"))
          .otherwise(lit(0L)).as("top_bigram_e4"))
  }

  /** POSITIONAL n-grams (duplicates kept) over a materialized words
    * column — frequency-preserving, unlike the distinct `shinglesOfWords`.
    * Docs shorter than n words yield an empty array. */
  def ngramsPositional(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Corpus-level top-k n-grams with term frequency and document
    * frequency — the vocabulary/boilerplate profile pass of a corpus
    * audit. The explode shuffles (doc, ngram) rows once; `count` is
    * partial-aggregated map-side, `count distinct` doc_ids expands in
    * the same exchange, and the top-k is a TakeOrdered (no global sort
    * materialization). Total deterministic order: (tf desc, ngram asc)
    * is unique per group row. */
  def ngramTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // positional_ngrams (native) instead of the interpreted
    // transform/concat_ws lambda of [[ngramsPositional]] — identical
    // gram strings (spec-pinned), one loop per row (r18 round 2)
    val posts = df
      .select(col(idCol).as("doc"), words(col(textCol)).as("ws"))
      .select(col("doc"), explode(graft.functions.TextFunctions
        .positional_ngrams(col("ws"), n)).as("ngram"))
    posts.groupBy("ngram")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc")).as("df"))
      .orderBy(col("tf").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-doc top-k characteristic terms by a tf-idf-shaped score.
    *
    * Score = tf · (N / df) — the classic shape with the LOG DROPPED on
    * purpose: `ln` is libm, not IEEE-specified, so two engines may
    * differ in the last ulp and flip a rank/floor; plain multiply-divide
    * of exact integers is correctly-rounded IEEE and bit-identical
    * everywhere (N/df is monotone in 1/df, so per-doc ranking quality is
    * the same). Emitted as `floor(score·10⁶ + 0.5)`.
    *
    * Shuffles: one (doc, term) aggregation for tf, one (term)
    * aggregation for df, a term-keyed join (the term dictionary is far
    * smaller than the corpus but beyond broadcast at 100 TB — the join
    * rides the df aggregation's partitioning), and a per-doc window for
    * the top-k. `nDocs` is passed in (callers know it; a `count()` here
    * would force an extra pass). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      nDocs: Long, k: Int): DataFrame = {
    val posts = df
      .select(col(idCol).as("doc"), words(col(textCol)).as("ws"))
      .select(col("doc"), explode(col("ws")).as("term"))
    // tf feeds the df aggregation AND the score join — persist so the
    // term explode + count run once (freed by ContextCleaner; same reuse
    // policy as Dedup/Similarity)
    val tf = posts.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score_e6",
        floor(col("tf") * lit(nDocs.toDouble) / col("df") * 1e6 + 0.5)
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score_e6").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc").as(idCol), col("rank"), col("term"),
        col("tf"), col("df"), col("score_e6"))
  }

  /** PII patterns — deliberately restricted to syntax Java regex and
    * RE2 (DuckDB/Go engines) interpret identically, so a SQL oracle
    * can reproduce scan counts and redactions byte-for-byte. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Per-document PII hit counts (emails, intl-format phones, IPv4s). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(emailRe)).as("n_email"),
    regexp_count(text, lit(phoneRe)).as("n_phone"),
    regexp_count(text, lit(ipv4Re)).as("n_ipv4"))

  /** Redaction: email first (its domain would otherwise be visible to
    * the dotted-quad pattern), then IPv4, then phone. A narrow map
    * stage — the 100 TB PII pass is scan-shaped, no shuffle at all. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Deflate compression ratio (MassiveText/Gopher redundancy signal):
    * boilerplate/repetitive docs compress well below ~0.4, natural prose
    * sits around 0.5-0.8. Native expression (whole-stage-codegen
    * friendly, per-thread Deflater); spec-tested — zlib output is not
    * SQL-reproducible, so this signal carries no battery oracle. */
  def compressionRatio(text: Column): Column =
    graft.functions.TextFunctions.compress_ratio(text)

  /** Composite document filter (the C4/Gopher-style rule battery): every
    * rule that fires lands in a `reasons` array, `keep` = no rule fired —
    * provenance-preserving, so a pipeline can audit WHY a doc dropped
    * (and re-admit classes of drops without a recompute). One narrow map
    * stage over (text); thresholds are the published Gopher/C4 defaults
    * scaled to this corpus. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, maxWords: Int = 100000,
      maxDupWordFrac: Double = 0.5, maxCompressRatio: Double = 0.35,
      maxPiiPerKChars: Double = 10.0): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nw = size(ws)
    val dupFrac = (nw - size(array_distinct(ws))).cast("double") /
      when(nw =!= 0, nw.cast("double"))
    val pii = (regexp_count(t, lit(emailRe)) + regexp_count(t, lit(phoneRe)) +
      regexp_count(t, lit(ipv4Re))).cast("double") * 1000.0 /
      when(length(t) =!= 0, length(t).cast("double"))
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nw < minWords),
      "too_long" -> (nw > maxWords),
      "dup_words" -> (coalesce(dupFrac, lit(0.0)) > maxDupWordFrac),
      "compressible" -> (nw >= minWords &&
        compressionRatio(t) < maxCompressRatio),
      "pii_dense" -> (coalesce(pii, lit(0.0)) > maxPiiPerKChars))
    val reasons = filter(
      array(rules.map { case (name, c) =>
        when(c, name).otherwise(lit(null))
      }: _*), r => r.isNotNull)
    df.select(col(idCol), reasons.as("reasons"))
      .withColumn("keep", size(col("reasons")) === 0)
  }

  /** Heuristic quality score in [0,1]: length saturation + lexical
    * diversity + stopword density (the usual cheap pre-filters applied
    * before expensive model-based scoring). */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val nTok = size(ws).cast("double")
    val uniq = size(array_distinct(ws)).cast("double")
    val stopR = stopHits(ws, "en").cast("double") / when(nTok =!= 0.0, nTok)
    val lenSat = least(nTok / 100.0, lit(1.0))
    val divers = uniq / when(nTok =!= 0.0, nTok)
    coalesce(lit(0.4) * lenSat + lit(0.3) * divers + lit(0.3) * stopR, lit(0.0))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 round 2: back-to-back A/B of the row-local native doc aggregations
  * (minhash_lanes / simhash64 / top_ngram_count) against the explode →
  * groupBy formulations they replaced, in ONE session so host phase can't
  * confound the comparison. Variants also measure spread() on the input,
  * since removing the aggregation exchange changes where parallelism
  * comes from. */
object ProbeRowLocal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Dedup, TextAnalysis}

    def time(tag: String)(f: => DataFrame): Unit = {
      def mat(): Unit = f.write.format("noop").mode("overwrite").save()
      mat()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); mat(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[rowlocal] $tag%-36s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val docsSpread = docs.repartition(cpus.toInt)

    // ---- OLD formulations (as shipped before this round) ----
    def oldMinhashSigs(df: DataFrame, n: Int, k: Int): DataFrame = {
      val sh = Dedup.shingled(df, "doc_id", "text", n)
      val nMd5 = (k + 3) / 4
      val posts = sh.select(col("doc"), explode(col("sh")).as("s"))
        .select(col("doc") +: (0 until nMd5).map(j =>
          md5(concat(lit(s"$j:"), col("s"))).as(s"h$j")): _*)
      val mins = (0 until k).map { i =>
        min(substring(col(s"h${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"m$i")
      }
      posts.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
    }
    def oldBandKeys(df: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
      val rows = k / bands
      val sigs = oldMinhashSigs(df, n, k)
      val bandCols = (0 until bands).map { bi =>
        struct(lit(bi).as("band"),
          md5(concat_ws("|", (0 until rows).map(r => col(s"m${bi * rows + r}")): _*)).as("h"))
      }
      sigs.select(col("doc"), explode(array(bandCols: _*)).as("bh"))
    }
    def oldLshPairs(df: DataFrame, n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
      val banded = oldBandKeys(df, n, k, bands)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = banded.as("x").join(banded.as("y"), col("x.bh") === col("y.bh"))
        .filter(col("x.doc") < col("y.doc"))
        .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b")).distinct()
      val sh = Dedup.shingled(df, "doc_id", "text", n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cand
        .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_a")
        .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "doc_b")
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("common").cast("double") /
            (col("nsh_a") + col("nsh_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }
    def oldSimhash(df: DataFrame, n: Int): DataFrame = {
      val posts = Dedup.shingled(df, "doc_id", "text", n)
        .select(col("doc"), explode(col("sh")).as("s"))
        .select(col("doc"), md5(col("s")).as("h"))
        .select(col("doc"),
          conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("w0"),
          conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("w1"))
      val votes = (0 until 64).map { b =>
        val word = col(if (b < 32) "w0" else "w1")
        val shift = 4 * (7 - (b / 4 % 8)) + b % 4
        sum(when(shiftright(word, shift).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"v$b")
      }
      val voted = posts.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
      val sig = (0 until 64).map { b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
      }.reduce((x, y) => x.bitwiseOR(y))
      voted.select(col("doc"), sig.as("simhash"))
    }

    // battery shapes: signatures query is spread at the query level
    time("sigs OLD (spread input)") {
      oldMinhashSigs(docsSpread, 3, 8).orderBy("doc") }
    time("sigs NEW (spread input)") {
      Dedup.minhashSignatures(docsSpread, "doc_id", "text", 3, 8).orderBy("doc") }
    time("sigs NEW (unspread)") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8).orderBy("doc") }

    time("lsh OLD (unspread)") {
      oldLshPairs(docs, 3, 8, 4, 0.8) }
    time("lsh NEW (unspread)") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.8) }
    time("lsh NEW (spread input)") {
      Dedup.minhashLshPairs(docsSpread, "doc_id", "text", 3, 8, 4, 0.8) }

    time("simhash OLD (unspread)") {
      oldSimhash(docs, 3).orderBy("doc") }
    time("simhash NEW (unspread)") {
      Dedup.simhash(docs, "doc_id", "text", 3).orderBy("doc") }
    time("simhash NEW (spread input)") {
      Dedup.simhash(docsSpread, "doc_id", "text", 3).orderBy("doc") }

    // repetition: old vs new (battery query is spread at the query level)
    def oldRepetition(df: DataFrame): DataFrame = {
      val ws = df.select(col("doc_id").as("doc"), TextAnalysis.words(col("text")).as("ws"))
        .filter(size(col("ws")) > 0)
      val base = ws.select(col("doc"), size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"))
      val top = ws.filter(size(col("ws")) >= 2)
        .select(col("doc"), explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1)))).as("bg"))
        .groupBy(col("doc"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc")).agg(max(col("c")).as("top_c"))
      base.join(top, Seq("doc"), "left")
        .select(col("doc").as("doc_id"), col("n_words"),
          floor((col("n_words") - col("n_distinct")) * 10000.0 / col("n_words") + 0.5)
            .cast("long").as("dup_word_e4"),
          coalesce(
            floor(col("top_c") * 10000.0 / (col("n_words") - 1) + 0.5).cast("long"),
            lit(0L)).as("top_bigram_e4"))
    }
    time("repetition OLD (spread input)") { oldRepetition(docsSpread).orderBy("doc_id") }
    time("repetition NEW (spread input)") {
      TextAnalysis.repetitionStats(docsSpread, "doc_id", "text").orderBy("doc_id") }

    // ---- gram_hashes: spans + decontamination ----
    def oldSpans(df: DataFrame, n: Int, minDocs: Long): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val posts = df
        .select(col("doc_id").as("doc"), TextAnalysis.words(col("text")).as("ws"))
        .select(col("doc"),
          posexplode(TextAnalysis.ngramsPositional(col("ws"), n)).as(Seq("pos", "gram")))
        .select(col("doc"), col("pos"),
          conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("gh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dup = posts.groupBy(col("gh"))
        .agg(countDistinct(col("doc")).as("nd"))
        .filter(col("nd") >= minDocs).select("gh")
      val marked = posts.join(dup, "gh").select(col("doc"), col("pos"))
      val byDoc = Window.partitionBy("doc").orderBy("pos")
      marked
        .withColumn("brk",
          when(col("pos") - lag("pos", 1).over(byDoc) > n, 1).otherwise(0))
        .withColumn("island", sum("brk").over(byDoc))
        .groupBy(col("doc"), col("island"))
        .agg(min("pos").as("s"), (max("pos") + n).as("e"))
        .select(col("doc"), col("s").cast("long").as("span_start"),
          col("e").cast("long").as("span_end"),
          (col("e") - col("s")).cast("long").as("span_tokens"))
    }
    def oldContamination(train: DataFrame, evalDf: DataFrame,
        n: Int, minHits: Long): DataFrame = {
      def posts(df: DataFrame): DataFrame =
        Dedup.shingled(df, "doc_id", "text", n)
          .select(col("doc"), explode(col("sh")).as("s"))
          .select(col("doc"),
            conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("gh"))
      posts(train).join(broadcast(
          posts(evalDf).select(col("doc").as("eval_id"), col("gh"))), "gh")
        .groupBy(col("doc").as("doc_id"))
        .agg(countDistinct(col("gh")).as("hits"),
          countDistinct(col("eval_id")).as("evals"))
        .filter(col("hits") >= minHits)
    }
    time("spans OLD (unspread)") {
      oldSpans(docs, 6, 2L).orderBy("doc", "span_start") }
    time("spans NEW (unspread)") {
      Dedup.repeatedSpans(docs, "doc_id", "text", 6, 2L).orderBy("doc", "span_start") }
    time("decontaminate OLD (spread)") {
      oldContamination(docsSpread.filter(col("doc_id") % 20 =!= 0),
        docsSpread.filter(col("doc_id") % 20 === 0), 5, 3L).orderBy("doc_id") }
    time("decontaminate NEW (spread)") {
      graft.pipeline.Decontaminate.contamination(
        docsSpread.filter(col("doc_id") % 20 =!= 0),
        docsSpread.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", 5, 3L).orderBy("doc_id") }

    // ---- split_words / count_in: the tokenizer kernel ----
    def oldWords(text: org.apache.spark.sql.Column) =
      filter(split(lower(trim(text)), "\\s+"), w => w =!= "")
    def oldStopHits(ws: org.apache.spark.sql.Column, set: Seq[String]) =
      size(filter(ws, w => w.isin(set.map(lit): _*)))
    def docStatsShape(w: org.apache.spark.sql.Column, d: DataFrame) =
      d.select(col("doc_id"), size(w).as("n_tokens"),
        size(array_distinct(w)).as("n_uniq"),
        length(col("text")).as("n_chars")).orderBy("doc_id")
    time("doc_stats-ish OLD words (spread)") {
      docStatsShape(oldWords(col("text")), docsSpread) }
    time("doc_stats-ish NEW words (spread)") {
      docStatsShape(TextAnalysis.words(col("text")), docsSpread) }
    def langIdShape(w: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        h: (org.apache.spark.sql.Column, Seq[String]) => org.apache.spark.sql.Column,
        d: DataFrame) = {
      val ws = w(col("text"))
      val en = h(ws, Seq("the", "a", "of", "and"))
      val de = h(ws, Seq("der", "die", "und", "das"))
      val es = h(ws, Seq("el", "que", "los", "y"))
      val fr = h(ws, Seq("le", "les", "et", "la"))
      val zh = length(col("text")) - length(regexp_replace(col("text"), "[一-鿿]", ""))
      d.select(col("doc_id"),
        when(zh > greatest(en, de, es, fr), "zh")
          .when(en >= greatest(de, es, fr), "en")
          .when(de >= greatest(es, fr), "de")
          .when(es >= fr, "es").otherwise("fr").as("predicted"))
        .orderBy("doc_id")
    }
    time("lang_id-ish OLD words (spread)") {
      langIdShape(oldWords, oldStopHits, docsSpread) }
    time("lang_id-ish NEW words (spread)") {
      langIdShape(TextAnalysis.words,
        (ws, s) => graft.functions.TextFunctions.count_in(ws, s), docsSpread) }

    // jaccard pairs with the words kernel swapped (old vs native) —
    // everything downstream identical to Dedup.jaccardPairs
    def jaccardWith(wordsOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        df: DataFrame, n: Int, threshold: Double): DataFrame = {
      val sh = df.select(col("doc_id").as("doc"), wordsOf(col("text")).as("ws"))
        .select(col("doc"), TextAnalysis.shinglesOfWords(col("ws"), n).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("nsh", size(col("sh")))
      val posts = sh.select(col("doc"), col("nsh"), explode(col("sh")).as("s"))
        .select(col("doc"), col("nsh"), xxhash64(col("s")).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val prefixLen = (col("nsh") - ceil(col("nsh") * threshold) + 1).cast("int")
      val prefix = posts
        .join(dfreq, "h")
        .groupBy(col("doc"))
        .agg(first(col("nsh")).as("nsh"),
          array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
        .select(col("doc"), col("nsh"),
          explode(slice(col("ranked"), lit(1), prefixLen)).as("p"))
        .select(col("doc"), col("nsh"), col("p.h").as("h"))
      val a = prefix.select(col("h"), col("doc").as("doc_a"), col("nsh").as("nsh_a"))
      val b = prefix.select(col("h"), col("doc").as("doc_b"), col("nsh").as("nsh_b"))
      val cand = a.join(b, Seq("h"))
        .filter(col("doc_a") < col("doc_b") &&
          least(col("nsh_a"), col("nsh_b")).cast("double") /
            greatest(col("nsh_a"), col("nsh_b")).cast("double") >= threshold)
        .select(col("doc_a"), col("doc_b")).distinct()
      cand
        .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_a")
        .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "doc_b")
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("common").cast("double") /
            (col("nsh_a") + col("nsh_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }
    time("jaccard OLD words (unspread)") {
      jaccardWith(oldWords, docs, 3, 0.8).orderBy("doc_a", "doc_b") }
    time("jaccard NEW words (unspread)") {
      jaccardWith(TextAnalysis.words, docs, 3, 0.8).orderBy("doc_a", "doc_b") }
    // jaccardWith verifies against the FULL shingled corpus (the old
    // shape); Dedup.jaccardPairs now semi-join prunes verification to
    // candidate docs — this pair isolates the prune
    time("jaccard PRUNED verify (shipped)") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).orderBy("doc_a", "doc_b") }

    // exact-substring cut: interpreted filter+exists vs native cut_spans
    def cutWith(native: Boolean, df: DataFrame): DataFrame = {
      val spans = Dedup.repeatedSpans(df, "doc_id", "text", 6, 2L)
        .groupBy(col("doc"))
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"),
          sum(col("span_tokens")).as("n_cut"))
      val toks = df.select(col("doc_id").as("doc"),
        TextAnalysis.words(col("text")).as("ws"))
      toks.join(spans, Seq("doc"), "left")
        .withColumn("kept",
          when(col("spans").isNull, col("ws"))
            .otherwise(if (native)
              graft.functions.TextFunctions.cut_spans(col("ws"), col("spans"))
            else filter(col("ws"), (_, i) =>
              !exists(col("spans"), sp =>
                i >= sp.getField("span_start") && i < sp.getField("span_end")))))
        .select(col("doc"), size(col("kept")).cast("long").as("n_kept"),
          coalesce(col("n_cut"), lit(0L)).as("n_cut"),
          md5(array_join(col("kept"), " ")).as("clean_fp"))
        .orderBy("doc")
    }
    time("substring_cut OLD lambda") { cutWith(native = false, docs) }
    time("substring_cut NEW native") { cutWith(native = true, docs) }

    // incremental dedup: verification shingles pruned to candidates vs
    // the unpruned full-corpus shingle joins (battery shape)
    def incrementalUnpruned(existing: DataFrame, incoming: DataFrame,
        n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
      val exFp = existing
        .select(col("doc_id").as("ex_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min("ex_id").as("exact_of"))
      val inFp = incoming
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      val exact = inFp.join(exFp, Seq("fp"), "left")
        .select(col("doc_id"), col("exact_of"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nonExact = incoming.join(
        exact.filter(col("exact_of").isNull)
          .select(col("doc_id")), Seq("doc_id"), "leftsemi")
      def bandKeysOf(df: DataFrame): DataFrame = {
        val rows = k / bands
        val sigs = Dedup.minhashSignatures(df, "doc_id", "text", n, k)
        val bandCols = (0 until bands).map { bi =>
          struct(lit(bi).as("band"),
            md5(concat_ws("|", (0 until rows).map(r => col(s"m${bi * rows + r}")): _*)).as("h"))
        }
        sigs.select(col("doc"), explode(array(bandCols: _*)).as("bh"))
      }
      val candidates = bandKeysOf(nonExact).as("x")
        .join(bandKeysOf(existing).as("y"), col("x.bh") === col("y.bh"))
        .select(col("x.doc").as("doc_id"), col("y.doc").as("ex_id")).distinct()
      val near = candidates
        .join(Dedup.shingled(nonExact, "doc_id", "text", n)
          .select(col("doc").as("doc_id"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_id")
        .join(Dedup.shingled(existing, "doc_id", "text", n)
          .select(col("doc").as("ex_id"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "ex_id")
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")).cast("double") >= threshold)
        .groupBy("doc_id").agg(min("ex_id").as("near_of"))
      exact.join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_of").isNotNull, "exact_dup")
            .when(col("near_of").isNotNull, "near_dup")
            .otherwise("new").as("verdict"),
          coalesce(col("exact_of"), col("near_of")).as("dup_of"))
    }
    val exDocs = docs.filter(col("doc_id") % 2 === 0)
    val inDocs = docs.filter(col("doc_id") % 2 === 1)
    time("incremental UNPRUNED verify") {
      incrementalUnpruned(exDocs, inDocs, 3, 8, 4, 0.8).orderBy("doc_id") }
    time("incremental PRUNED verify (shipped)") {
      Dedup.incrementalDedup(exDocs, inDocs, "doc_id", "text", 3, 8, 4, 0.8)
        .orderBy("doc_id") }

    // bpeish count: regex formulation vs native byte scan (doc_stats shape)
    def oldBpeish(text: org.apache.spark.sql.Column) =
      size(filter(split(text, "[^\\w]+"), t => t =!= "")) +
        (length(text) - length(regexp_replace(text, "[^\\w\\s]", "")))
    time("doc_stats bpeish OLD (spread)") {
      docsSpread.select(col("doc_id"), oldBpeish(col("text")).as("n_bpeish"))
        .orderBy("doc_id") }
    time("doc_stats bpeish NEW (spread)") {
      docsSpread.select(col("doc_id"),
        graft.functions.TextFunctions.bpeish_count(col("text")).as("n_bpeish"))
        .orderBy("doc_id") }

    spark.stop()
  }
}

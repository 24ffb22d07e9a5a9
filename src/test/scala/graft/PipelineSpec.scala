package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("exact dedup groups true copies") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different text entirely"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val g = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(g.getAs[Long]("keep_id") == 1L) // min id kept, case/ws-normalized
  }

  test("jaccard pairs: identical docs 1.0, disjoint docs absent") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w q r"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("doc_a") == 1L && pairs(0).getAs[Double]("jaccard") == 1.0)
  }

  test("row-local natives == explode/groupBy formulations (minhash, simhash, top-bigram)") {
    // r18 round 2 pins: minhash_lanes / simhash64 / top_ngram_count
    // replaced corpus-wide explode → groupBy shuffles with per-row folds;
    // this re-states the OLD Catalyst formulations verbatim and demands
    // bit-identical results on the real corpus slice.
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val sh = Dedup.shingled(docs, "doc_id", "text", 3)

    // old minhash: explode + k min(substring(md5("<j>:"||s), off, 8)) aggs
    val k = 8
    val posts = sh.select(col("doc"), explode(col("sh")).as("s"))
      .select(col("doc") +: (0 until 2).map(j =>
        md5(concat(lit(s"$j:"), col("s"))).as(s"h$j")): _*)
    val oldSig = posts.groupBy(col("doc")).agg(
      min(substring(col("h0"), 1, 8)).as("m0"),
      (1 until k).map { i =>
        min(substring(col(s"h${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"m$i")
      }: _*)
    val newSig = Dedup.minhashSignatures(docs, "doc_id", "text", 3, k)
    assert(newSig.exceptAll(oldSig).isEmpty && oldSig.exceptAll(newSig).isEmpty,
      "native minhash_lanes must reproduce the explode/groupBy signatures")

    // old simhash: explode + 64 vote sums over md5 nibble bits
    val votePosts = sh.select(col("doc"), explode(col("sh")).as("s"))
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
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    val oldSk = votePosts.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
      .select(col("doc"), sig.as("simhash"))
    val newSk = Dedup.simhash(docs, "doc_id", "text", 3)
    assert(newSk.exceptAll(oldSk).isEmpty && oldSk.exceptAll(newSk).isEmpty,
      "native simhash64 must reproduce the vote-agg sketches")

    // old top-bigram: explode positional bigrams + two-level agg
    val ws = docs.select(col("doc_id").as("doc"),
      TextAnalysis.words(col("text")).as("ws")).filter(size(col("ws")) >= 2)
    val oldTop = ws
      .select(col("doc"), explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1)))).as("bg"))
      .groupBy(col("doc"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc")).agg(max(col("c")).as("top_c"))
    val newTop = ws.select(col("doc"),
      graft.functions.TextFunctions.top_ngram_count(col("ws"), 2).as("top_c"))
    assert(newTop.exceptAll(oldTop).isEmpty && oldTop.exceptAll(newTop).isEmpty,
      "native top_ngram_count must reproduce the two-level agg mode counts")

    // gram_hashes: positional == hash-after-posexplode of ngramsPositional;
    // distinct == hash-after-explode of word_shingles
    val wsAll = docs.select(col("doc_id").as("doc"),
      TextAnalysis.words(col("text")).as("ws"))
    val oldPos = wsAll
      .select(col("doc"), posexplode(TextAnalysis.ngramsPositional(col("ws"), 6))
        .as(Seq("pos", "gram")))
      .select(col("doc"), col("pos"),
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("gh"))
    val newPos = wsAll
      .select(col("doc"), posexplode(graft.functions.TextFunctions
        .gram_hashes(col("ws"), 6, distinct = false)).as(Seq("pos", "gh")))
      .select(col("doc"), col("pos"), col("gh"))
    assert(newPos.exceptAll(oldPos).isEmpty && oldPos.exceptAll(newPos).isEmpty,
      "positional gram_hashes must reproduce hash-after-explode postings")
    val oldDist = Dedup.shingled(docs, "doc_id", "text", 5)
      .select(col("doc"), explode(col("sh")).as("s"))
      .select(col("doc"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("gh"))
    val newDist = wsAll
      .select(col("doc"), explode(graft.functions.TextFunctions
        .gram_hashes(col("ws"), 5, distinct = true)).as("gh"))
    assert(newDist.exceptAll(oldDist).isEmpty && oldDist.exceptAll(newDist).isEmpty,
      "distinct gram_hashes must reproduce the shingle-hash postings")

    // split_words / count_in: corpus + whitespace/unicode edge cases vs
    // the old higher-order formulations
    val edge = Seq((1000001L, "  Tab\tsep\nlines\r\nand\fforms  "),
      (1000002L, " \t\r\n "), (1000003L, ""), (1000004L, "ONE"),
      (1000005L, "中文 文本 the nbsp stays the"),
      (1000006L, "a  b   c\t\td")).toDF("doc_id", "text")
    val probe = docs.select(col("doc_id"), col("text")).unionByName(edge)
    val oldWords = probe.select(col("doc_id"),
      filter(split(lower(trim(col("text"))), "\\s+"), w => w =!= "").as("ws"))
    val newWords = probe.select(col("doc_id"),
      graft.functions.TextFunctions.split_words(col("text")).as("ws"))
    assert(newWords.exceptAll(oldWords).isEmpty && oldWords.exceptAll(newWords).isEmpty,
      "native split_words must reproduce the filter/split/lower/trim tokens")
    val stopEn = Seq("the", "a", "of", "and")
    val oldHits = newWords.select(col("doc_id"),
      size(filter(col("ws"), w => w.isin(stopEn.map(lit): _*))).as("hits"))
    val newHits = newWords.select(col("doc_id"),
      graft.functions.TextFunctions.count_in(col("ws"), stopEn).as("hits"))
    assert(newHits.exceptAll(oldHits).isEmpty && oldHits.exceptAll(newHits).isEmpty,
      "native count_in must reproduce the isin-filter hit counts")

    // bpeish_count: one byte scan == split-filter + regexp_replace diff
    val oldBpeish = probe.select(col("doc_id"),
      (size(filter(split(col("text"), "[^\\w]+"), t => t =!= "")) +
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^\\w\\s]", "")))).as("n"))
    val newBpeish = probe.select(col("doc_id"),
      graft.functions.TextFunctions.bpeish_count(col("text")).as("n"))
    assert(newBpeish.exceptAll(oldBpeish).isEmpty && oldBpeish.exceptAll(newBpeish).isEmpty,
      "native bpeish_count must reproduce the regex chunk+punct count")

    // cut_spans: native loop == filter + exists lambda cut
    val spansDf = Dedup.repeatedSpans(docs, "doc_id", "text", 6, 2L)
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    val withSpans = docs.select(col("doc_id").as("doc"),
        TextAnalysis.words(col("text")).as("ws"))
      .join(spansDf, Seq("doc"))
    val oldCut = withSpans.select(col("doc"),
      filter(col("ws"), (_, i) =>
        !exists(col("spans"), sp =>
          i >= sp.getField("span_start") && i < sp.getField("span_end"))).as("kept"))
    val newCut = withSpans.select(col("doc"),
      graft.functions.TextFunctions.cut_spans(col("ws"), col("spans")).as("kept"))
    assert(newCut.count() > 0, "cut_spans pin needs spanned docs")
    assert(newCut.exceptAll(oldCut).isEmpty && oldCut.exceptAll(newCut).isEmpty,
      "native cut_spans must reproduce the filter+exists token cut")

    // positional_ngrams: native loop == the transform/concat_ws lambda
    val oldGrams = wsAll.select(col("doc"),
      TextAnalysis.ngramsPositional(col("ws"), 2).as("grams"))
    val newGrams = wsAll.select(col("doc"),
      graft.functions.TextFunctions.positional_ngrams(col("ws"), 2).as("grams"))
    assert(newGrams.exceptAll(oldGrams).isEmpty && oldGrams.exceptAll(newGrams).isEmpty,
      "native positional_ngrams must reproduce the lambda n-gram arrays")
  }

  test("minhash LSH finds the same high-threshold pairs as exact jaccard") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, k = 8, bands = 4, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // banding (b=4,r=2) catches ~all pairs at j>=0.9: P(miss) = (1-j^2)^4 < 2%
    assert(lsh.subsetOf(exact), "LSH must never invent pairs (verified jaccard)")
    assert(exact.nonEmpty && lsh.size >= exact.size * 9 / 10,
      s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash: deterministic, identical docs collide, near-dups close") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val s1 = Dedup.simhash(docs, "doc_id", "text", 3)
    val dup = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val two = Dedup.simhash(dup, "doc_id", "text", 3).select("simhash").as[Long].collect()
    assert(two(0) == two(1))
    // deterministic across evaluations
    val a = s1.orderBy("doc").limit(5).as[(Long, Long)].collect()
    val b = s1.orderBy("doc").limit(5).as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("shard assign: bucketed two-level cumsum == naive global cumsum") {
    // ids deliberately sparse/unordered across several width-4 buckets
    val rows = Seq(3L -> 10L, 1L -> 5L, 9L -> 7L, 4L -> 20L, 17L -> 1L,
      12L -> 13L, 5L -> 2L, 21L -> 8L)
    val df = rows.toDF("doc_id", "w")
    val got = Sharding.shardAssign(df, "doc_id", col("w"),
      shardBudget = 15L, bucketWidth = 4L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    var cum = 0L
    val want = rows.sortBy(_._1).map { case (id, w) =>
      val before = cum; cum += w
      (id, w, cum, before / 15L)
    }
    assert(got.toSeq == want)
  }

  test("canonical docs: best-quality copy kept per cluster, singletons kept") {
    val docs = Seq(
      (1L, "short"), (2L, "a much longer and better document body here"),
      (3L, "lonely")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val kept = Dedup.canonicalDocs(docs, "doc_id", pairs,
      TextAnalysis.bpeishTokenCount(col("text")))
      .orderBy("doc_id").collect()
    // cluster {1,2}: doc 2 has the higher token score and wins despite id 2
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 3L))
    assert(kept(0).getAs[Long]("cluster_id") == 1L)
    assert(kept(0).getAs[Long]("cluster_size") == 2L)
    assert(kept(1).getAs[Long]("cluster_size") == 1L)
  }

  test("doc chunking: full coverage, overlap, partial tail, short docs") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 tokens
      (2L, "only three words"),
      (3L, (1 to 8).map(i => s"t$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(docs, "doc_id", "text",
      chunkTokens = 8, overlap = 3) // step 5
    val byDoc = chunks.collect().groupBy(_.getLong(0))
    // doc 1: starts 0,5,10 — ceil((20−8)/5)·5 = 15? no: ceil(12/5)=3 → 15
    val c1 = byDoc(1L).sortBy(_.getInt(1))
    assert(c1.map(_.getInt(2)).toSeq == Seq(0, 5, 10, 15))
    assert(c1.map(_.getInt(3)).toSeq == Seq(8, 8, 8, 5)) // partial tail kept
    // consecutive chunks overlap by exactly `overlap` tokens
    val t0 = c1(0).getString(4).split(" "); val t1 = c1(1).getString(4).split(" ")
    assert(t0.takeRight(3).toSeq == t1.take(3).toSeq)
    // every token appears in some chunk
    val covered = c1.flatMap(_.getString(4).split(" ")).toSet
    assert(covered == (1 to 20).map(i => s"w$i").toSet)
    // short doc: one chunk, whole text
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getString(4) == "only three words")
    // exact single window: one chunk, not two
    assert(byDoc(3L).length == 1 && byDoc(3L).head.getInt(3) == 8)
    intercept[IllegalArgumentException](
      TextAnalysis.chunkDocs(docs, "doc_id", "text", 8, 8))
  }

  test("per-group cap: k kept per group, deterministic, parallelism-stable") {
    val docs = (0 until 200).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    val capped = Sampling.capPerGroup(docs, "id", "g", k = 7)
    val byG = capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.values.forall(_ == 7) && byG.size == 4)
    // ranks are 1..k within each group
    assert(capped.filter(col("sample_rank") > 7 || col("sample_rank") < 1).count() == 0)
    // deterministic across partitioning
    val a = capped.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.capPerGroup(docs.repartition(13), "id", "g", k = 7)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // a different seed picks a different sample (hash order, not id order)
    val c = Sampling.capPerGroup(docs, "id", "g", k = 7, seed = "other")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a != c)
    // groups under the cap keep everything
    val small = Sampling.capPerGroup(docs.filter(col("id") < 8), "id", "g", 7)
    assert(small.count() == 8)
    intercept[IllegalArgumentException](Sampling.capPerGroup(docs, "id", "g", 0))
  }

  test("bigram LM: common text scores low entropy, OOV penalized, counts right") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      (4L, "a strange quasar pulsed weirdly")).toDF("doc_id", "text")
    val scored = LangModel.selfCrossEntropy(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_bigrams = tokens − 1 per doc
    assert(scored(1)._1 == 5 && scored(4)._1 == 4)
    // formulaic docs are predictable; the one-off doc is surprising
    assert(scored(1)._2 < scored(4)._2)
    // a doc with fewer than 2 tokens emits no row
    val tiny = Seq((9L, "one")).toDF("doc_id", "text")
    val (model, v) = LangModel.trainBigram(corpus, "text")
    assert(LangModel.crossEntropy(tiny, "doc_id", "text", model, v).count() == 0)
    // foreign doc, fully OOV: every bigram takes the c=0 smoothing path
    // and scores exactly -log2(k / (k*V)) = log2(V) bits per bigram
    val foreign = Seq((7L, "zz yy xx ww")).toDF("doc_id", "text")
    val f = LangModel.crossEntropy(foreign, "doc_id", "text", model, v)
      .head()
    assert(f.getLong(1) == 3)
    assert(math.abs(f.getDouble(2) - math.log(v.toDouble) / math.log(2)) < 1e-9)
    // partial OOV: seen context, unseen continuation — smoothed, finite,
    // and costlier than a seen continuation of the same context
    val mixed = Seq((8L, "the zzz")).toDF("doc_id", "text")
    val seen = Seq((5L, "the cat")).toDF("doc_id", "text")
    val bitsMixed = LangModel.crossEntropy(mixed, "doc_id", "text", model, v)
      .head().getDouble(2)
    val bitsSeen = LangModel.crossEntropy(seen, "doc_id", "text", model, v)
      .head().getDouble(2)
    assert(bitsMixed > bitsSeen && !bitsMixed.isInfinite)
    // broadcast hint changes the plan, not the numbers
    val b = LangModel.crossEntropy(corpus, "doc_id", "text", model, v,
      hintBroadcast = true).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.forall { case (id, (_, bits)) => math.abs(b(id) - bits) < 1e-12 })
  }

  test("ridge probe: one-pass fit recovers a linear target; lambda regularizes") {
    // y = 5 + 2·a − 3·b, noiseless → exact least squares recovers it
    val rows = (0 until 64).map { i =>
      val a = (i % 8).toDouble / 7.0
      val b = (i / 8).toDouble / 7.0
      (a, b, 5.0 + 2.0 * a - 3.0 * b)
    }
    val df = rows.toDF("a", "b", "y")
    val fts = Seq(col("a"), col("b"))
    val w = Probe.fitRidge(df, fts, col("y"), lambda = 0.0)
    assert(math.abs(w(0) - 5.0) < 1e-9 && math.abs(w(1) - 2.0) < 1e-9 &&
      math.abs(w(2) + 3.0) < 1e-9)
    // scoring reproduces the target
    val scored = df.select((Probe.score(fts, w) - col("y")).as("r"))
      .agg(max(abs(col("r")))).head.getDouble(0)
    assert(scored < 1e-9)
    // ridge shrinks the slope coefficients toward zero
    val wr = Probe.fitRidge(df, fts, col("y"), lambda = 100.0)
    assert(math.abs(wr(1)) < math.abs(w(1)) && math.abs(wr(2)) < math.abs(w(2)))
    // collinear features: exact LS is singular, any positive lambda rescues
    val dfc = rows.map { case (a, _, y) => (a, 2 * a, y) }.toDF("a", "b", "y")
    intercept[IllegalArgumentException](
      Probe.fitRidge(dfc, fts, col("y"), lambda = 0.0))
    assert(Probe.fitRidge(dfc, fts, col("y"), lambda = 1e-3).length == 3)
    // weight arity is validated
    intercept[IllegalArgumentException](Probe.score(fts, Array(1.0, 2.0)))
    // gram moments: one row, n + 6 gram + 3 moment columns for k=2
    val g = Probe.gramMoments(df, fts, col("y"))
    assert(g.columns.toSeq ==
      Seq("n", "g00", "g01", "g02", "g11", "g12", "g22", "b0", "b1", "b2"))
    val r0 = g.head
    assert(r0.getLong(0) == 64 && math.abs(r0.getDouble(1) - 64.0) < 1e-9)
  }

  test("quality filter: rule provenance in reasons, clean docs keep") {
    val df = Seq(
      (1L, "a solid natural sentence with plenty of distinct meaningful words here"),
      (2L, "hi"),                                       // too_short
      (3L, ("repeat " * 100).trim),                     // dup_words + compressible
      (4L, "reach me at a@b.example and c@d.example or e@f.example ok") // pii_dense
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        r.getSeq[String](r.fieldIndex("reasons")).toSet))
    assert(got(0) == ((1L, true, Set.empty[String])))
    assert(got(1) == ((2L, false, Set("too_short"))))
    assert(!got(2)._2 && got(2)._3.contains("dup_words") &&
      got(2)._3.contains("compressible"))
    assert(got(3) == ((4L, false, Set("pii_dense"))))
  }

  test("compression ratio: repetitive text low, high-entropy text high") {
    val rnd = new scala.util.Random(7)
    val df = Seq(
      (1L, "spam " * 200),                                  // pure repetition
      (2L, Seq.fill(200)(rnd.alphanumeric.take(8).mkString).mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.compressionRatio(col("text")).as("cr"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.1, s"repetition must compress hard: ${got(1L)}")
    assert(got(2L) > 0.5, s"entropy must resist compression: ${got(2L)}")
    assert(got(3L) == 1.0)
    // deterministic across evaluations (same zlib level, same bytes)
    val again = df.select(TextAnalysis.compressionRatio(col("text")))
      .as[Double].collect().sorted
    assert(again.sameElements(got.values.toArray.sorted))
  }

  test("tfidf top terms: rare terms outrank common ones, ties break on term") {
    val df = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared shared"),
      (3L, "shared date")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", nDocs = 3, k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term").as[(Long, Int, String)].collect()
    // doc 1: apple tf=2 df=1 (score 6) > banana tf=1 df=1 (3) > shared (1)
    assert(top.filter(_._1 == 1L).map(_._3).toSeq == Seq("apple", "banana"))
    // doc 2: shared tf=2 df=3 (2) vs cherry tf=1 df=1 (3) -> cherry first
    assert(top.filter(_._1 == 2L).map(_._3).toSeq == Seq("cherry", "shared"))
    // doc 3: date (3) > shared (1)
    assert(top.filter(_._1 == 3L).map(_._3).toSeq == Seq("date", "shared"))
  }

  test("ngram top-k counts positional duplicates and ranks deterministically") {
    val df = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val top = TextAnalysis.ngramTopK(df, "doc_id", "text", n = 2, k = 3)
      .as[(String, Long, Long)].collect()
    // "a b" occurs 3x (twice in doc 1 — positional, not distinct) in 2 docs
    assert(top(0) == (("a b", 3L, 2L)))
    // remaining bigrams all tf=1 → ordered by ngram asc
    assert(top.drop(1).map(_._1).toSeq == top.drop(1).map(_._1).toSeq.sorted)
  }

  test("incremental dedup: exact/near/new verdicts against existing only") {
    val existing = Seq(
      (2L, "a b c d e f"), (4L, "m n o p q r")).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "A  b c d e f"),        // exact dup of 2 (normalized)
      (13L, "a b c d e f g"),       // near dup of 2 (jaccard 4/5 = 0.8)
      (15L, "totally different words here now"), // new
      (17L, "totally different words here now")  // dup of 15 but NOT of existing -> new
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 3, k = 8, bands = 4, threshold = 0.8)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
        Option(r.getAs[Any]("dup_of"))))
    assert(got(0) == ((11L, "exact_dup", Some(2L))))
    assert(got(1) == ((13L, "near_dup", Some(2L))))
    assert(got(2) == ((15L, "new", None)))
    assert(got(3) == ((17L, "new", None)),
      "a dup within the incoming batch only must stay 'new'")
  }

  test("indexed incremental dedup == direct, and the index is appendable") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft_dedupidx").toString
    try {
      Dedup.writeDedupIndex(existing, "doc_id", "text", n = 3, k = 8, bands = 4, idx)
      val direct = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
        n = 3, k = 8, bands = 4, threshold = 0.8)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val indexed = Dedup.incrementalDedupIndexed(spark, idx, incoming,
        "doc_id", "text", n = 3, k = 8, bands = 4, threshold = 0.8)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(indexed == direct,
        "index-backed verdicts must equal recomputation from raw text")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
  }

  test("dedup index compaction: appends fold to one base batch, verdicts identical") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val base = docs.filter(col("doc_id") % 3 === 0)
    val inc1 = docs.filter(col("doc_id") % 3 === 1)
    val inc2 = docs.filter(col("doc_id") % 3 === 2 && col("doc_id") < 300)
    val probe = docs.filter(col("doc_id") % 3 === 2 && col("doc_id") >= 300)
    val idx = java.nio.file.Files.createTempDirectory("graft_dedupcmp").toString
    def batchDirs(t: String): Seq[String] =
      new java.io.File(s"$idx/$t").listFiles().toSeq
        .filter(_.getName.startsWith("batch=")).map(_.getName)
    def fileCount(t: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$idx/$t"))
    }
    try {
      Dedup.writeDedupIndex(base, "doc_id", "text", n = 3, k = 8, bands = 4, idx)
      Dedup.appendDedupIndex(inc1, "doc_id", "text", 3, 8, 4, idx, "b1")
      Dedup.appendDedupIndex(inc2, "doc_id", "text", 3, 8, 4, idx, "b2")
      assert(batchDirs("fps").toSet == Set("batch=base", "batch=b1", "batch=b2"))
      val before = Dedup.incrementalDedupIndexed(spark, idx, probe,
        "doc_id", "text", 3, 8, 4, 0.8).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      val filesBefore = fileCount("bands")

      Dedup.compactDedupIndex(spark, idx)
      for (t <- Seq("fps", "bands", "shingles"))
        assert(batchDirs(t) == Seq("batch=base"), s"$t must fold to one batch")
      assert(fileCount("bands") < filesBefore, "compaction must reduce file count")
      val after = Dedup.incrementalDedupIndexed(spark, idx, probe,
        "doc_id", "text", 3, 8, 4, 0.8).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(after == before, "verdicts must not change across compaction")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
  }

  test("shard writer: partitioned dirs, budget respected, content round-trips") {
    val df = (0 until 40).map(i => (i.toLong, s"doc $i " + ("tok " * (i % 7 + 1)).trim))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Sharding.writeShards(df, "doc_id", TextAnalysis.bpeishTokenCount(col("text")),
        shardBudget = 30L, outDir = out, bucketWidth = 8L)
      // partition-type inference may be off (TsdbEngine pins it for date=
      // dirs), so the shard= partition column can surface as string
      val back = spark.read.parquet(out).withColumn("shard", col("shard").cast("long"))
      assert(back.count() == 40)
      assert(back.columns.toSet == Set("doc_id", "text", "shard"))
      val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
      assert(dirs.length > 1, "multiple shard directories expected")
      // every shard except possibly the last stays within budget + one doc
      val w = TextAnalysis.bpeishTokenCount(col("text"))
      val perShard = back.groupBy("shard").agg(sum(w).as("tok"))
        .orderBy("shard").as[(Long, Long)].collect()
      val maxDoc = df.select(max(TextAnalysis.bpeishTokenCount(col("text"))))
        .as[Long].head()
      perShard.dropRight(1).foreach { case (sid, tok) =>
        assert(tok <= 30L + maxDoc, s"shard $sid over budget: $tok") }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("kmeans assign: deterministic, exact copies co-cluster, labels = argmax") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = Clustering.kmeansAssign(spark, vecs, "id", "vec", nlist = 4, iters = 1)
      .orderBy("id").as[(Long, Int, Long)].collect()
    val b = Clustering.kmeansAssign(spark, vecs, "id", "vec", nlist = 4, iters = 1)
      .orderBy("id").as[(Long, Int, Long)].collect()
    assert(a.sameElements(b), "integer k-means must be bit-deterministic")
    assert(a.length == vecs.count() && a.map(_._2).distinct.length >= 2)
    // a duplicated vector must land in the same cluster as its twin
    val dup = vecs.limit(1).select((col("id") + 100000L).as("id"), col("vec"))
    val withDup = Clustering.kmeansAssign(spark, vecs.union(dup), "id", "vec",
      nlist = 4, iters = 1).orderBy("id").as[(Long, Int, Long)].collect()
    val first = withDup.find(_._1 == a.head._1).get
    val twin = withDup.find(_._1 == a.head._1 + 100000L).get
    assert(first._2 == twin._2 && first._3 == twin._3)
  }

  test("int8 quantize: exact summaries, bounds respected, zero vector null") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8Quantize(df, "vec_id", "embedding")
      .orderBy("id").collect()
    // vec 1: scale = 127, q = (64, -127, 32) -> l1 = 223, l2sq = 134-ish
    assert(rows(0).getAs[Long]("scale_e9") == 127000000000L)
    assert(rows(0).getAs[Long]("q_l1") == 64 + 127 + 32)
    assert(rows(0).getAs[Long]("q_l2sq") == 64L * 64 + 127L * 127 + 32L * 32)
    assert(rows(1).isNullAt(rows(1).fieldIndex("scale_e9")))
  }

  test("LSH ANN reaches >=60% of brute-force top-10 (8 tables x 4 bits)") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = vecs.filter(col("id") < 10)
    val brute = Similarity.bruteTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(q, vecs, 10, tables = 8, bits = 4, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("cosine: orthogonal 0, identical 1, zero vector null-safe") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f), 4L, Array(1.0f, 1.0f)),
      (5L, Array(0.0f, 0.0f), 6L, Array(1.0f, 0.0f)))
      .toDF("ida", "va", "idb", "vb")
    val got = df.select(Similarity.cosine(col("va"), col("vb")).as("c"))
      .as[Option[Double]].collect()
    assert(got(0).get == 0.0)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(got(2).isEmpty) // zero vector → null, not a crash
  }

  test("multimodal: partition-parallel feature extraction over binary") {
    val media = Seq(
      Multimodal.MediaRow(1L, Array[Byte](0, 0, 0, 0), "image/png", 2, 2),
      Multimodal.MediaRow(2L, Array.fill[Byte](256)(-1), "image/png", 16, 16),
      Multimodal.MediaRow(3L, null, "audio/wav", 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats(0).brightness == 0.0 && feats(0).n_bytes == 4)
    assert(math.abs(feats(1).brightness - 1.0) < 1e-12 && feats(1).frames_sampled == 4)
    assert(feats(2).n_bytes == 0L)
  }

  test("multimodal: real JDK decode — PNG dims/luminance, WAV duration/RMS, opaque fallback") {
    // a real 8×4 PNG: left half white, right half black → mean luma 0.5
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xffffff else 0x000000)
    val pngBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngBos)
    val png = pngBos.toByteArray

    // a real WAV: 8000 frames @ 8kHz mono 16-bit of a full-scale square
    // wave → duration 1000 ms, RMS ~1.0
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](8000 * 2)
    for (i <- 0 until 8000) {
      val s: Short = if (i % 2 == 0) 32767 else -32767
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val wavBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 8000L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavBos)
    val wav = wavBos.toByteArray

    val media = Seq(
      Multimodal.MediaRow(1L, png, "image/png", 8, 4),
      Multimodal.MediaRow(2L, wav, "audio/wav", 0, 0),
      Multimodal.MediaRow(3L, Array.fill[Byte](64)(42), "video/mp4", 0, 0)).toDS()
    val d = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)

    assert(d(0).kind == "image" && d(0).width == 8 && d(0).height == 4)
    assert(math.abs(d(0).brightness - 0.5) < 0.01)
    assert(d(1).kind == "audio" && d(1).duration_ms == 1000L &&
      d(1).sample_rate == 8000 && d(1).channels == 1)
    assert(math.abs(d(1).rms - 1.0) < 0.01)
    assert(d(2).kind == "opaque") // no JDK video codec — byte-stat fallback

    // resize: 8×4 fit into 4 → 4×2, still a decodable PNG
    val resized = Multimodal.resizeImage(png, 4).get
    val (w2, h2, _) = Multimodal.decodeImage(resized).get
    assert(w2 == 4 && h2 == 2)
  }

  test("lang id + quality score are deterministic and bounded") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val q = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).as[(Double, Double)].head()
    assert(q._1 >= 0.0 && q._2 <= 1.0)
    val langs = docs.select(TextAnalysis.langId(col("text")).as("l"))
      .distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("IVF ANN with k-means centroids: recall >= 80% (16 lists, probe 6)") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = vecs.filter(col("id") < 10)
    val brute = Similarity.bruteTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, vecs, 10, nlist = 16, nprobe = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    assert(ivf.size <= brute.size) // never more than k per query
  }

  test("auto-nlist: tracks corpus size with clamps; auto IVF paths hold recall") {
    // the enforced contract: nlist ≈ √n in [16, 65536]
    assert(Similarity.autoNlist(1) == 16 && Similarity.autoNlist(256) == 16)
    assert(Similarity.autoNlist(10000) == 100)
    assert(Similarity.autoNlist(1000000) == 1000)
    assert(Similarity.autoNlist(Long.MaxValue) == 65536)
    assert(Similarity.autoNlist(100000) > Similarity.autoNlist(10000))

    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    // sampled coarse quantizer (the large-nlist fit): deterministic,
    // unit-norm, exactly nlist rows
    val sc = Similarity.sampledCentroids(vecs, 96)
    assert(sc.length == 96)
    assert(sc.forall(c => math.abs(c.map(x => x * x).sum - 1.0) < 1e-9))
    val sc2 = Similarity.sampledCentroids(vecs, 96)
    assert(sc.map(_.toSeq).toSeq == sc2.map(_.toSeq).toSeq)

    // near-dup pairs with NO nlist given, on a corpus big enough that the
    // auto fit crosses into the SAMPLED coarse quantizer (n ≈ 4580 →
    // nlist ≈ 68 > the k-means budget): planted high-similarity dups
    // among noise — the workload the blocking exists for (testdata's own
    // ≥0.45 pairs are coincidental ~62° pairs with no locality, per the
    // pinned-nlist test below)
    val rnd = new scala.util.Random(11)
    def unit(dim: Int) = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
    val planted = (0 until 40).map(i => (i.toLong, unit(64)))
    val dups = planted.map { case (i, v) => (i + 10000L, perturb(v)) }
    val noise = (0 until 4500).map(i => (i + 20000L, unit(64)))
    val df = (planted ++ dups ++ noise).toDF("id", "vec")
    val truth = Similarity.cosinePairs(df, 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 30, s"perturbation too strong: ${truth.size}")
    val auto = Similarity.cosinePairsIvf(df, 0.85) // nlist unset → auto
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(truth), "IVF must never invent pairs")
    val pairRecall = (auto & truth).size.toDouble / truth.size
    assert(pairRecall >= 0.85, s"auto-nlist planted-dup recall $pairRecall")

    // top-k with NO nlist given: recall vs brute force
    val q = vecs.filter(col("id") < 10)
    val brute = Similarity.bruteTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, vecs, 10, nlist = 0, nprobe = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"auto-nlist top-k recall $recall")
  }

  test("IVF-PQ: codebook vectors encode to themselves; ADC recall holds") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = Similarity.firstKsCodebooks(vecs, m = 8, ks = 16)
    assert(cb.length == 8 && cb(0).length == 16 && cb(0)(0).length == 8)
    // a vector that IS codeword c in every subspace must encode to c
    // (its own squared distance is exactly 0; ties impossible below)
    val selfCodes = Similarity.pqEncode(vecs.filter(col("id") < 16), 8, 16, Some(cb))
      .as[(Long, Seq[Int])].collect()
    selfCodes.foreach { case (id, codes) =>
      assert(codes.forall(_ == id.toInt), s"vec $id -> $codes") }
    // ADC ranking over PQ codes must beat chance clearly. This testdata
    // is the PQ worst case — i.i.d. gaussian dims have no subspace
    // structure to quantize — so the bar is chance-relative: picking 10
    // of the 49 non-self vectors at random recalls 10/49 ≈ 0.20;
    // measured ADC recall is 0.32 (deterministic: pinned codebooks,
    // pinned data). Clustered real-world embeddings quantize far better.
    val q = vecs.filter(col("id") < 10)
    val brute = Similarity.bruteTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(q, vecs, 10, m = 8, ks = 16,
      nlist = 16, nprobe = 6, codebooks = Some(cb))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.3, s"PQ recall $recall (chance ≈ 0.20)")
    assert(pq.size <= brute.size)
  }

  test("trained PQ codebooks reconstruct better than sliced-vector ones") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val raw = vecs.orderBy("id").select("vec").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val (m, ks, sub) = (8, 16, 8)
    def mse(cb: Array[Array[Array[Double]]]): Double = {
      var total = 0.0
      for (v <- raw; j <- 0 until m) {
        val s = v.slice(j * sub, (j + 1) * sub)
        total += cb(j).map(c =>
          s.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }
      total / raw.length
    }
    val naive = mse(Similarity.firstKsCodebooks(vecs, m, ks))
    val trained = mse(Similarity.trainedCodebooks(vecs, m, ks))
    // Lloyd iterations minimize exactly this objective — must not lose
    assert(trained < naive, s"trained $trained vs firstKs $naive")
  }

  test("ANN index: materialized IVF-PQ serves identical ranks, pruned scan") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = Similarity.firstKsCodebooks(vecs, m = 8, ks = 16)
    val cents = Similarity.firstNCentroids(vecs, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann").toString
    Similarity.writeAnnIndex(vecs, dir, m = 8, ks = 16, nlist = 16,
      codebooks = Some(cb), centroids = Some(cents))
    val q = vecs.filter(col("id") < 5)
    val direct = Similarity.pqTopK(q, vecs, 10, m = 8, ks = 16,
      nlist = 16, nprobe = 6, codebooks = Some(cb), centroids = Some(cents))
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet
    val viaIndex = Similarity.pqTopKIndexed(spark, dir, q, k = 10, nprobe = 6)
    val got = viaIndex.select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == direct, "indexed ranks must equal the in-memory operator")
    // probed cells become a partition-pruned scan of cells/cid=…
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"cid partition pruning missing:\n$plan")
  }

  test("curate: lineage attributes every doc to its dropping stage, in order") {
    val base = "the quick brown fox jumps over a lazy dog of great renown and style"
    val docs = Seq(
      (1L, base),                                       // kept (canonical)
      (2L, base.toUpperCase + "  "),                    // exact dup of 1 (normalizes equal)
      (3L, base.replace("style", "the")),               // near dup of 1, lower uniq → 1 wins
      (4L, "der hund und die katze und das haus und der baum und das"), // lang=de
      (5L, "spam spam spam spam spam spam spam spam spam spam spam"),   // junk → quality
      (6L, "students often memorize the secret benchmark answer key verbatim and the " +
        "grader of this corpus will notice that pattern"),              // hits eval set
      (7L, "a completely different story about ships and storms and the open sea of stars")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the secret benchmark answer key verbatim appears here"))
      .toDF("doc_id", "text")
    val lineage = Curate.curate(docs, "doc_id", "text",
      allowedLangs = Set("en"), minQualityE4 = 2000L,
      evalDocs = Some(eval), evalN = 5, evalMinHits = 1L)
      .select($"doc_id", $"drop_reason", $"dup_of")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lineage(1L) == ((None, None)))
    assert(lineage(2L) == ((Some("exact_dup"), Some(1L))))
    assert(lineage(3L) == ((Some("near_dup"), Some(1L))))
    assert(lineage(4L)._1 == Some("lang"))
    assert(lineage(5L)._1 == Some("quality"))
    assert(lineage(6L)._1 == Some("contaminated"))
    assert(lineage(7L) == ((None, None)))
    val counts = Curate.stageCounts(Curate.curate(docs, "doc_id", "text",
      allowedLangs = Set("en"), minQualityE4 = 2000L,
      evalDocs = Some(eval), evalN = 5, evalMinHits = 1L))
      .as[(String, Long)].collect().toMap
    assert(counts("kept") == 2L && counts("exact_dup") == 1L &&
      counts("near_dup") == 1L, counts.toString)
  }

  test("curate: full lineage over the real documents table") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val lineage = Curate.curate(docs, "doc_id", "text",
      allowedLangs = Set("en", "de", "es", "fr", "zh"), minQualityE4 = 1000L)
    val n = lineage.count()
    assert(n == docs.count(), "one lineage row per input doc")
    val counts = Curate.stageCounts(lineage).as[(String, Long)].collect().toMap
    assert(counts.getOrElse("kept", 0L) > 0L, counts.toString)
    assert(counts.values.sum == n)
  }

  test("ANN index append: increment under the frozen quantizer == full rebuild") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = Similarity.firstKsCodebooks(vecs, m = 8, ks = 16)
    val cents = Similarity.firstNCentroids(vecs, 16)
    val (oldPart, newPart) = (vecs.filter(col("id") % 3 =!= 0), vecs.filter(col("id") % 3 === 0))
    val grown = java.nio.file.Files.createTempDirectory("graft_ann_g").toString
    Similarity.writeAnnIndex(oldPart, grown, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    Similarity.appendAnnIndex(newPart, grown)
    val full = java.nio.file.Files.createTempDirectory("graft_ann_f").toString
    Similarity.writeAnnIndex(vecs, full, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    val q = vecs.filter(col("id") < 5)
    def ranks(path: String) = Similarity.pqTopKIndexed(spark, path, q, 10, 6)
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(ranks(grown) == ranks(full),
      "incrementally grown index must answer like a full rebuild")
  }

  test("ANN index compaction: append files fold to one per cell, rows identical") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = Similarity.firstKsCodebooks(vecs, m = 8, ks = 16)
    val cents = Similarity.firstNCentroids(vecs, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_c").toString
    Similarity.writeAnnIndex(vecs.filter(col("id") % 3 === 0), dir, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    Similarity.appendAnnIndex(vecs.filter(col("id") % 3 === 1), dir)
    Similarity.appendAnnIndex(vecs.filter(col("id") % 3 === 2), dir)
    def filesPerCell: Map[String, Int] = {
      val root = java.nio.file.Paths.get(
        Similarity.resolveIndexDir(spark, dir), "cells")
      import scala.collection.JavaConverters._
      java.nio.file.Files.list(root).iterator().asScala
        .filter(_.getFileName.toString.startsWith("cid="))
        .map(d => d.getFileName.toString ->
          java.nio.file.Files.list(d).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet")))
        .toMap
    }
    val q = vecs.filter(col("id") < 5)
    def ranks = Similarity.pqTopKIndexed(spark, dir, q, 10, 6)
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet
    val before = ranks
    assert(filesPerCell.values.exists(_ > 1),
      "appends must have accumulated multiple file sets (precondition)")
    Similarity.compactAnnIndex(spark, dir)
    assert(filesPerCell.values.forall(_ == 1), filesPerCell.toString)
    assert(ranks == before, "compaction must not change any answer")
    // marker untouched: appends under the frozen quantizer still work
    Similarity.appendAnnIndex(vecs.filter(col("id") === 1L)
      .select(col("id") + 100000L as "id", col("vec")), dir)
    assert(Similarity.pqTopKIndexed(spark, dir, q, 10, 6).count() > 0)
  }

  test("ANN index drift maintenance: gauges report, the rebuild trigger " +
      "fires on a crossed bound and retrains, a healthy index is a no-op") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = vecs.filter(col("id") % 2 === 0)
    // orthant-folded drift (ProbeAnnDrift's model): structure-preserving,
    // concentrated where the trained quantizer has no resolution
    val b = vecs.filter(col("id") % 2 === 1)
      .select((col("id") + lit(10000000L)).as("id"),
        transform(col("vec"), x => abs(x)).as("vec"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_d").toString
    Similarity.writeAnnIndex(a, dir, m = 8, ks = 16, nlist = 16,
      codebooks = Some(Similarity.trainedCodebooks(a, 8, 16)),
      centroids = Some(Similarity.kmeansCentroids(a, 16)))
    // build-time marker distortion makes the ratio ≈1 for training data
    val selfRatio = Similarity.annIndexDistortionRatio(a, dir)
    assert(selfRatio > 0.5 && selfRatio < 1.5,
      s"training-data distortion ratio must sit near 1, got $selfRatio")
    assert(Similarity.annIndexCellSkew(spark, dir) < 4.0,
      "a trained build must start balanced")
    // healthy index: every gauge under its bound → no-op
    assert(!Similarity.maybeRebuildAnnIndex(a, dir, increment = Some(a)),
      "a healthy index must not rebuild")
    Similarity.appendAnnIndex(b, dir)
    val union = a.unionByName(b)
    val audit = Similarity.annIndexRecallAudit(union, dir, 10, 6)
    assert(audit >= 0.0 && audit <= 1.0)
    // a recall floor above the measured audit fires the trigger
    assert(Similarity.maybeRebuildAnnIndex(union, dir,
      minRecall = Some(math.min(0.99, audit + 0.01)), auditNprobe = 6),
      "a crossed recall floor must trigger the retrain-rebuild")
    // the rebuilt index serves the standard shape
    val q = a.filter(col("id") < 10)
    assert(Similarity.pqTopKIndexed(spark, dir, q, 10, 6).count() > 0)
  }

  test("versioned ANN index root: rebuilds flip atomically, in-flight " +
      "readers keep a consistent pair, old versions GC to one, flat " +
      "legacy roots keep their layout") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = Similarity.firstKsCodebooks(vecs, 8, 16)
    val cents = Similarity.firstNCentroids(vecs, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_v").toString
    val q = vecs.filter(col("id") < 5)
    Similarity.writeAnnIndex(vecs, dir, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    assert(Similarity.resolveIndexDir(spark, dir).endsWith("v00001"),
      "a fresh root must be versioned")
    val answers = Similarity.pqTopKIndexed(spark, dir, q, 10, 6)
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet
    // an in-flight reader: its plan resolved v00001 BEFORE the rebuild
    val pinned = Similarity.pqTopKIndexed(spark, dir, q, 10, 6)
    Similarity.writeAnnIndex(vecs, dir, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents)) // rebuild → v00002
    assert(Similarity.resolveIndexDir(spark, dir).endsWith("v00002"))
    assert(pinned.select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet == answers,
      "the superseded version must survive ONE rebuild for in-flight readers")
    // answers through the flipped pointer are identical (same quantizer)
    assert(Similarity.pqTopKIndexed(spark, dir, q, 10, 6)
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet == answers)
    // a second rebuild GCs v00001, retains v00002
    Similarity.writeAnnIndex(vecs, dir, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents)) // → v00003
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "v00001")),
      "versions older than the superseded one must be GC'd")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "v00002")))
    // appends land inside the CURRENT version dir
    Similarity.appendAnnIndex(vecs.filter(col("id") === 1L)
      .select(col("id") + 100000L as "id", col("vec")), dir)
    assert(Similarity.pqTopKIndexed(spark, dir, q, 10, 6).count() > 0)
    // flat legacy layout (pre-r16): marker at the root — reads fine and
    // a rebuild stays IN PLACE (no version dirs appear)
    val legacy = java.nio.file.Files.createTempDirectory("graft_ann_l").toString
    Similarity.writeAnnIndex(vecs, legacy, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    val v1 = java.nio.file.Paths.get(legacy, "v00001")
    java.nio.file.Files.move(v1.resolve("_index.json"),
      java.nio.file.Paths.get(legacy, "_index.json"))
    java.nio.file.Files.move(v1.resolve("cells"),
      java.nio.file.Paths.get(legacy, "cells"))
    // the hadoop local FS leaves checksum (.crc) siblings in the dir
    org.apache.commons.io.FileUtils.deleteDirectory(v1.toFile)
    java.nio.file.Files.delete(java.nio.file.Paths.get(legacy, "_current"))
    assert(Similarity.resolveIndexDir(spark, legacy) == legacy)
    assert(Similarity.pqTopKIndexed(spark, legacy, q, 10, 6)
      .select("query_id", "rank", "neighbor_id", "adc_e4")
      .as[(Long, Int, Long, Long)].collect().toSet == answers)
    Similarity.writeAnnIndex(vecs, legacy, 8, 16, 16,
      codebooks = Some(cb), centroids = Some(cents))
    assert(Similarity.resolveIndexDir(spark, legacy) == legacy,
      "a flat legacy root must rebuild in place, not sprout versions")
  }

  test("IVF near-dup: no invented pairs; planted duplicates found") {
    // testdata pairs at >=0.45 are coincidental (cosines 0.45-0.48, ~62°)
    // — no blocking scheme has locality there; verification correctness
    // is what matters on that data
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.cosinePairs(vecs, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ivf = Similarity.cosinePairsIvf(vecs, 0.45, nlist = 16, replicate = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ivf.subsetOf(exact), "verification must kill false candidates")

    // the real near-dup workload: planted high-similarity duplicates —
    // base vectors plus small perturbations (cosine ~0.95) among noise
    val rnd = new scala.util.Random(7)
    def unit(dim: Int) = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
    val planted = (0 until 40).map(i => (i.toLong, unit(64)))
    val dups = planted.map { case (i, v) => (i + 1000L, perturb(v)) }
    val noise = (0 until 400).map(i => (i + 2000L, unit(64)))
    val df = (planted ++ dups ++ noise).toDF("id", "vec")
    val found = Similarity.cosinePairsIvf(df, 0.85, nlist = 16, replicate = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truth = Similarity.cosinePairs(df, 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 30, s"perturbation too strong: ${truth.size}")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"planted-dup recall $recall")

    // k-means is the quality default: at equal nlist it must recall at
    // least as much as the naive first-N centroid choice (this pins the
    // reason it IS the default, and catches a silent k-means regression)
    val foundFirstN = Similarity.cosinePairsIvf(df, 0.85, nlist = 16,
        replicate = 2, centroids = Some(Similarity.firstNCentroids(df, 16)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recallFirstN = (foundFirstN & truth).size.toDouble / truth.size
    assert(recall >= recallFirstN,
      s"k-means recall $recall below first-N recall $recallFirstN")
    assert(recallFirstN >= 0.9, s"first-N planted-dup recall $recallFirstN")
  }

  test("bucketed near-dup pairs == exact cross-join pairs at the battery threshold") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.cosinePairs(vecs, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.cosinePairsBucketed(vecs, 0.45, dim = 64)
    val got = bucketed.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == exact, s"missed ${exact -- got}, invented ${got -- exact}")
    // the scale property: candidates meet through bucket-equality joins,
    // never a cartesian product
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "bucketed path must not plan an all-pairs join")
  }

  test("threshold router: IVF branch below the route point, selective sign-LSH above") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // below the route point the router must take IVF cell blocking —
    // row-identical to calling cosinePairsIvf with the same pinned centroids
    val pinned = Some(Similarity.firstNCentroids(vecs, 16))
    val low = Similarity.cosinePairsAuto(vecs, 0.45, dim = 64, nlist = 16,
      replicate = 3, centroids = pinned)
    val ivf = Similarity.cosinePairsIvf(vecs, 0.45, nlist = 16,
      replicate = 3, centroids = pinned)
    assert(low.select("id_a", "id_b").as[(Long, Long)].collect().toSet ==
      ivf.select("id_a", "id_b").as[(Long, Long)].collect().toSet)
    // at/above the route point: selective 8-bit sign-LSH tables. Planted
    // near-identical duplicates (cosine ~0.95) among noise — the workload
    // where the high branch must recall essentially everything while its
    // candidate volume stays ~n²/21 instead of the 2-bit tables' ~3n².
    val rnd = new scala.util.Random(11)
    def unit(dim: Int) = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + 0.1f * rnd.nextGaussian().toFloat)
    val planted = (0 until 50).map(i => (i.toLong, unit(64)))
    val dups = planted.map { case (i, v) => (i + 1000L, perturb(v)) }
    val noise = (0 until 400).map(i => (i + 2000L, unit(64)))
    val df = (planted ++ dups ++ noise).toDF("id", "vec")
    val hi = Similarity.cosinePairsAuto(df, 0.9, dim = 64, nlist = 16)
    val got = hi.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truth = Similarity.cosinePairs(df, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 40, s"perturbation too strong: ${truth.size}")
    assert(got.subsetOf(truth), "exact verification must kill false candidates")
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.99, s"high-branch recall $recall")
    // neither routed plan may fall back to an all-pairs join
    Seq(low, hi).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        "routed path must not plan an all-pairs join")
    }
  }

  test("simhash pairs: band blocking == all-pairs hamming at radius 3") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val sk = Dedup.simhash(docs, "doc_id", "text", 3)
    val exact = sk.as("x").join(sk.as("y"), col("x.doc") < col("y.doc"))
      .filter(Dedup.hamming(col("x.simhash"), col("y.simhash")) <= 3)
      .select(col("x.doc"), col("y.doc")).as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", 3, maxHamming = 3)
    val got = banded.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == exact, s"missed ${exact -- got}, invented ${got -- exact}")
    assert(got.nonEmpty, "testdata should contain hamming<=3 pairs")
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "band blocking must not plan an all-pairs join")
  }

  test("repeated spans: overlapping dup grams merge, distant runs stay split") {
    val df = Seq(
      (1L, "p q r a b c d e u v w"),   // shared run "a b c d e" at tokens 3..7
      (2L, "a b c d e m n o"),         // same run at tokens 0..4
      (3L, "k1 k2 k3 k4 k5 k6"),       // all-unique: no spans
      (4L, "a b c x1 x2 x3 x4 x5 c d e")) // two shared runs, gap > n
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 8L, 5L),   // grams at 3,4,5 merge into [3, 8)
      (2L, 0L, 5L, 5L),
      (4L, 0L, 3L, 3L),   // "a b c" alone
      (4L, 8L, 11L, 3L))) // "c d e" alone; gap 8 > n keeps spans apart
  }

  test("exact-substring cut removes exactly the repeated spans, token-aligned") {
    val df = Seq(
      (1L, "p q r a b c d e u v w"),   // span [3, 8) → keep p q r u v w
      (2L, "a b c d e m n o"),         // span [0, 5) → keep m n o
      (3L, "k1 k2 k3 k4 k5 k6"),       // no spans → untouched
      (4L, "a b c x1 x2 x3 x4 x5 c d e")) // spans [0,3) + [8,11) → keep middle
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringCut(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def md5s(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got(1L) == (6L, 5L, md5s("p q r u v w")))
    assert(got(2L) == (3L, 5L, md5s("m n o")))
    assert(got(3L) == (6L, 0L, md5s("k1 k2 k3 k4 k5 k6")))
    assert(got(4L) == (5L, 6L, md5s("x1 x2 x3 x4 x5")))
  }

  test("connected components: chain merges, singleton survives, min label wins") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("node")
    // path 1-2-3-4 (diameter 3 forces >1 propagation round) + edge 5-9
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 5L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 9L -> 5L))
  }

  test("dup clusters: exact copies cluster under min id with sizes") {
    val df = Seq(
      (10L, "a b c d e f g h"), (11L, "a b c d e f g h"),
      (12L, "a b c d e f g h"), (20L, "x y z w q r s t"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.8)
    val out = Dedup.dupClusters(df, "doc_id", pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L), (20L, 20L, 1L)))
  }

  test("dataset split: deterministic, partition-invariant, ~80/10/10") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val s1 = Sampling.datasetSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = Sampling.datasetSplit(docs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2, "split assignment must not depend on partitioning")
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03)
  }

  test("winnowing: shared run of w+n-1 words guarantees a shared fingerprint") {
    // w=4, n=3 → any shared 6-word run must share a selected fingerprint
    val run = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $run three four five six seven"),
      (2L, s"nine ten eleven twelve $run thirteen"),
      (3L, "completely different words with no common run at all here"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", n = 3, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must surface a shared fp")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    // short docs: < n words → no sketch row; n..w-1 shingle hashes → global min
    val short = Seq((9L, "just two"), (10L, "exactly three words here")).toDF("doc_id", "text")
    val sfp = Dedup.winnowFingerprints(short, "doc_id", "text", 3, 4)
      .as[(Long, Long)].collect()
    assert(!sfp.exists(_._1 == 9L) && sfp.count(_._1 == 10L) == 1)
  }

  test("winnow overlap pairs: df-capped, counts shared fingerprints") {
    val boiler = "standard legal disclaimer text applies to everything always"
    val df = Seq(
      (1L, s"unique alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"other unique alpha beta gamma delta epsilon zeta eta iota"),
      (3L, boiler), (4L, boiler), (5L, boiler))
      .toDF("doc_id", "text")
    // maxDf=2 drops the boilerplate fps (df=3); docs 1-2 share a long run
    val pairs = Dedup.winnowOverlapPairs(df, "doc_id", "text", 3, 4,
      minShared = 1L, maxDf = 2L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "overlapping docs must pair")
    assert(!pairs.exists(p => p._1 >= 3L), "df-capped boilerplate must not pair")
  }

  test("decontamination flags train docs sharing eval n-grams, broadcasts eval") {
    val leak = "the quick brown fox jumps over the lazy dog today"
    val train = Seq(
      (1L, s"prefix words here $leak suffix words here"),
      (2L, "totally clean document with nothing shared at all in it okay"))
      .toDF("doc_id", "text")
    val evalDf = Seq((100L, s"benchmark question says $leak as its answer"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contamination(train, evalDf, "doc_id", "text",
      n = 5, minHits = 3L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval probe must broadcast:\n$plan")
    val byDoc = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byDoc.contains(1L) && !byDoc.contains(2L))
    // a 10-word leak has 6 positional 5-grams, all distinct here
    assert(byDoc(1L) == ((6L, 1L)), s"got ${byDoc(1L)}")
  }

  test("repetition stats: duplicate-word and top-bigram fractions") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // 4 words 1 distinct; bigram "spam spam" x3/3
      (2L, "all words fully distinct here"), // no dup; every bigram count 1 → 1/4
      (3L, "solo"))                          // 1 word: no bigram → 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4, 7500L, 10000L)), s"got ${out(1L)}")
    assert(out(2L) == ((5, 0L, 2500L)), s"got ${out(2L)}")
    assert(out(3L) == ((1, 0L, 0L)), s"got ${out(3L)}")
  }

  test("pii scan counts and redacts emails, phones, ipv4s") {
    val df = Seq((1L,
      "mail bob.smith@corp-x.example.org and +1-415-555-0199 from 192.168.10.7 twice 10.0.0.1"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: (TextAnalysis.piiCounts(col("text")) :+
        TextAnalysis.piiRedact(col("text")).as("red")): _*)
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 2, s"counts ${out(1L)}")
    assert(out(1L)._5 ==
      "mail <EMAIL> and <PHONE> from <IP> twice <IP>")
    assert(out(2L)._2 == 0 && out(2L)._3 == 0 && out(2L)._4 == 0)
    assert(out(2L)._5 == "no pii here at all")
  }

  test("stratified sample keeps listed strata at their rate, others whole") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 0), defaultPct = 100)
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    assert(!langs.contains("en"), "rate 0 must drop the stratum entirely")
    val total = docs.count() - docs.filter(col("lang") === "en").count()
    assert(kept.count() == total, "unlisted strata must be kept whole")
  }

  test("mixture sample: input schema preserved, sqrt-share rebalance, determinism") {
    val docs = graft.tsdb.Tables.load(spark, sf, "documents")
    val out = Sampling.mixtureSample(docs, "doc_id", "lang", keepPpm = 500000L)
    // output schema == input schema: no internal helper columns leak
    assert(out.columns.toSeq == docs.columns.toSeq,
      s"helper columns leaked: ${out.columns.mkString(",")}")
    // deterministic: same membership on a re-run at different parallelism
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.mixtureSample(docs.repartition(7), "doc_id", "lang",
      keepPpm = 500000L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // T=2 rebalance: a dominant source's realized keep-rate is strictly
    // below a rare source's (√-share upweights the tail)
    val inC = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val outC = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val top = inC.maxBy(_._2)._1
    val rare = inC.minBy(_._2)._1
    if (top != rare) {
      val topRate = outC.getOrElse(top, 0L).toDouble / inC(top)
      val rareRate = outC.getOrElse(rare, 0L).toDouble / inC(rare)
      assert(topRate < rareRate,
        s"dominant '$top' rate $topRate must be below rare '$rare' rate $rareRate")
    }
    // overall volume lands at or under the keep target (caps can undershoot)
    assert(out.count() <= (docs.count() * 0.5 * 1.02).toLong + 1)
  }

  test("frame sample: every Nth frame, seek offsets, partial tail dropped") {
    import graft.pipeline.Multimodal
    // 2x2 frames = 4 bytes each; payload of 11 bytes = 2 full frames + tail
    val p1 = Array.tabulate[Byte](11)(i => (i * 10).toByte)
    val p2 = Array.tabulate[Byte](16)(_ => 0xff.toByte) // 4 uniform frames
    val media = Seq(
      Multimodal.MediaRow(1L, p1, "video/x-raw", 2, 2),
      Multimodal.MediaRow(2L, p2, "video/x-raw", 2, 2),
      Multimodal.MediaRow(3L, Array.emptyByteArray, "video/x-raw", 2, 2),
      Multimodal.MediaRow(4L, null, "video/x-raw", 2, 2)).toDS()
    val out = Multimodal.frameSample(media, width = 2, height = 2,
      everyNth = 3, fps = 5).collect().sortBy(r => (r.media_id, r.frame_idx))
    // media 1: frames 0,1 exist; sampled = {0}. media 2: frames 0..3; sampled = {0,3}
    assert(out.map(r => (r.media_id, r.frame_idx)).toSeq ==
      Seq((1L, 0), (2L, 0), (2L, 3)))
    val f10 = out.head
    assert(f10.pts_ms == 0L && f10.width == 2 && f10.height == 2)
    // bytes 0,10,20,30 -> sum 60 -> 60*10000/(4*255) = 588
    assert(f10.brightness_e4 == 588L)
    val f23 = out.last
    assert(f23.pts_ms == 3L * 1000 / 5) // 600 ms at 5 fps
    assert(f23.brightness_e4 == 10000L) // saturated frame
    // digest matches an independent computation of the same slice
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest(p2.slice(12, 16)).map("%02x".format(_)).mkString
    assert(f23.frame_md5 == want)
  }

  test("PQ refine: exact re-rank of the ADC shortlist, recall >= plain ADC") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = vecs.filter(col("id") < 5)
    val cb = Similarity.firstKsCodebooks(vecs, 8, 16)
    val cents = Similarity.firstNCentroids(vecs, 16)
    val adc = Similarity.pqTopK(q, vecs, 10, 8, 16, 16, 6,
      Some(cb), Some(cents)).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val shortlist = Similarity.pqTopK(q, vecs, 40, 8, 16, 16, 6,
      Some(cb), Some(cents)).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val refined = Similarity.pqTopKRefined(q, vecs, 10, refine = 4,
      m = 8, ks = 16, nlist = 16, nprobe = 6, Some(cb), Some(cents))
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect()
    // k rows per query, ranks 1..k, cosine non-increasing within a query
    refined.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4))
    }
    // refined picks only from the widened shortlist
    assert(refined.map(r => (r._1, r._3)).toSet.subsetOf(shortlist))
    // exact re-ranking can only improve recall vs the exact brute order
    val brute = Similarity.bruteTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val refinedSet = refined.map(r => (r._1, r._3)).toSet
    assert((refinedSet & brute).size >= (adc & brute).size,
      s"refined recall ${(refinedSet & brute).size} < adc ${(adc & brute).size}")
  }

  test("semantic dedup: one keeper per component, dropped rows have a kept sibling") {
    // hand-built geometry: 1≈2≈3 (chained), 4≈5, 6 isolated
    val mk = (s: Double, t: Double) => Array(s.toFloat, t.toFloat, 0f, 0f)
    val df = Seq(
      (1L, mk(1.0, 0.00)), (2L, mk(1.0, 0.05)), (3L, mk(1.0, 0.10)),
      (4L, mk(-1.0, 1.0)), (5L, mk(-1.0, 1.02)), (6L, mk(0.0, -1.0)))
      .toDF("id", "vec")
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(-1.0, 1.0, 0.0, 0.0),
      Array(0.0, -1.0, 0.0, 0.0))
    val out = Similarity.semanticDedup(df, threshold = 0.99, nlist = 3,
      replicate = 1, centroids = Some(cents))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 1L, 3L, 1L)))
    assert(byId(2L) == ((2L, 1L, 3L, 0L)))
    assert(byId(3L) == ((3L, 1L, 3L, 0L))) // reaches 1 only transitively via 2
    assert(byId(4L) == ((4L, 4L, 2L, 1L)))
    assert(byId(5L) == ((5L, 4L, 2L, 0L)))
    assert(byId(6L) == ((6L, 6L, 1L, 1L))) // singleton keeps itself
    // every dropped row's cluster representative is kept
    val kept = out.filter(_._4 == 1L).map(_._2).toSet
    assert(out.filter(_._4 == 0L).forall(r => kept.contains(r._2)))
  }

  test("semantic dedup over the corpus: partition of all ids, keepers = clusters") {
    val vecs = graft.tsdb.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = vecs.count()
    val out = Similarity.semanticDedup(vecs, threshold = 0.45, nlist = 16,
      replicate = 2, centroids = Some(Similarity.firstNCentroids(vecs, 16)))
    out.cache()
    try {
      assert(out.count() == n, "exactly one row per input vector")
      val keepers = out.filter(col("keep") === 1L).count()
      val clusters = out.select("cluster_id").distinct().count()
      assert(keepers == clusters, "exactly one keeper per cluster")
      // sizes are consistent: sum of one size per cluster == n
      val sizeSum = out.filter(col("keep") === 1L)
        .agg(sum(col("cluster_size"))).as[Long].head()
      assert(sizeSum == n)
    } finally out.unpersist()
  }

  test("z-order: morton interleave and quantization math") {
    val df = Seq((1L, 2L), (3L, 0L), (0L, 0L)).toDF("a", "b")
    val z = df.select(ZOrder.interleave(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].collect().toSeq
    // a=1 (b01), b=2 (b10): bit0(a)→pos0, bit1(b)→pos3 = 1 + 8 = 9
    // a=3 (b11), b=0:      pos0 + pos2   = 5
    assert(z == Seq(9L, 5L, 0L))
    // quantize: [10, 20] over 2 bits → 4 cells of width 2.5
    val q = Seq(10.0, 12.4, 17.5, 20.0).toDF("v")
      .select(ZOrder.quantize(col("v"), 10.0, 20.0, 2).as("c"))
      .as[Long].collect().toSeq
    assert(q == Seq(0L, 0L, 3L, 3L)) // max clamps into the last cell
    // constant column collapses to cell 0 instead of dividing by zero
    assert(Seq(5.0).toDF("v").select(ZOrder.quantize(col("v"), 5.0, 5.0, 2))
      .as[Long].head() == 0L)
  }

  test("z-order rewrite: content identical, both dimensions become prunable") {
    val ev = graft.tsdb.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      // baseline: the single-dimension layout the engine's date/ts sort
      // gives — range-partitioned and sorted by ts only
      ev.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$dir/by_ts")
      ZOrder.writeZOrdered(ev, Seq("user_id", "ts"), s"$dir/zorder", 16)

      val byTs = spark.read.parquet(s"$dir/by_ts")
      val byZ = spark.read.parquet(s"$dir/zorder")
      // relayout preserves content exactly
      assert(byZ.count() == ev.count())
      assert(byZ.select("event_id").except(ev.select("event_id")).isEmpty)

      // a narrow user strip over ALL of time: the ts layout cannot prune
      // a single file (every file spans all users); the z layout keeps
      // the strip inside a minority of files
      val (umin, umax) = ev.agg(min("user_id"), max("user_id"))
        .as[(Long, Long)].head()
      val strip = Map("user_id" ->
        (umin.toDouble, (umin + (umax - umin) / 8).toDouble))
      val tsTouched = ZOrder.filesTouched(byTs, strip)
      val zTouched = ZOrder.filesTouched(byZ, strip)
      assert(tsTouched == 16L, s"ts layout should span all users per file, got $tsTouched")
      assert(zTouched <= 8L, s"z layout should bound the strip, got $zTouched")

      // and the z layout still prunes on time (the dimension the ts
      // layout was built for): a mid-time slab skips files in both
      val (tmin, tmax) = ev.agg(min("ts"), max("ts")).as[(Long, Long)].head()
      val mid = tmin + (tmax - tmin) / 2
      val slab = Map("ts" -> (tmin.toDouble, (tmin + (tmax - tmin) / 8).toDouble))
      assert(ZOrder.filesTouched(byZ, slab) < 16L)
      assert(mid > tmin) // sanity: the range is non-degenerate
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}

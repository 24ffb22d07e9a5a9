package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as
  * a shuffle-conscious DataFrame transformation:
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle on the
  *    16-byte hash, never on the document body;
  *  - near-dup via shingle Jaccard: inverted-index self-join (shuffle on
  *    shingle, then on the pair key) — NEVER an all-pairs cross join, so
  *    cost is Σ(posting-list²) not n²;
  *  - MinHash + LSH banding: constant-size signatures (k string mins),
  *    candidate generation by band equality, exact Jaccard verification
  *    on candidates only — the 100 TB path;
  *  - SimHash: 64-bit sketch via per-shingle hash bit-voting; hamming
  *    buckets give another near-dup family.
  *
  * MinHash here is string-min over md5(seed:shingle) — deliberately
  * engine-agnostic (lexicographic min of hex digests) so the DuckDB
  * oracle can reproduce signatures bit-for-bit.
  */
object Dedup {

  /** Persist an intermediate that multiple plan branches reference —
    * without it, Spark recomputes the whole subtree (regex split, shingle
    * build, hashing) once PER REFERENCE: measured 5.3 s → 2.3 s on the
    * sf0.1 Jaccard battery entry (shingles feed the posting explode AND
    * both verification joins). MEMORY_AND_DISK: eviction under pressure
    * degrades to recompute, never to wrong results; blocks are freed by
    * Spark's ContextCleaner when the frame becomes unreachable, so
    * operators stay fire-and-forget. */
  private def reused(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact dedup: one representative (min id) per normalized-content hash. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, distinct shingle array, shingle count) per document. Words and
    * shingles are materialized in separate projections so each regex
    * split / array build happens exactly once per row. */
  def shingled(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), TextAnalysis.words(col(textCol)).as("ws"))
      .select(col("doc"), TextAnalysis.shinglesOfWords(col("ws"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("nsh", size(col("sh")))

  /** Near-duplicate pairs by exact shingle Jaccard >= threshold.
    *
    * Candidate generation uses PREFIX FILTERING (PPJoin-style): under a
    * GLOBAL shingle order, a pair with jaccard >= t must share a shingle
    * within each side's first `|s| − ⌈t·|s|⌉ + 1` ordered shingles — so
    * only prefixes are exploded into the inverted index (~(1−t) of
    * postings). The global order is RAREST-FIRST (ascending document
    * frequency, shingle text as tie-break): prefixes then hold each doc's
    * most selective shingles, so posting lists in the candidate join stay
    * short and the hot template-shared shingles never enter the index —
    * the standard defense against the quadratic hot-key blowup at scale.
    * Candidates are verified with exact Jaccard over the full sets;
    * the result is IDENTICAL to the naive all-postings join.
    *
    * Plan shape: candidate generation runs entirely on 64-bit shingle
    * HASHES — the wide shuffles (document-frequency count, per-doc prefix
    * aggregation, inverted-index self-join) move 8-byte longs, never
    * shingle text. Hashing token space is sound: the prefix principle
    * holds under any global total order (here (df, hash)); a hash
    * collision merges two shingles into one token, which only ADDS
    * candidates and can push the per-doc prefix bound up, never below the
    * required `|s| − ⌈t·|s|⌉ + 1`; exact verification over the original
    * string arrays then makes the result provably identical. Prefix
    * selection is ONE hash aggregation per doc (array_sort of the tiny
    * (df, h) list + slice) — no sort-based window, no partition-wide
    * sort. `broadcastDict = true` turns the df-lookup join into a
    * broadcast (only worthwhile while the distinct-shingle dictionary is
    * driver-sized; the default shuffle join rides the partitioning the
    * dfreq aggregation already produced and is what survives 100 TB —
    * though at that scale prefer [[minhashLshPairs]]). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, broadcastDict: Boolean = false): DataFrame = {
    val sh = shingled(df, idCol, textCol, n)
    // postings (three longs per row) feed the df count AND the prefix
    // join — persist THEM, not the shingle arrays: caching the big
    // array frames re-measured 3x slower at sf1 (storage churn competes
    // with the prefix self-join's execution memory), while the slim
    // posting cache wins at both scales
    val posts = reused(
      sh.select(col("doc"), col("nsh"), explode(col("sh")).as("s"))
        .select(col("doc"), col("nsh"), xxhash64(col("s")).as("h")))
    // global rarest-first order: document frequency per hashed shingle
    val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val dict = if (broadcastDict) broadcast(dfreq) else dfreq
    val prefixLen = (col("nsh") - ceil(col("nsh") * threshold) + 1).cast("int")
    // struct ordering is field-wise: (df asc, h asc) == rarest-first
    val prefix = posts
      .join(dict, "h")
      .groupBy(col("doc"))
      .agg(first(col("nsh")).as("nsh"),
        array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc"), col("nsh"),
        explode(slice(col("ranked"), lit(1), prefixLen)).as("p"))
      .select(col("doc"), col("nsh"), col("p.h").as("h"))
    val a = prefix.select(col("h"), col("doc").as("doc_a"), col("nsh").as("nsh_a"))
    val b = prefix.select(col("h"), col("doc").as("doc_b"), col("nsh").as("nsh_b"))
    // LENGTH FILTER (PPJoin): jaccard(A,B) ≤ min/max of the set sizes,
    // so a pair needs min ≥ t·max — at sf1 this cuts 62% of candidate
    // pairs (12.1M → 4.6M for 225k true pairs, ProbeJaccard r15) for
    // two ints through the join, BEFORE the distinct's shuffle and the
    // array-carrying verification joins. Expressed as the same double
    // division verification applies (min/max IS the best-case jaccard;
    // distinct rationals with bounded denominators are never within an
    // ulp, so the filter can only drop pairs verification would drop).
    val cand = a.join(b, Seq("h"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("nsh_a"), col("nsh_b")).cast("double") /
          greatest(col("nsh_a"), col("nsh_b")).cast("double") >= threshold)
      .select(col("doc_a"), col("doc_b")).distinct()
    verifyJaccard(cand, df, idCol, textCol, n, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs: the corpus is
    * SEMI-JOIN PRUNED to candidate docs BEFORE shingling (r18 round 2) —
    * a projection sits below a join, so without the prune Spark
    * re-evaluated the shingle build for every corpus row on BOTH
    * verification joins even though only candidate docs are ever
    * matched. Candidates are a slim persisted (id, id) frame read three
    * times (id explode + two joins); verification shingles are computed
    * for candidate docs only — at 100 TB that is "shingle the
    * duplicates", not "shingle the corpus, twice". Identical pairs: the
    * prune only drops rows the equi-joins could never match. */
  private def verifyJaccard(cand0: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    val cand = reused(cand0)
    val ids = cand.select(explode(array(col("doc_a"), col("doc_b"))).as(idCol))
      .distinct()
    val sh = shingled(docs.join(ids, Seq(idCol), "leftsemi"), idCol, textCol, n)
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

  /** MinHash signature columns m0..m{k−1}: lane `i` is the lexicographic
    * min of an 8-hex-char slice of md5("<i/4>:<shingle>") — still an
    * engine-agnostic string minhash a SQL oracle reproduces verbatim
    * (`min(substring(md5('j:' || sg), off, 8))`), but ⌈k/4⌉ md5 calls per
    * shingle instead of k. 32-bit lanes perturb min-collisions only at
    * ~|shingles|/2³² — immaterial to LSH banding. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // ROW-LOCAL since r18 round 2: each lane min folds over the doc's OWN
    // shingle set, so the explode → k-min groupBy formulation shuffled
    // every shingle posting corpus-wide to compute per-row values.
    // `minhash_lanes` (native, codegen) keeps the identical
    // engine-agnostic definition — lane i = min(substring(md5("<i/4>:" ||
    // shingle), (i%4)*8+1, 8)) — in one pass per row; signatures are
    // bit-identical and the signature Exchange disappears from every LSH
    // consumer (guide §2.4). ⌈k/4⌉ md5 evals per shingle, same as before.
    shingled(df, idCol, textCol, n)
      .select(col("doc"),
        graft.functions.TextFunctions.minhash_lanes(col("sh"), k).as("__lanes"))
      .select(col("doc") +: (0 until k).map(i =>
        element_at(col("__lanes"), i + 1).as(s"m$i")): _*)
  }

  /** (doc, band hash) rows: k minhash lanes folded into `bands` band
    * hashes per doc — the LSH bucket keys. */
  private def bandKeys(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, n, k)
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        md5(concat_ws("|", (0 until rows).map(r => col(s"m${bi * rows + r}")): _*)).as("h"))
    }
    sigs.select(col("doc"), explode(array(bandCols: _*)).as("bh"))
  }

  /** LSH banding over minhash signatures: k mins folded into `bands`
    * bands of k/bands rows each; docs sharing any band hash are
    * candidates; candidates are verified with exact Jaccard. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    // banded rides the self-join twice (x/y); each side would otherwise
    // recompute the whole shingle→signature→band pipeline
    val banded = reused(bandKeys(df, idCol, textCol, n, k, bands))
    val cand = banded.as("x").join(banded.as("y"), col("x.bh") === col("y.bh"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b")).distinct()
    // verification deliberately reads ONE persisted full shingle pass
    // rather than semi-join pruning to candidate docs: the prune was
    // measured (r18 round 2 A/B, min-of-3) at 0.44 → 1.08 s here — it
    // serializes candidate generation and verification behind an extra
    // join, while the cached pass lets them share one materialization.
    // (jaccardPairs, whose verification would otherwise re-shingle the
    // corpus TWICE uncached, keeps the prune — measured win there.)
    verifyJaccardFull(cand, reused(shingled(df, idCol, textCol, n)), threshold)
  }

  /** Verification against an (already slim or cached) full shingle
    * frame — the pre-r18-round-2 shape, still right when the shingle
    * pass is shared/persisted (see [[minhashLshPairs]]). */
  private def verifyJaccardFull(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Incremental dedup: classify each INCOMING doc against an EXISTING
    * corpus without ever re-comparing existing docs to each other — the
    * production shape for "dedup this crawl against the 100 TB corpus".
    * Verdicts: `exact_dup` (same normalized content as an existing doc),
    * `near_dup` (shingle Jaccard ≥ threshold with an existing doc via
    * MinHash-LSH banding), else `new`; `dup_of` carries the smallest
    * matching existing id.
    *
    * Scale shape: the exact pass is a hash join on 16-byte fingerprints
    * (existing side pre-aggregated to one row per distinct content); the
    * near pass joins band keys ACROSS the two sides only (incoming ⋈
    * existing — never existing ⋈ existing, so the big corpus is read but
    * never self-joined), candidates shuffle ids only, and verification
    * touches just the candidate docs' shingle arrays. In steady state
    * the existing side's signatures/bands would be a materialized index
    * (write [[minhashSignatures]] output once, reuse per increment). */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    val exFp = existing
      .select(col(idCol).as("ex_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("ex_id").as("exact_of"))
    val inFp = incoming
      .select(col(idCol).as("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
    // persisted slim (two longs/row): the exact verdicts feed the
    // non-exact semi-join, the near pass's two incoming-side scans AND
    // the final assembly — without the persist both sides' fingerprint
    // passes re-evaluate once per reference (r17)
    val exact = reused(inFp.join(exFp, Seq("fp"), "left")
      .select(col("doc_id"), col("exact_of")))
    // exact dups — the most common duplicate class — never enter the
    // near pass: their verdict is already decided, so running them
    // through LSH banding + Jaccard verification (the expensive half)
    // would only produce rows the verdict CASE discards
    val nonExact = incoming.join(
      exact.filter(col("exact_of").isNull)
        .select(col("doc_id").as(idCol)), Seq(idCol), "leftsemi")
    val candidates = bandKeys(nonExact, idCol, textCol, n, k, bands).as("x")
      .join(bandKeys(existing, idCol, textCol, n, k, bands).as("y"), col("x.bh") === col("y.bh"))
      .select(col("x.doc").as("doc_id"), col("y.doc").as("ex_id")).distinct()
    // verification deliberately UNPRUNED (r18 round 2 A/B: semi-joining
    // both sides to candidate docs before shingling measured 0.78 →
    // 0.95 s — the extra joins serialize the pipeline; same verdict as
    // minhashLshPairs, opposite of jaccardPairs whose verification was
    // re-shingling the corpus twice uncached)
    val near = candidates
      .join(shingled(nonExact, idCol, textCol, n)
        .select(col("doc").as("doc_id"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_id")
      .join(shingled(existing, idCol, textCol, n)
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

  /** 64-bit SimHash over shingle hashes: for every bit, +1 when set else
    * −1, summed across shingles; the sketch bit is the vote's sign.
    * Pure column algebra (explode → groupBy-sum over 64 bit lanes).
    *
    * Bit lanes are md5-derived — lane `b` is bit `b % 4` of the hex
    * nibble at position `b / 4` of md5(shingle) — deliberately
    * engine-agnostic (like the string minhash above) so a SQL oracle can
    * reproduce the sketch bit-for-bit from its own md5. */
  def simhash(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // ROW-LOCAL since r18 round 2: the 64 bit votes fold over the doc's
    // OWN shingle set — the previous explode → 64-sum groupBy shuffled
    // every shingle posting corpus-wide for per-row values. `simhash64`
    // (native, codegen) runs the identical nibble arithmetic — lane b =
    // bit b%4 of hex nibble b/4 of md5(shingle), +1/−1 vote, sketch bit =
    // vote sign — in one pass per row; sketches are bit-identical and the
    // vote Exchange disappears (guide §2.4).
    shingled(df, idCol, textCol, n)
      .select(col("doc"),
        graft.functions.TextFunctions.simhash64(col("sh")).as("simhash"))

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash Hamming distance <= `maxHamming`.
    *
    * Candidate generation splits the 64-bit sketch into 4 disjoint 16-bit
    * bands: two sketches within Hamming distance 3 differ in at most 3
    * bits, so BY PIGEONHOLE at least one band is untouched — band
    * equality is a complete blocking key (recall 1.0, same as all-pairs)
    * for radius <= 3. The band join shuffles (band, 16-bit value, id)
    * only; sketches rejoin for the exact Hamming verification, so the
    * result is provably identical to the n² scan. At 100 TB the per-band
    * bucket population is n/2¹⁶ uniformly — for larger corpora widen the
    * sketch (128-bit, 4x32-bit bands) rather than adding bands, which
    * loosens the radius the pigeonhole argument covers. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4x16-bit band blocking is complete only for radius <= 3")
    // the sketch feeds band explode + two verification joins (3 refs)
    val sk = reused(simhash(df, idCol, textCol, n))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), 16 * b).bitwiseAND(0xFFFFL).as("v"))
    }
    val banded = sk.select(col("doc"), explode(array(bandCols: _*)).as("bh"))
    val cand = banded.as("x").join(banded.as("y"), col("x.bh") === col("y.bh"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b")).distinct()
    cand
      .join(sk.select(col("doc").as("doc_a"), col("simhash").as("sk_a")), "doc_a")
      .join(sk.select(col("doc").as("doc_b"), col("simhash").as("sk_b")), "doc_b")
      .withColumn("hamming", hamming(col("sk_a"), col("sk_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components — the single entry point every dedup family
    * resolves clusters through. Two tiers, labels = component minima
    * either way:
    *
    *  - edge set within [[driverCcMaxEdges]]: driver union-find over the
    *    collected (long, long) edges, labels broadcast-joined back — the
    *    corpus-sized NODE side never leaves the cluster;
    *  - above the budget: [[connectedComponentsStar]], the
    *    large-star/small-star scheme whose round count is O(log n)
    *    regardless of component shape. (Min-label propagation —
    *    [[connectedComponentsLabelProp]] — pays DIAMETER rounds: fine
    *    for near-clique dup clusters, pathological for replica chains,
    *    which is exactly the shape a 100 TB crawl's propagated-copy
    *    chains produce. Property-tested label-equal; not the default.) */
  /** Edge budget for the driver union-find fast path of
    * [[connectedComponents]]: a pair of longs per edge, so 4M edges ≈
    * 64 MB of driver heap — the same bounded-driver-state discipline as
    * the engine's serving tiers. `@volatile var` so tests can force
    * either path. */
  @volatile var driverCcMaxEdges: Long = 4000000L

  /** Both directions of an edge set via ONE explode — `edges ∪
    * flip(edges)` evaluates the (expensive, e.g. MinHash-LSH) upstream
    * pair-generation subtree once PER UNION BRANCH, i.e. twice; the
    * explode emits both directions from a single evaluation (r17,
    * measured: halves the pair-chain cost of every CC materialization). */
  private def undirected(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // Persist the undirected edge set ONCE: every round joins it —
    // without this the whole upstream pair-generation lineage (e.g. the
    // MinHash-LSH chain) re-executes per round. Caught by the sf1
    // measurement: cluster resolution cost rounds × LSH, not LSH + rounds.
    val und = undirected(edges).cache()
    try {
      // Driver union-find fast path: label propagation pays per ROUND
      // (two shuffles + a count + a checkpoint each), a fixed multi-job
      // cost that dwarfs the actual work whenever the EDGE set is small
      // — which it usually is: dup pairs grow with duplicate content,
      // not corpus size. When the (cached, already-materialized) edges
      // fit [[driverCcMaxEdges]], collect them, union-find in
      // milliseconds, and broadcast-join the endpoint labels back onto
      // the nodes — the NODE side (corpus-sized) never leaves the
      // cluster, mirroring the serving tiers' bounded-driver contract.
      // Labels are component minima either way, bit-identical output.
      // Past the budget the distributed default is the large-star/
      // small-star variant ([[connectedComponentsStar]]): label
      // propagation pays DIAMETER rounds (a replica chain of depth d is
      // d shuffles), star pays O(log n) — the property suite pins both
      // the label equality and the round bound, and the label-prop loop
      // stays available as [[connectedComponentsLabelProp]].
      val eCount = und.count() // materializes the cache for both paths
      if (eCount / 2 <= driverCcMaxEdges) {
        val spark = nodes.sparkSession
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        // collect the CACHED undirected frame (collecting `edges` would
        // re-execute the whole upstream pair-generation lineage); the
        // mirrored duplicates are harmless to union-find
        und.collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union under the MIN root → labels = minima
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        val lab = Seq.newBuilder[(Long, Long)]
        parent.forEach((k, _) => lab += ((k, find(k))))
        import spark.implicits._
        val labDf = lab.result().toDF("node", "__cc_label")
        return nodes.select(col("node"))
          .join(broadcast(labDf), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__cc_label"), col("node")).as("label"))
      }
      // `und` is cached and already materialized by the count, so star's
      // initial canonicalize+checkpoint reads the cache, not the upstream
      // pair-generation lineage
      connectedComponentsStar(nodes, und, maxIter)._1
    } finally und.unpersist()
  }

  /** The iterative min-label-propagation variant of
    * [[connectedComponents]] — kept as the simplest reference
    * implementation the property suite checks the driver and star paths
    * against; not the distributed default since r8. Every node starts
    * labeled with its own id; each round takes the min of its own and
    * its neighbors' labels; fixpoint = component minima, rounds =
    * component DIAMETER (near-clique dup clusters converge in ~2, the
    * sf1 replica chains need ~9).
    *
    * Every round is eagerly localCheckpoint'ed — truncating the plan,
    * not just the execution, is load-bearing: each step embeds the
    * previous round's frame TWICE (via nbrMin and as the join's left
    * side), so without truncation the logical tree DOUBLES per round;
    * at ~9 rounds the analyzer/UI chew multi-GB plan strings and
    * dominate runtime (measured 392 s for dedup_canonical at sf1 with
    * per-round cache only). The checkpoint is ~free here because the
    * convergence count materializes each round anyway and rows are two
    * longs. */
  def connectedComponentsLabelProp(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val und = undirected(edges).cache()
    try {
      var labels = nodes.select(col("node"), col("node").as("label"))
        .localCheckpoint(true)
      var it = 0
      var changed = 1L
      while (changed > 0 && it < maxIter) {
        val nbrMin = und
          .join(labels.select(col("node").as("b"), col("label").as("blabel")), "b")
          .groupBy(col("a").as("node")).agg(min(col("blabel")).as("nbr"))
        val step = labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("label").as("old"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
          .localCheckpoint(true)
        changed = step.filter(col("label") =!= col("old")).count()
        labels = step.select(col("node"), col("label"))
        it += 1
      }
      // labels is one projection over the last round's pinned blocks, so
      // it survives the edge-cache unpersist without re-execution
      labels
    } finally und.unpersist()
  }

  /** Connected components by alternating large-star/small-star — the
    * documented upgrade over [[connectedComponents]] for PATH-SHAPED
    * graphs (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): label propagation needs diameter rounds, this needs
    * O(log n), because every round rewires whole neighborhoods onto
    * their minimum instead of moving labels one hop.
    *
    *  - large-star (per node u over BOTH edge directions): m = min of
    *    u's neighborhood and u; every neighbor v > u re-points to m;
    *  - small-star (per node u over (max→min)-oriented edges): m = min
    *    of u's small neighbors and u; u and each small neighbor
    *    re-point to m.
    *
    * Both steps preserve connectivity and only shrink edge targets, so
    * the fixpoint is a star per component rooted at its minimum; rounds
    * alternate until the edge set stops changing. Per round: two
    * shuffles over (long, long) pairs, same payload discipline as label
    * propagation. Returns (labels, rounds) — each node labeled with its
    * component minimum (isolated nodes label themselves), and the
    * star rounds used (the spec pins the log-vs-diameter bound). */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): (DataFrame, Int) = {
    // every round is localCheckpoint'ed (eager): the convergence check
    // materializes the edge set anyway, and TRUNCATING THE PLAN is load-
    // bearing — chaining each round's union+join+distinct over the
    // previous round's frame grows the logical tree geometrically and
    // OOMs the analyzer after a handful of rounds (caching alone
    // truncates execution, not the plan). Also cuts the upstream
    // pair-generation lineage once, like connectedComponents' edge cache.
    var e = edges.select(col("a"), col("b")).filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint(true)
    var it = 0
    var stable = e.isEmpty
    while (!stable && it < maxIter) {
      // large-star: u gathers Γ(u) from both directions (one explode —
      // e is checkpointed, but a single read still beats two)
      val und = undirected(e).select(col("a").as("u"), col("b").as("v"))
      val lsMin = und.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = und.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
      // small-star over (max → min) orientation: u and its small
      // neighbors all re-point to the neighborhood minimum
      val oriented = ls
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val ssMin = oriented.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      val ss = oriented.join(ssMin, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(ssMin.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
        .distinct().localCheckpoint(true)
      // fixpoint when the canonical edge set is unchanged (equal sizes +
      // one-sided containment of distinct sets == equality)
      stable = ss.count() == e.count() && ss.except(e).limit(1).count() == 0L
      e.unpersist(blocking = false)
      e = ss
      it += 1
    }
    // fixpoint edges form stars (non-root → root): label = root
    val stars = e.select(col("a").as("node"), col("b").as("label"))
    val labels = nodes.select(col("node"))
      .join(stars, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    (labels, it)
  }

  /** (doc, fp) winnowing fingerprint postings — see
    * [[TextAnalysis.winnowHashes]] for the selection scheme. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame =
    df.select(col(idCol).as("doc"), TextAnalysis.words(col(textCol)).as("ws"))
      .select(col("doc"), TextAnalysis.winnowHashes(col("ws"), n, w).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc"), explode(col("fps")).as("fp"))

  /** Partial-overlap / containment pairs over winnowing fingerprints:
    * inverted-index self-join on the fingerprint (8-byte longs through
    * every wide shuffle), pairs kept at >= `minShared` shared
    * fingerprints, scored shared/min(|sketch|). Fingerprints appearing
    * in more than `maxDf` docs are dropped FIRST — boilerplate/template
    * runs otherwise put the same fp in thousands of docs and the
    * posting-list self-join goes quadratic on those hot keys (the same
    * df-defense the Jaccard prefix filter uses, here as a hard cap
    * because overlap counts, unlike Jaccard, stay meaningful when
    * ubiquitous runs are ignored). */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, minShared: Long, maxDf: Long): DataFrame = {
    val fps = reused(winnowFingerprints(df, idCol, textCol, n, w))
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("fdf")).filter(col("fdf") <= maxDf)
    // capped postings feed the per-doc count and BOTH self-join sides
    val fpk = reused(fps.join(keep.select("fp"), "fp"))
    val nf = fpk.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val pairs = fpk.as("a")
      .join(fpk.as("b"), col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(nf.select(col("doc").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(nf.select(col("doc").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("overlap_e4",
        floor(col("shared") * 10000.0 / least(col("n_a"), col("n_b")) + 0.5).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("overlap_e4"))
  }

  /** Cross-document repeated n-gram SPANS — the exact-substring dedup
    * signal (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL'22): a positional n-gram is duplicated when it
    * occurs in >= `minDocs` distinct documents; per document, duplicated
    * grams whose [pos, pos+n) windows overlap or touch merge into
    * maximal token spans — the ranges an exact-substring dedup pass
    * would cut, where whole-doc similarity (Jaccard/SimHash) sees
    * nothing. Returns (doc, span_start, span_end, span_tokens) with
    * token positions 0-based, end exclusive.
    *
    * Shuffles: one (gram-hash) aggregation for the duplicated set, one
    * hash join back onto the postings, one per-doc window for the
    * interval merge. Grams ride every wide stage as 8-byte md5-prefix
    * longs (never the text), the same cross-engine hash the winnowing /
    * decontamination operators use — collisions are IDENTICAL in both
    * engines, so the oracle matches by construction; at corpus scale a
    * collision can only widen a span, the safe direction for a dedup
    * cut. The interval-merge Window is partitioned BY DOC (per-group
    * rows <= doc token count) — bounded state, unlike a global window. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // postings feed the duplicated-gram aggregation AND the join back.
    // Grams are hashed BEFORE the posexplode (native gram_hashes — the
    // identical conv(substring(md5(gram),1,8),16,10) u32): gram strings
    // never materialize as rows and the interpreted per-gram concat
    // lambda is gone (r18 round 2; values bit-identical)
    val posts = reused(docs
      .select(col(idCol).as("doc"), TextAnalysis.words(col(textCol)).as("ws"))
      .select(col("doc"),
        posexplode(graft.functions.TextFunctions.gram_hashes(col("ws"), n,
          distinct = false)).as(Seq("pos", "gh"))))
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

  /** Apply [[repeatedSpans]] to produce the CLEANED corpus — the actual
    * exact-substring dedup deliverable (Lee et al. cut the duplicated
    * ranges out of every document, not just report them): per document,
    * drop the tokens inside every merged span and re-join the survivors.
    * Returns (doc, n_kept, n_cut, clean_fp) where `clean_fp` is the md5
    * of the cleaned (normalized, single-space) text — byte-level proof an
    * independent engine performs the identical cut.
    *
    * Plan shape for 100 TB: spans collapse to ONE small struct-list per
    * affected doc (far fewer rows than tokens), then a single doc-keyed
    * left join back onto the corpus and a NARROW array expression
    * (`filter` with index + `exists` over the span list) does the cut —
    * the token stream is never exploded and never shuffled; per-row cost
    * is O(tokens × spans_in_that_doc). */
  def exactSubstringCut(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long = 2L): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, n, minDocs)
      .groupBy(col("doc"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"),
        sum(col("span_tokens")).as("n_cut"))
    val toks = docs.select(col(idCol).as("doc"),
      TextAnalysis.words(col(textCol)).as("ws"))
    toks.join(spans, Seq("doc"), "left")
      // cut_spans (native) instead of filter+exists: the two nested
      // interpreted lambdas per token × span become one codegen loop
      // (r18 round 2; identical kept set)
      .withColumn("kept",
        when(col("spans").isNull, col("ws"))
          .otherwise(graft.functions.TextFunctions.cut_spans(
            col("ws"), col("spans"))))
      .select(col("doc"),
        size(col("kept")).cast("long").as("n_kept"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        md5(array_join(col("kept"), " ")).as("clean_fp"))
  }

  /** Materialize the dedup index of a corpus: everything
    * [[incrementalDedup]] needs from the existing side, precomputed so
    * each increment reuses it instead of re-reading and re-shingling
    * 100 TB of text — `fps/` (fingerprint → min doc id, pre-aggregated),
    * `bands/` (doc, band, hash), `shingles/` (doc, shingle set, size;
    * the only text-derived payload, needed for exact verification).
    * After an increment is admitted, append ITS rows to the same three
    * tables — the index grows with the corpus, never rebuilt. */
  def writeDedupIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, path: String): Unit = {
    // a REBUILD replaces the whole index: clear any prior base AND
    // append batches, or a stale increment's fingerprints would ride
    // alongside the new base (duplicate fp rows fan out the exact join)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    Seq("fps", "bands", "shingles").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$t"), true)
    }
    writeDedupIndexBatch(df, idCol, textCol, n, k, bands, path, "base")
  }

  /** Append one increment's ADMITTED (verdict `new`) rows to a
    * materialized [[writeDedupIndex]]. Each increment lands under its
    * own `batch=<label>` partition directory and the write OVERWRITES
    * that directory, so replaying the same increment — a restarted
    * streaming micro-batch — is idempotent rather than duplicating
    * index rows. Only pass novel rows: a doc whose fingerprint already
    * exists in the index is an `exact_dup`, and admitting it would
    * break the fps table's one-row-per-fingerprint invariant that keeps
    * [[incrementalDedupIndexed]]'s exact join 1:1. */
  def appendDedupIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, path: String, batchLabel: String): Unit = {
    require(batchLabel.nonEmpty && batchLabel.forall(c => c.isLetterOrDigit || c == '_'),
      s"batch label '$batchLabel' must be alphanumeric")
    writeDedupIndexBatch(df, idCol, textCol, n, k, bands, path, batchLabel)
  }

  /** The three index tables of one increment, written under
    * `<table>/batch=<label>` (partition-discovery layout: readers see a
    * `batch` string column they never select). */
  /** Fold the accumulated `batch=<label>` partitions of a materialized
    * dedup index back into a single `batch=base` per table — the analog
    * of [[graft.pipeline.Similarity.compactAnnIndex]] for the OTHER
    * on-disk index: daily [[appendDedupIndex]] increments at 100 TB
    * accumulate one file set per batch, and every incremental-dedup read
    * pays the per-file open cost for all of them. Exact-dup provenance
    * is preserved: base fingerprints fold with `min(exact_of)` — the
    * same first-writer-wins the append path enforces batch-by-batch —
    * and band/shingle rows pass through unchanged. Staged write +
    * two-rename swap with rollback: a reader sees the old layout or the
    * new one, EXCEPT during the instant between the two renames — run
    * compaction without concurrent readers (the maintenance-window
    * contract of every on-disk index here). A crash in that window
    * strands the table under `<table>_retired`; [[recoverStagedSwap]]
    * restores it on the next open, so nothing is lost and the
    * compaction is simply redone. */
  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (table <- Seq("fps", "bands", "shingles")) {
      val live = s"$path/$table"
      val staged = s"$path/${table}_compacting"
      val retired = s"$path/${table}_retired"
      // restore a crash-stranded retire BEFORE clearing leftovers — the
      // retired copy may be the only complete one
      recoverStagedSwap(fs, new Path(live))
      fs.delete(new Path(staged), true)
      fs.delete(new Path(retired), true)
      val df = spark.read.parquet(live)
      val folded = table match {
        // duplicate fps across batches: keep the earliest-batch owner —
        // appendDedupIndex only admits NEW content, so a duplicate fp can
        // only be a replayed batch; min(exact_of) is its deterministic owner
        case "fps" => df.groupBy("fp").agg(min("exact_of").as("exact_of"))
        case _ => df.drop("batch").distinct()
      }
      folded.coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
        .write.mode("overwrite").parquet(s"$staged/batch=base")
      if (!fs.rename(new Path(live), new Path(retired)))
        throw new java.io.IOException(s"compactDedupIndex: cannot retire $live")
      if (!fs.rename(new Path(staged), new Path(live))) {
        fs.rename(new Path(retired), new Path(live)) // roll back
        throw new java.io.IOException(s"compactDedupIndex: cannot publish $staged")
      }
      fs.delete(new Path(retired), true)
    }
  }

  /** Startup recovery for the staged two-rename swap used by every
    * on-disk index compactor here (dedup index, cardinality summary,
    * ANN cells): a crash between retire and publish leaves the data
    * complete but stranded under `<live>_retired` with no live
    * directory. Restoring the retired copy when the live path is
    * missing makes the swap crash-safe end-to-end; the interrupted
    * compaction is simply redone later. Idempotent and cheap (two
    * metadata calls on the happy path). */
  def recoverStagedSwap(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(live)) {
      val retired = new org.apache.hadoop.fs.Path(live.toString + "_retired")
      if (fs.exists(retired) && !fs.rename(retired, live))
        throw new java.io.IOException(
          s"recoverStagedSwap: cannot restore $retired to $live")
    }

  private def writeDedupIndexBatch(df: DataFrame, idCol: String,
      textCol: String, n: Int, k: Int, bands: Int, path: String,
      label: String): Unit = {
    df.select(col(idCol).as("doc"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("doc").as("exact_of"))
      .write.mode("overwrite").parquet(s"$path/fps/batch=$label")
    bandKeys(df, idCol, textCol, n, k, bands)
      .select(col("doc"), col("bh.band").as("band"), col("bh.h").as("h"))
      .write.mode("overwrite").parquet(s"$path/bands/batch=$label")
    shingled(df, idCol, textCol, n)
      .write.mode("overwrite").parquet(s"$path/shingles/batch=$label")
  }

  /** [[incrementalDedup]] against a materialized [[writeDedupIndex]] —
    * identical verdicts, but the corpus side costs three parquet scans
    * (fps for the exact join, bands for candidates, shingles for
    * verification of candidate docs only) instead of a full text pass.
    *
    * `excludeBatch`: ignore that `batch=<label>` partition on every
    * index read — the replay seam for [[graft.streaming.StreamingNearDedup]]:
    * a restarted micro-batch re-judges against the index AS IF its own
    * (possibly already-written) rows were absent, so recomputed
    * verdicts match the first attempt instead of marking every admitted
    * doc a duplicate of itself. */
  def incrementalDedupIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, incoming: DataFrame,
      idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double,
      excludeBatch: Option[String] = None): DataFrame = {
    def readIdx(table: String): DataFrame = {
      val live = new org.apache.hadoop.fs.Path(s"$indexPath/$table")
      recoverStagedSwap(
        live.getFileSystem(spark.sparkContext.hadoopConfiguration), live)
      val raw = spark.read.parquet(s"$indexPath/$table")
      excludeBatch.fold(raw)(l => raw.filter(col("batch") =!= lit(l)))
    }
    val exFp = readIdx("fps")
    val inFp = incoming
      .select(col(idCol).as("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val exact = inFp.join(exFp, Seq("fp"), "left")
      .select(col("doc_id"), col("exact_of"))
    val exBands = readIdx("bands")
      .select(col("doc"), struct(col("band"), col("h")).as("bh"))
    val candidates = bandKeys(incoming, idCol, textCol, n, k, bands).as("x")
      .join(exBands.as("y"), col("x.bh") === col("y.bh"))
      .select(col("x.doc").as("doc_id"), col("y.doc").as("ex_id")).distinct()
    val near = candidates
      .join(shingled(incoming, idCol, textCol, n)
        .select(col("doc").as("doc_id"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_id")
      .join(readIdx("shingles")
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

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair set, plus the cluster size — the operator a dedup pipeline
    * actually ships (keep `doc_id == cluster_id` as the canonical copy,
    * drop the rest). Docs in no pair are singleton clusters of
    * themselves. */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val nodes = docs.select(col(idCol).as("node"))
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val labeled = connectedComponents(nodes, edges)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** Canonical-copy selection: after cluster resolution, keep ONE doc per
    * duplicate cluster — the highest-`score` copy (min doc_id on ties),
    * the policy real dedup pipelines ship (prefer the best-quality copy,
    * not an arbitrary one). One hash shuffle on cluster_id for the
    * per-cluster argmax; scores ride the shuffle as a single long, never
    * the document bodies. Returns (doc_id, cluster_id, cluster_size,
    * score) — `cluster_size - 1` siblings were dropped. */
  def canonicalDocs(docs: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    val labeled = dupClusters(docs, idCol, pairs)
    val scored = labeled.join(
      docs.select(col(idCol).as("doc_id"), score.cast("long").as("score")),
      "doc_id")
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("score"))
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed operator a training-data
  * pipeline actually ships, chaining the library's stages in the
  * standard order (RefinedWeb/FineWeb shape): language filter → quality
  * filter → exact dedup → MinHash-LSH near-dup dedup (best-quality copy
  * kept per cluster) → eval-set decontamination.
  *
  * Sequential-survivor semantics: each stage sees only the survivors of
  * the stages before it — a low-quality copy can never be the kept
  * canonical of a near-dup cluster, and dedup never wastes work on docs
  * a cheap filter already rejected (the narrow filters run first, the
  * shuffling stages run on the residue; at 100 TB the ordering IS the
  * cost model).
  *
  * Output is a LINEAGE frame, not just the survivors: every input doc
  * with a nullable `drop_reason` (`lang` | `quality` | `exact_dup` |
  * `near_dup` | `contaminated`, null = kept) plus `dup_of` (the kept
  * copy for either dedup reason). One declarative plan, no per-stage
  * driver actions; per-stage counts are one `groupBy(drop_reason)`
  * away, and `filter(drop_reason.isNull)` is the curated corpus. */
object Curate {

  /** @param allowedLangs   langId predictions to keep (e.g. Set("en"))
    * @param minQualityE4   keep docs with qualityScore·10⁴ ≥ this
    *                       (integer threshold — exact, no float drift)
    * @param shingleN/minhashK/bands/jaccardThreshold  near-dup dial
    *                       (see [[Dedup.minhashLshPairs]])
    * @param evalDocs       optional eval set (idCol/textCol schema);
    *                       train docs sharing ≥ `evalMinHits` distinct
    *                       `evalN`-grams with it are dropped */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      allowedLangs: Set[String] = Set("en"),
      minQualityE4: Long = 3000L,
      shingleN: Int = 3, minhashK: Int = 8, bands: Int = 4,
      jaccardThreshold: Double = 0.6,
      evalDocs: Option[DataFrame] = None,
      evalN: Int = 5, evalMinHits: Long = 1L): DataFrame = {
    val id = col(idCol)

    // Reuse discipline (measured in SCALE.md round 5/6): persist only
    // SLIM multiply-referenced frames — id/label/score longs. Text is
    // NEVER cached; every consumer that needs it re-joins ids against
    // the columnar source scan, which serves payloads better than the
    // block manager at corpus scale. Without these two persists the
    // sequential-survivor DAG re-ran exact dedup per consumer and CC
    // label propagation 3× (sf1: 145 s → 60 s; sf0.1: 9.1 s → 6.7 s).
    def slim(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // narrow per-doc signals, computed ONCE and persisted slim (r17:
    // langId + qualityScore + fingerprint are the costliest per-row
    // expressions in the pipeline and were evaluated 3× over the corpus
    // — once per exact-dedup join side, once for filter attribution;
    // one persisted pass of (id, lang, q, fp) longs+hash serves all
    // consumers). The fingerprint is computed here, pre-filter, purely
    // to share the pass — only quality survivors' rows are ever grouped.
    val scoredE4 =
      floor(TextAnalysis.qualityScore(col(textCol)) * 1e4 + 0.5).cast("long")
    val signals = slim(docs.select(id.as("doc_id"),
      TextAnalysis.langId(col(textCol)).as("__lang"), scoredE4.as("__q"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp")))

    val qualOk = signals.filter(
      col("__lang").isin(allowedLangs.toSeq: _*) && col("__q") >= minQualityE4)

    // exact dedup on quality survivors: keep the min-id copy per fp —
    // single-pass window min over the persisted signals (r17: was a
    // groupBy + self-join, i.e. two evaluations of the fingerprint pass)
    val keepW = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    // (doc_id, __keep_id, __q) — three longs per surviving row
    val keepOf = slim(qualOk
      .withColumn("__keep_id", min(col("doc_id")).over(keepW))
      .select(col("doc_id"), col("__keep_id"), col("__q")))
    val exactDropped = keepOf.filter(col("doc_id") =!= col("__keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("drop_reason"),
        col("__keep_id").as("dup_of"))
    val exactOkIds = keepOf.filter(col("doc_id") === col("__keep_id"))
      .select(col("doc_id"), col("__q"))
    // text re-served by the scan, not the cache
    val exactOkText = docs.select(id, col(textCol))
      .join(exactOkIds.select(col("doc_id").as(idCol)), idCol)

    // near-dup on exact survivors: LSH pairs → clusters → keep the
    // best-quality copy (min id on ties)
    val pairs = Dedup.minhashLshPairs(exactOkText, idCol, textCol,
      shingleN, minhashK, bands, jaccardThreshold)
    val clustered = Dedup.dupClusters(
      exactOkIds.select(col("doc_id").as(idCol)), idCol, pairs)
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("__q").desc, col("doc_id").asc)
    // (doc_id, cluster_id, __q, __rk) — the CC result rides ONE persist
    val ranked = slim(clustered
      .join(exactOkIds, "doc_id")
      .withColumn("__rk", row_number().over(rk))
      .select(col("doc_id"), col("cluster_id"), col("__q"), col("__rk")))
    val keepPerCluster = ranked.filter(col("__rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("__keep"))
    val nearDropped = ranked.filter(col("__rk") > 1)
      .join(keepPerCluster, "cluster_id")
      .select(col("doc_id"), lit("near_dup").as("drop_reason"),
        col("__keep").as("dup_of"))
    val nearOk = docs.select(id, col(textCol))
      .join(ranked.filter(col("__rk") === 1).select(col("doc_id").as(idCol)), idCol)

    // decontamination on dedup survivors
    val contaminated = evalDocs match {
      case Some(ev) =>
        Decontaminate.contamination(nearOk, ev, idCol, textCol, evalN, evalMinHits)
          .select(col(idCol).as("doc_id"),
            lit("contaminated").as("drop_reason"),
            lit(null).cast("long").as("dup_of"))
      case None => docs.select(id.as("doc_id"),
        lit("").as("drop_reason"), lit(null).cast("long").as("dup_of")).limit(0)
    }

    // narrow-filter reasons, attributed in stage order (reads the same
    // persisted signals pass — no re-evaluation of langId/quality)
    val filterDropped = signals
      .withColumn("drop_reason",
        when(!col("__lang").isin(allowedLangs.toSeq: _*), "lang")
          .when(col("__q") < minQualityE4, "quality"))
      .filter(col("drop_reason").isNotNull)
      .select(col("doc_id"), col("drop_reason"),
        lit(null).cast("long").as("dup_of"))

    val dropped = filterDropped
      .unionByName(exactDropped)
      .unionByName(nearDropped)
      .unionByName(contaminated)

    docs.select(id.as("doc_id"))
      .join(dropped, Seq("doc_id"), "left")
  }

  /** Per-stage accounting of a [[curate]] lineage frame:
    * (drop_reason, n_docs) with null → "kept". */
  def stageCounts(lineage: DataFrame): DataFrame =
    lineage.groupBy(coalesce(col("drop_reason"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"))
}

package graft.operators

import graft.functions.TextSim
import graft.functions.TextSim.{spark => sprk}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained near-dup signature index — the piece that
  * makes the dedup layer incremental the way the star layer already is
  * (watermarks + selective rebuild): a landing increment should pay for
  * signatures of NEW documents only, never a recompute of the corpus.
  *
  * The persisted state is one parquet directory of `(doc_id, shs)`
  * signature rows (distinct 3-word shingle hashes per doc, the same
  * scan-side signature t35 computes). [[ingest]] appends the
  * increment's signatures into its own `batch_key=` directory
  * ([[BatchLog]]) — prior rows stay byte-untouched on disk, batch cost
  * is O(increment) (pinned by `SignatureIndexSpec` row counts and
  * on-disk file fingerprints), and a caller-keyed batch replayed after
  * a crash replaces itself instead of double-appending. Pair detection for the batch ([[deltaPairs]]) joins
  * only the NEW side's df-capped postings against the full posting
  * list, yielding exactly the pairs that touch an increment doc
  * (new-vs-old + new-vs-new) — the accumulated pair table is the union
  * of per-batch deltas.
  *
  * Scale shape: signatures are scan-side (codegen'd `graft_poly_hash`,
  * no shuffle); the posting-list join is an equi-join on 8-byte shingle
  * hashes with the same document-frequency cap as t35 (hot shingles
  * carry no similarity signal but quadratic cost); the candidate set is
  * bounded by |increment| × dfCap per shingle, independent of corpus
  * size. At 100 TB the snapshot is the big side and never moves — only
  * increment postings shuffle.
  *
  * Honest caveat on cap boundaries: each batch's delta is evaluated
  * against the document frequencies AT THAT BATCH — a shingle crossing
  * the df cap later does not retract earlier pairs. That monotone
  * accumulation is the standard contract for incremental dedup indexes;
  * a from-scratch [[deltaPairs]](all, all) recompute is the escape
  * hatch when exact cap semantics matter.
  *
  * No refreeze here, by construction: unlike the vector family
  * ([[CosineDedupIndex]]'s batch-1 mask, [[AnnIndex]]/[[PqIndex]]'s
  * batch-1 quantizers) this index freezes NO corpus-derived parameter —
  * shingle hashes are content-only and the df cap is re-evaluated
  * against live frequencies every batch — so nothing drifts as the
  * corpus grows and there is nothing to migrate.
  *
  * Deletion (takedowns, re-crawls, keeper changes) is tombstone-then-
  * compact ([[Tombstones]]): [[remove]] records ids in a side table
  * that every read anti-joins; [[compact]] folds them into a rewritten
  * snapshot. Removal is O(removed ids) per batch; only compaction pays
  * a corpus rewrite, on the operator's schedule.
  */
object SignatureIndex {

  /** Same hot-shingle document-frequency cap as t35's batch pipeline. */
  val dfCap = 20

  /** Exact-Jaccard keeper threshold (t35/t36's verify stage). */
  val jaccardMin = 0.5

  /** Scan-side signature frame `(doc_id, shs)` from a `(doc_id, text)`
    * frame; docs with <3 words have no shingles and produce no row.
    * Shingle sets are SORTED at build time (once per document, same as
    * t35's pipeline) so the pair-verify path can count overlap with the
    * two-pointer `graft_inter_count` kernel instead of a per-pair hash
    * build — the value is order-insensitive, so nothing downstream
    * changes except the verify cost. */
  def signatures(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    docs
      .selectExpr("doc_id", s"${TextSim.wordHashes(sprk, "text")} AS wh")
      .where("size(wh) >= 3")
      .selectExpr("doc_id",
        s"sort_array(array_distinct(${TextSim.shingleHashes(sprk, "wh")})) AS shs")
  }

  /** One maintenance batch: signatures for `increment` ONLY, appended to
    * the snapshot at `root/table`; returns the new-side signatures, the
    * full index as read back from disk, and the batch's verified delta
    * pairs. The increment must carry doc_ids not already in the index
    * (keep-last dedup is the landing layer's job, upstream of this). */
  final case class Batch(newSigs: DataFrame, allSigs: DataFrame, deltaPairs: DataFrame)

  /** `batchKey` is the replay-idempotence handle ([[BatchLog]]): pass
    * the landing batch id and a crash-after-commit retry of the same
    * batch REPLACES its own files instead of double-appending; `None`
    * mints a fresh auto key (not replay-idempotent). */
  def ingest(spark: SparkSession, root: String, increment: DataFrame,
      table: String = "signatures", batchKey: Option[String] = None): Batch = WriterLease.withLease(spark, root) {
    val path = s"$root/$table"
    // Recovery BEFORE the append: an ingest landing inside a crashed
    // compaction's delete-to-rename window would otherwise recreate the
    // snapshot dir with only this increment — and the recovery probe
    // below (readIndex), seeing dest present ∧ tmp present, would drop
    // the fully-staged fold as an abandoned stage: the corpus lost in
    // this very call.
    recoverState(spark, root, table)
    // Cache BEFORE the write so the append populates the cache and the
    // delta join below reads it back instead of re-scanning the text.
    val newCached = graft.CacheJanitor.register(signatures(increment).persist())
    BatchLog.append(newCached, path, batchKey, "SignatureIndex")
    val all = readIndex(spark, root, table)
    Batch(newCached, all, deltaPairs(all, newCached))
  }

  /** Live signature rows: the snapshot minus tombstoned doc_ids. Every
    * read path goes through this, so a removed doc stops contributing
    * postings, candidates, and exact-verify rows immediately — without
    * touching the append-only snapshot files. A pre-batch-format root is
    * refused here (its arrays predate the sorted-at-build contract the
    * intersect kernel needs) — [[migrateLegacy]] upgrades it in place. */
  def readIndex(spark: SparkSession, root: String, table: String = "signatures"): DataFrame = {
    recoverState(spark, root, table)
    Tombstones.exclude(BatchLog.read(spark, s"$root/$table", "SignatureIndex"), root, "doc_id")
  }

  /** Crash recovery alone (the compaction swap window) — for callers
    * that probe state without reading rows ([[DedupPipeline.health]]):
    * an existence probe during the swap window would otherwise misread
    * a fully-staged compaction as an empty index. */
  private[operators] def recoverState(spark: SparkSession, root: String,
      table: String = "signatures"): Unit =
    Tombstones.recoverCompaction(spark, root, s"$root/$table.__compact_tmp", s"$root/$table")

  /** One-time upgrade of a legacy flat-append root: re-sorts every
    * stored shingle array (pre-change rows were `array_distinct` order,
    * which the two-pointer kernel would silently miscount) and rewrites
    * into the batch-keyed layout with an atomic swap. */
  def migrateLegacy(spark: SparkSession, root: String, table: String = "signatures"): Unit =
    WriterLease.withLease(spark, root) {
      BatchLog.adoptLegacy(spark, s"$root/$table",
        _.select(col("doc_id"), sort_array(col("shs")).as("shs")))
    }

  /** Tombstone doc_ids out of the index. Appends to the side table only
    * — snapshot files stay byte-untouched (spec-pinned); the ids vanish
    * from [[readIndex]]/[[deltaPairs]] results from this call on.
    * Pair deltas ALREADY emitted in prior batches are the caller's
    * accumulated table, not index state — filter them there or rerun
    * `deltaPairs(all, all)` when retroactive exactness matters. */
  def remove(spark: SparkSession, root: String, ids: DataFrame): Unit = WriterLease.withLease(spark, root) {
    // Recovery first: a tombstone appended inside a crashed compaction's
    // swap window would be cleared when a later reader adopts the staged
    // fold (the adopt path drops the side table, whose removals the fold
    // already absorbed — this id's removal would vanish with them).
    recoverState(spark, root)
    Tombstones.append(root, ids, "doc_id")
  }

  def remove(spark: SparkSession, root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    remove(spark, root, ids.toDF("doc_id"))
  }

  /** Rewrite the snapshot minus tombstones and clear the side table.
    * After this the on-disk state is content-identical to a
    * from-scratch [[signatures]] build over the surviving docs
    * (spec-pinned) — the reference's full-refresh end state
    * (`src/warehousing_lambda.py:64-71`) at a schedule the operator
    * chooses instead of per takedown. */
  def compact(spark: SparkSession, root: String, table: String = "signatures"): Unit = WriterLease.withLease(spark, root) {
    val path = s"$root/$table"
    val tmp = s"$path.__compact_tmp"
    BatchLog.stageRewrite(readIndex(spark, root, table), path, tmp)
    Tombstones.commitCompaction(spark, root, tmp, path)
  }

  /** Near-dup pairs touching at least one `newSigs` doc: df-capped
    * posting-list equi-join (df over the FULL index, so the cap sees
    * global frequencies) → normalized distinct candidates → exact
    * Jaccard ≥ [[jaccardMin]] on full shingle sets. With
    * `newSigs == allSigs` this IS the from-scratch t35 pipeline. */
  def deltaPairs(allSigs: DataFrame, newSigs: DataFrame): DataFrame = {
    val post = allSigs.select(col("doc_id"), explode(col("shs")).as("h"))
    val keep = post.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select("h")
    val postF = post.join(keep, "h")
    val newPost = newSigs.select(col("doc_id").as("new_id"), explode(col("shs")).as("h"))
      .join(keep, "h")
    val cand = newPost.join(postF, "h")
      .where(col("new_id") =!= col("doc_id"))
      .select(least(col("new_id"), col("doc_id")).as("doc_a"),
        greatest(col("new_id"), col("doc_id")).as("doc_b"))
      .distinct()
    val sa = allSigs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"))
    val sb = allSigs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"))
    graft.functions.GraftFunctions.registerAll(allSigs.sparkSession)
    // Two-pointer kernel over the build-time-sorted sets (precondition
    // held by [[signatures]]); same count as size(array_intersect).
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("c", expr("graft_inter_count(shs_a, shs_b)"))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("shs_a")).cast("long") + size(col("shs_b")).cast("long") - col("c")).cast("double"))
      .where(col("jaccard") >= jaccardMin)
      .select("doc_a", "doc_b", "jaccard")
  }
}

package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The LLM-curation pipeline as a public API surface — the
  * training-data composition the kp1/kp2 keystones exercise:
  * language-ID → Gopher quality gate → exact-dedup keep-first →
  * per-(source, lang) token accounting. A user curating a corpus
  * calls [[report]] (batch) or replays the same semantics
  * continuously through `Streaming.availableNowCuration`, which
  * builds its static canonical-owner index from [[scored]] so the
  * two paths cannot drift.
  *
  * Scale posture (100 TB): [[scored]] computes EVERY derived column
  * in the scan-side projection and drops the text payload, so no
  * downstream shuffle carries document bodies; the dedup window
  * partitions on a content hash (md5), uniform by construction, so
  * the shuffle cannot skew however duplicated the corpus is.
  */
object Curation {

  /** Scan-side projection: (source, doc_id, lang_pred, n_tok, keep,
    * key). `keep` folds through when/otherwise so an empty text's
    * NULL symbol ratio lands at 0, matching the oracle's CASE. */
  def scored(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
      col("source"), col("doc_id"),
      Text.languageId(t).as("lang_pred"),
      Text.tokenCount(t).cast("long").as("n_tok"),
      when(Text.gopherKeep(t), 1).otherwise(0).as("keep"),
      md5(lower(t)).as("key"))
  }

  /** Batch curation report: one row per (source, lang_pred) with
    * docs_in / docs_quality / docs_kept / tok_kept / keep_pm.
    * The canonical owner is elected AMONG the quality survivors of a
    * content key (window partitioned by (key, keep), so rejected
    * rows never shadow a surviving duplicate) — the same election
    * the streaming side runs (`Streaming.availableNowCuration`
    * filters `keep === 1` before its min-id owner aggregate). Today
    * the quality gate is content-pure, so `keep` is constant within
    * a key and this collapses to the plain first-survivor pick; the
    * (key, keep) partition makes the batch/stream agreement hold
    * even for a future quality signal that reads non-content columns
    * (source reputation, fetch date). */
  def report(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("key", "keep").orderBy("doc_id")
    accounting(scored(docs)
        .withColumn("canon",
          (col("keep") === 1 && row_number().over(w) === 1).cast("int")))
      .orderBy("source", "lang_pred")
  }

  /** The per-(source, lang) accounting over a flagged frame (scored
    * columns + `canon`). ONE definition shared by [[report]] and the
    * streaming replay (`Streaming.availableNowCuration`) — the
    * aggregate list and the keep_pm rounding cannot drift between
    * the batch and continuous paths. */
  def accounting(flagged: DataFrame): DataFrame =
    flagged.groupBy("source", "lang_pred")
      .agg(count(lit(1)).as("docs_in"),
        sum("keep").cast("long").as("docs_quality"),
        sum("canon").cast("long").as("docs_kept"),
        sum(col("n_tok") * col("canon")).as("tok_kept"))
      .withColumn("keep_pm", expr("(1000 * docs_kept) div docs_in"))
}

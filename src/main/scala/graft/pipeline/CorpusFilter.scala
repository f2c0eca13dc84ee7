package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** The composition layer of the training-data story: a C4-style keep/drop
  * decision per document from the verified primitives — language-ID'd
  * metadata, length bounds, the composite quality score, and exact-dedup
  * canonicality — with per-criterion booleans kept in the output so a
  * curation run can report WHY each document dropped (the difference
  * between a filter and a black box at 100 TB).
  *
  * Plan shape: one narrow projection computes quality + fingerprint
  * map-side; the only shuffle is the window on the fingerprint (dedup
  * canonicality); every criterion is a codegen'd boolean on top. Scale
  * knob: the window's min-per-fp could be a pre-aggregated join at extreme
  * duplicate skew, but a fingerprint group is a duplicate cluster —
  * naturally small.
  */
object CorpusFilter {

  def apply(docs: DataFrame, minChars: Long = 80L, maxChars: Long = 10000L,
      minQuality: Double = 0.5): DataFrame = {
    val w = Window.partitionBy("fp")
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .withColumn("canonical_id", min("doc_id").over(w))
      // every flag coalesces null → false: a null lang, or an empty text
      // whose quality divisions are null, must surface as a DROPPED row
      // with its reason, never as keep=NULL (and never NPE a consumer
      // unboxing booleans)
      .select(col("doc_id"),
        coalesce(col("lang") =!= "xx", lit(false)).as("ok_lang"),
        coalesce(col("n_chars") >= minChars && col("n_chars") <= maxChars,
          lit(false)).as("ok_len"),
        coalesce(col("quality") >= minQuality, lit(false)).as("ok_quality"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .withColumn("keep",
        col("ok_lang") && col("ok_len") && col("ok_quality") && col("is_canonical"))
  }
}

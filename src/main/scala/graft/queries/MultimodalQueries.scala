package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.multimodal.Multimodal

/** Multimodal-column inventory: binary payload metadata (oracle-checked —
  * byte lengths and md5 over the same UTF-8 bytes) and the stub-codec
  * featurization path (rows-only: the codec stub is engine-side by design).
  */
object MultimodalQueries extends QueryModule {

  def queries: Map[String, QueryDef] = Map(

    // Binary-column metadata pass: octet length + content hash per payload,
    // rolled up by media kind. Bytes stay distributed; only scalars return.
    "q50_media_meta" -> QueryDef(
      (s, dir) =>
        Multimodal.mediaTable(Tables.documents(s, dir))
          .select(col("doc_id"), col("kind"),
            octet_length(col("bytes")).as("n_bytes"),
            md5(col("bytes")).as("payload_md5"),
            col("width"), col("height"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS payload_md5,
             |  cast(n_chars % 640 + 1 AS int) AS width,
             |  cast(n_chars % 480 + 1 AS int) AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Stub-codec featurization via typed mapPartitions (rows-only; the
    // decode stub's determinism is asserted in MultimodalSpec).
    "q51_media_features" -> QueryDef(
      (s, dir) =>
        Multimodal.featurize(s, Multimodal.mediaTable(Tables.documents(s, dir)))
          .toDF()
          .select(col("doc_id"), col("kind"), col("n_bytes"), col("avg_byte"),
            element_at(col("feat"), 1).as("f0"))
          .orderBy("doc_id")),

    // REAL image decode end-to-end: synthesize an actual PNG per document
    // (deterministic pixels from the text bytes), push the encoded binary
    // through the executor-side javax.imageio codec, emit exact pixel
    // statistics. Rows-only check (no SQL engine decodes PNG); the
    // pixel-exact decode values are pinned in MultimodalSpec against
    // hand-computed channel means.
    "q75_image_decode" -> QueryDef(
      (s, dir) =>
        Multimodal.featurize(s,
            Multimodal.syntheticPngTable(s, Tables.documents(s, dir)),
            Multimodal.ImageIoCodec)
          .toDF()
          .select(col("doc_id"), col("avg_byte").as("mean_luma"),
            element_at(col("feat"), 1).as("mean_r"),
            element_at(col("feat"), 2).as("mean_g"),
            element_at(col("feat"), 3).as("mean_b"),
            element_at(col("feat"), 4).cast("long").as("n_pixels"))
          .orderBy("doc_id")))
}

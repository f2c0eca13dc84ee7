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
          .orderBy("doc_id")),

    // REAL audio decode end-to-end: synthesize an actual PCM16 WAV tone
    // per document, parse the RIFF container executor-side, emit exact
    // sample statistics (RMS / zero-crossing rate / duration). Rows-only
    // (no SQL engine parses WAV); exact values pinned in MultimodalSpec.
    "q87_audio_features" -> QueryDef(
      (s, dir) =>
        Multimodal.featurize(s,
            Multimodal.syntheticWavTable(s, Tables.documents(s, dir)),
            Multimodal.WavCodec)
          .toDF()
          .select(col("doc_id"), col("avg_byte").as("mean_level"),
            element_at(col("feat"), 1).as("rms"),
            element_at(col("feat"), 2).as("zcr"),
            element_at(col("feat"), 3).as("duration_s"),
            element_at(col("feat"), 4).cast("long").as("n_samples"))
          .orderBy("doc_id")),

    // REAL multi-frame video decode: synthesize an actual animated GIF per
    // document (the one video container the JDK decodes), explode to
    // per-frame rows with mean luma + perceptual dHash, roll up per video.
    // Rows-only; exact frame counts/pixels pinned in MultimodalSpec.
    "q88_video_frames" -> QueryDef(
      (s, dir) =>
        Multimodal.videoFrames(s,
            Multimodal.syntheticGifTable(s, Tables.documents(s, dir)))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            countDistinct(col("frame_dhash")).as("n_distinct_frames"),
            min("mean_luma").as("min_luma"), max("mean_luma").as("max_luma"))
          .orderBy("doc_id")),

    // Audio near-dup: gain-invariant energy-delta fingerprints (the 1-D
    // dHash) over real WAV decode → the same Hamming cluster machinery.
    // Fixture duplicate texts yield byte-identical tones → real clusters.
    "q90_audio_near_dup" -> QueryDef(
      (s, dir) => {
        import graft.dedup.Dedup
        val fps = Multimodal.audioFingerprintTable(s,
          Multimodal.syntheticWavTable(s, Tables.documents(s, dir)))
        val pairs = Dedup.hammingClusterEdges(fps, "doc_id", "afp", maxHamming = 3)
        Dedup.connectedComponents(pairs, "id_a", "id_b")
          .toDF("doc_id", "cluster")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min("doc_id").as("exemplar"))
          .orderBy("cluster")
      }),

    // Video near-dup: shared-frame candidate join (exact frame-dHash
    // postings) → exact frame-set Jaccard → the same CC clustering as
    // text/image dedup — the full modality set now shares one pair/
    // cluster engine. Rows-only; planted-copy recall in MultimodalSpec.
    "q89_video_near_dup" -> QueryDef(
      (s, dir) => {
        import graft.dedup.Dedup
        val pairs = Multimodal.videoNearDup(s,
          Multimodal.syntheticGifTable(s, Tables.documents(s, dir)),
          threshold = 0.5)
        Dedup.connectedComponents(pairs, "id_a", "id_b")
          .toDF("doc_id", "cluster")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min("doc_id").as("exemplar"))
          .orderBy("cluster")
      }),

    // Perceptual-hash image near-dup: real PNG decode → 64-bit dHash →
    // the SAME Hamming chunk-blocking and connected-components machinery
    // as text dedup — one pair/cluster engine for every modality. The
    // fixture's duplicate text clusters yield pixel-identical PNGs, so
    // real clusters exist. Rows-only (hash is codec-specific); dHash
    // invariances and planted-near-dup recall are pinned in MultimodalSpec.
    "q85_image_near_dup" -> QueryDef(
      (s, dir) => {
        import graft.dedup.Dedup
        val hashes = Multimodal.dHashTable(s,
          Multimodal.syntheticPngTable(s, Tables.documents(s, dir)))
        // cluster edges, not the full pair list: identical dHashes (exact
        // duplicate media) collapse to representatives before blocking —
        // same components, distinct²-not-corpus² pair volume
        val pairs = Dedup.hammingClusterEdges(hashes, "doc_id", "dhash",
          maxHamming = 3)
        val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
          .toDF("doc_id", "cluster")
        clusters.groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min("doc_id").as("exemplar"))
          .orderBy("cluster")
      }))
}

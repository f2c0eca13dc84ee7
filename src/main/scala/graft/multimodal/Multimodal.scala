package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as typed
  * `mapPartitions` over the Dataset (the Scala-native analog of
  * `mapInPandas`) so each partition batches through the "codec" once.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * encoders — is real and tested. The codec itself is a clearly-marked
  * DETERMINISTIC STUB ([[decodeStub]]): the container ships no image/audio
  * libraries, so "decoding" derives fake-but-stable features from the raw
  * bytes. Swapping in a real codec changes only that one function.
  *
  * Scale notes: media bytes never hit the driver; featurization is a
  * narrow partition-local map (no shuffle); metadata lives in plain
  * columns so pruning/pushdown still work — a query over `width`/`kind`
  * never deserializes `bytes` (verified in PlanSpec: ReadSchema excludes
  * the binary column).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      avg_byte: Double, feat: Array[Double])

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of
    * the text (stand-in for an encoded image/audio blob), kind cycles
    * deterministically, dimensions derive from payload size.
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"))

  /** STUB codec — deterministic fake decode. A real deployment replaces
    * this with an actual image/audio decode (libs unavailable here); the
    * signature (bytes in, fixed-width features out) is the real contract.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Double, Array[Double]) = {
    if (bytes.isEmpty) (0.0, Array.fill(4)(0.0))
    else {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      val avg = sum.toDouble / bytes.length
      // 4 stable pseudo-features: avg, first, last, length-derived
      (avg, Array(avg / 255.0, (bytes(0) & 0xff) / 255.0,
        (bytes(bytes.length - 1) & 0xff) / 255.0,
        (bytes.length % 251) / 251.0))
    }
  }

  /** Partition-batched featurization: one "codec" pass per partition,
    * typed in/out (Dataset[MediaRow] → Dataset[MediaFeatures]).
    */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (avg, feat) = decodeStub(r.bytes)
        MediaFeatures(r.doc_id, r.kind, r.bytes.length, avg, feat)
      }
    }
  }

  /** Deterministic STUB resize: a real codec decodes → scales → re-encodes;
    * without media libraries the payload truncates proportionally to the
    * pixel-count ratio (so sizes behave like a real downscale) and the
    * metadata updates exactly. Pure column expressions — no shuffle, no
    * driver involvement, prunable metadata — which is the Spark-side
    * contract a real resize would inherit unchanged.
    */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame =
    media.select(col("doc_id"), col("kind"),
      // cap at the source length BEFORE the int cast: substring can never
      // extend anyway, and an extreme upscale ratio would otherwise
      // overflow the non-ANSI int cast into a wrapped (even negative)
      // length
      substring(col("bytes"), lit(1),
        greatest(lit(1), least(
          ceil(octet_length(col("bytes")).cast("double") * lit(newW.toDouble * newH) /
            (col("width").cast("double") * col("height").cast("double"))),
          octet_length(col("bytes")).cast("double"))
          .cast("int"))).as("bytes"),
      lit(newW).as("width"), lit(newH).as("height"))

  /** Deterministic frame sampling: n evenly-spaced fixed-size slices of the
    * payload (stand-in for video frame extraction) — pure column exprs.
    */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media.select(col("doc_id"), col("kind"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col("bytes"),
          (i * greatest(octet_length(col("bytes")) - frameBytes, lit(1))
            / lit(math.max(n - 1, 1)) + 1).cast("int"),
          lit(frameBytes)))).as(Seq("frame_idx", "frame")))
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns (SURVEY.md §2C): media as opaque `binary`
  * payloads + typed metadata, with the Spark-side plumbing — schema,
  * batch shape, partition-friendly transforms — fully real and the
  * codec boundary STUBBED (no image/audio libraries ship in this
  * environment).
  *
  * Layout convention:
  *   media(media_id BIGINT, kind STRING, payload BINARY,
  *         meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
  *
  * The decode stub is deterministic (byte-level features), so every
  * downstream stage — frame sampling, resize, feature extraction,
  * similarity over extracted vectors — is testable end-to-end today and
  * swaps to a real codec by replacing ONE function.
  */
object Multimodal {

  /** Deterministic synthetic media derived from `documents`: payload is
    * the UTF-8 text bytes, `kind` cycles image/audio/video, metadata is
    * sized from the payload. Stands in for `spark.read.format("binaryFile")`.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        // explicit floor: Spark's double→int cast truncates but DuckDB's
        // rounds, so the fractional division must never reach a cast
        (floor(length(col("text")) / lit(32.0)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB — codec boundary. A real deployment decodes the payload with
    * an image/audio library inside mapPartitions (one codec instance
    * per partition, never per row). Here: a deterministic 16-bin byte
    * histogram, L2-normalized — shaped exactly like an embedding so the
    * Similarity operators compose downstream.
    */
  def decodeToFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    // binary has no higher-order functions in Spark; the stub "decodes"
    // by charset-decoding and histogramming code points (deterministic,
    // byte-shaped). A real codec replaces `codes` with pixel/PCM values.
    val hist = expr(
      s"""transform(sequence(0, ${bins - 1}, 1), b ->
            size(filter(codes, cp -> CAST(cp % 256 / ${256 / bins} AS INT) = b)))""")
    media
      .withColumn("decoded", decode(col("payload"), "UTF-8"))
      .withColumn("codes",
        expr("transform(sequence(1, length(decoded)), i -> ascii(substring(decoded, i, 1)))"))
      .withColumn("hist", hist)
      .withColumn("norm", sqrt(aggregate(col("hist"),
        lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn("features",
        expr("transform(hist, h -> CAST(h AS DOUBLE) / norm)"))
      .select(col("media_id"), col("kind"), col("meta"), col("features"))
  }

  /** Frame sampling for video payloads: slice the byte stream into
    * fixed-size frames and keep every `stride`-th — pure array ops, one
    * narrow pass, no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"""filter(
                transform(sequence(0, CAST(length(payload) / $frameBytes AS INT) - 1),
                          i -> named_struct('idx', i, 'frame', substring(payload, i * $frameBytes + 1, $frameBytes))),
                f -> f.idx % $stride = 0)""")).as(Seq("pos", "f")))
      .select(col("media_id"), col("f.idx").as("frame_idx"), col("f.frame").as("frame"))

  /** STUB — resize boundary: truncate/zero-pad frames to a target size
    * (a real impl resamples pixels/samples; the batch shape is what
    * matters for the pipeline).
    */
  def resizeFrames(frames: DataFrame, targetBytes: Int = 16): DataFrame =
    frames.withColumn("resized",
      expr(s"substring(concat(frame, CAST(repeat(CHR(0), $targetBytes) AS BINARY)), 1, $targetBytes)"))

  /** End-to-end demo: media → features → cosine-nearest media pairs
    * (reuses the Similarity cosine over the extracted features).
    */
  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    decodeToFeatures(syntheticMedia(spark, dir))
      .filter(col("media_id") < 50)
      .select(col("media_id"), col("kind"),
        col("meta.n_frames").as("n_frames"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"))
      .orderBy(col("media_id"))
}

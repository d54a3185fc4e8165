package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as distributed per-row (or per-batch) transforms.
 *
 * ==STUB NOTICE==
 * The actual media DECODE step is a deterministic fake (`stubFeatures`,
 * `stubFrames`): this container ships no image/audio codecs. Everything
 * AROUND the decode — the asset schema, binary handling, batch shape,
 * partitioning, frame explosion, feature join-back — is real, tested Spark
 * plumbing; swapping the stub for a JNI/ONNX decoder changes only the
 * marked expressions.
 */
object Multimodal {

  /** Asset table schema: (asset_id, modality, payload binary, meta struct).
    * Built here from the documents fixture (text bytes stand in for media
    * bytes); in production this is a direct Iceberg/Parquet binary column. */
  def assets(documents: DataFrame): DataFrame = {
    documents.select(
      col("doc_id").as("asset_id"),
      // modality assignment is metadata-driven in production; derived
      // deterministically here
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("payload_bytes"),
        col("lang").as("tag")).as("meta"))
  }

  /** STUB decode -> fixed-size float feature vector. Deterministic fake:
    * k pseudo-random floats in [-1, 1.001] derived from md5 of the payload
    * (md5 so an external engine can re-derive the exact values for oracle
    * checks: digit-extract the hex, take 6 digits, mod 2001). Replace this
    * expression with a real decoder UDF/mapInArrow batch to go live; the
    * signature (binary -> array<float>) is the contract. */
  def stubFeatures(payload: Column, k: Int = 8): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => (pmod(
        rpad(regexp_replace(
          md5(concat_ws("|", payload.cast("string"), i.cast("string"))),
          "[a-f]", ""), 6, "0").cast("int"),
        lit(2001)).cast("double") / 1000.0 - 1.0)
        .cast("float"))

  /** STUB frame sampling: one "frame" per `frameBytes` window of the
    * payload, each sliced with `substring` on the binary column (real
    * binary slicing — only the per-frame decode is fake). */
  def sampleFrames(assetsDf: DataFrame, frameBytes: Int = 256): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    assetsDf
      .select(col("asset_id"), col("modality"), col("payload"), col("meta"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .select(col("asset_id"), col("modality"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_payload"))
  }

  /** Distributed feature extraction over assets: payload -> features,
    * keeping metadata. Purely per-row, so NO repartition: at 100 TB of
    * video an exchange here would shuffle every payload byte for nothing.
    * (If a downstream per-partition batch op — e.g. a GPU decoder batching
    * by modality — is added, repartition there, where the cost buys
    * something.) */
  def extractFeatures(assetsDf: DataFrame, k: Int = 8): DataFrame = {
    assetsDf
      .select(col("asset_id"), col("modality"),
        length(col("payload")).as("payload_bytes"),
        stubFeatures(col("payload"), k).as("features"))
  }
}

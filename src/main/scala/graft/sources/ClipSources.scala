package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.ClipRow

/** Clip-table sources beyond parquet (SURVEY S1/S2: the reference ingests
  * base64-encoded media inside JSON uploads, `Backend/app.py:50-62` — the
  * batch analog is JSONL/CSV files with a base64 `bytes_b64` column).
  * Decoding uses the built-in `unbase64` expression (codegen'd), so the
  * scan stays a single narrow stage whatever the wire format.
  */
object ClipSources {

  /** Text-format schema: binary travels base64-encoded. */
  val wireSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("bytes_b64", StringType, nullable = true),
    StructField("sr_hz", IntegerType, nullable = false),
    StructField("dur_ms", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("transcript", StringType, nullable = true)
  ))

  private def decodeWire(df: DataFrame): Dataset[ClipRow] = {
    import df.sparkSession.implicits._
    df.select(
        col("clip_id"),
        unbase64(coalesce(col("bytes_b64"), lit(""))).as("bytes"),
        col("sr_hz"), col("dur_ms"), col("codec"),
        coalesce(col("transcript"), lit("")).as("transcript"))
      .as[ClipRow]
  }

  /** JSONL source: one JSON object per line, bytes base64 in `bytes_b64`. */
  def readJsonl(spark: SparkSession, paths: Seq[String]): Dataset[ClipRow] =
    decodeWire(spark.read.schema(wireSchema).json(paths: _*))

  /** Headered CSV source, bytes base64 in `bytes_b64`. RFC-4180 quoting
    * (escape = quote-doubling): transcripts legitimately contain backslashes
    * and commas, and Spark's default backslash-escape mangles them. */
  def readCsv(spark: SparkSession, paths: Seq[String]): Dataset[ClipRow] =
    decodeWire(spark.read.schema(wireSchema)
      .option("header", "true").option("escape", "\"").csv(paths: _*))

  /** Encode a clips frame to the base64 wire shape (test/export helper).
    * Spark's `base64` emits MIME-chunked output with embedded CRLF line
    * breaks, which would shred line-oriented wire formats — strip them
    * (decoders ignore whitespace either way). */
  def toWire(clips: Dataset[ClipRow]): DataFrame =
    clips.select(
      col("clip_id"),
      regexp_replace(base64(col("bytes")), "[\\r\\n]", "").as("bytes_b64"),
      col("sr_hz"), col("dur_ms"), col("codec"), col("transcript"))
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-binary ingestion (SURVEY.md §2.1 multimodal source row):
  * Spark's `binaryFile` format is the scale path for media blobs —
  * each file becomes (path, modificationTime, length, content: binary),
  * the scan parallelizes over files like any other file source, and
  * decode happens downstream as a column transform over the binary
  * column (graft.operators.Multimodal). Here corpus documents stand in
  * for media files: deterministic bytes with an exact oracle (UTF-8
  * byte length vs DuckDB strlen).
  */
object BinaryMedia {

  /** Materialize each document's text as `<doc_id>.txt` (UTF-8) under
    * `dir` — a deterministic stand-in for a media dropbox. Driver-side
    * fixture WRITER (test scaffolding, not the operator under test; at
    * scale the files already exist — that is the point of the source). */
  def writeDocFiles(docs: DataFrame, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      Files.write(Paths.get(dir, s"${r.getLong(0)}.txt"),
        r.getString(1).getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Binary-file scan: one row per file with the raw bytes. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** (doc_id, n_bytes) from the binary scan — the id parsed from the
    * file name, the size measured on the CONTENT column (not file
    * metadata), so the bytes really flowed through the plan. */
  def docByteSizes(spark: SparkSession, dir: String): DataFrame =
    readBinaryDir(spark, dir)
      .select(regexp_extract(col("path"), "(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
        length(col("content")).cast("long").as("n_bytes"))
}

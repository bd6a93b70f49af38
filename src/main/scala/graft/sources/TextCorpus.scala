package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's actual input model: a directory of plain-text files
  * (`./RawText/`, map_reduce.cpp:477-495), whitespace-tokenized per
  * stream (:159). Spark's file index replaces the hand-rolled
  * opendir/readdir + MPI file dispatch: listing, splitting, locality
  * and dynamic scheduling are the task scheduler's job.
  */
object TextCorpus {

  /** One row per line, with the source file path — the scan half of
    * the reference pipeline. */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.textFile(s"$dir/*").toDF("value")
      .withColumn("path", input_file_name())

  /** A documents-shaped table (doc per file) from a raw text dir:
    * doc_id = hash of path, text = the file's full content. Lets every
    * documents operator (wordcount, dedup, quality) run off raw text
    * exactly as the reference consumed it.
    *
    * `wholetext` reads each file as ONE record, so text is byte-exact
    * and deterministic — the previous groupBy + collect_list rebuild
    * had shuffle-order-dependent line order, which silently broke
    * order-sensitive downstreams (shingles, rolling-hash fingerprints)
    * across runs. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*")
      .withColumn("path", input_file_name())
      .withColumn("doc_id", xxhash64(col("path")))
      .select(col("doc_id"), col("value").as("text"), col("path"))

  /** The reference's 8x file-replay workload (LOOP_OVER_DIRECTORY,
    * map_reduce.cpp:36, 130) reproduced at the source level. */
  def readLinesX(spark: SparkSession, dir: String, replay: Int): DataFrame =
    readLines(spark, dir)
      .crossJoin(broadcast(spark.range(replay).select(col("id").as("replay_i"))))
}

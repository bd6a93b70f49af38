package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output contracts. The one the reference defines (map_reduce.cpp:
  * 440-450): each word owned by exactly one output partition, each
  * partition internally sorted, formatted `<word, count> `. The global
  * result is the concatenation of the part files.
  */
object Sinks {

  /** Partitioned sorted sink: hash-partition on `key` into n files,
    * sort within each — the exact contract of
    * Process_<pid>_Output_File.txt (ownership via hashpartitioning
    * instead of the reference's affine char-sum hash; final counts are
    * hash-independent, SURVEY.md §2.2). */
  def partitionedSortedText(df: DataFrame, key: String, n: Int, outPath: String,
                            format: Column): Unit =
    df.repartition(n, col(key))
      .sortWithinPartitions(key)
      .select(format.as("value"))
      .write.mode("overwrite").text(outPath)

  /** The reference's exact line format `<word, count> `. */
  def referenceLineFormat(word: String = "word", cnt: String = "cnt"): Column =
    concat(lit("<"), col(word), lit(", "), col(cnt), lit("> "))

  /** Columnar sink for engine-to-engine handoff. */
  def writeParquet(df: DataFrame, outPath: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(outPath)
  }

  /** CSV sink with header — interchange with the DuckDB/pandas world. */
  def writeCsv(df: DataFrame, outPath: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(outPath)
}

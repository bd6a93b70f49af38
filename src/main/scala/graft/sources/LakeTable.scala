package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ChangeData

/** A minimal transactional copy-on-write table — the composition the
  * shipped halves were building toward: CDC MERGE (ChangeData
  * .mergeApply), per-file min/max statistics (StatsManifest.statsOf),
  * size-governed compaction (the Sinks.writeCompacted dials) and
  * immutable versioned snapshots with time-travel reads (the
  * EventStreams latest-image version-dir device), run as ONE commit.
  * This is the Delta/Iceberg posture from nothing but parquet and a
  * manifest:
  *
  * {{{
  * tableDir/
  *   files/c0/part-*.parquet   immutable data files born in commit 0
  *   files/c1/part-*.parquet   files REWRITTEN by commit 1
  *   v000000000/_manifest/     snapshot 0: its file list + stats
  *   v000000001/_manifest/     snapshot 1: carried + rewritten files
  * }}}
  *
  * A snapshot IS its manifest: one row per data file with the file's
  * key interval and row count. Committing a change batch rewrites only
  * the files whose key interval contains a change key — every other
  * file is carried into the new snapshot BY REFERENCE (its manifest
  * row copied verbatim, its bytes untouched, its stats NOT recomputed).
  * Old snapshots stay readable until a vacuum deletes unreferenced
  * commit dirs.
  *
  * Why this is the 100 TB shape: the three per-commit costs all track
  * the CHANGE, not the table — the merge reads touched files only
  * (manifest range pruning against the batch's keys), the stats pass
  * reads the rewritten files only ([[StatsManifest.appendClustered]]'s
  * incremental contract), and the snapshot write is one file-count-
  * sized manifest. A full-table pass per commit — what the overwrite-
  * only writer did — appears nowhere.
  */
object LakeTable {

  /** What a commit did, for callers and specs: how many data files the
    * new snapshot rewrote (== what the merge read and the stats pass
    * scanned) vs carried by reference. */
  final case class Commit(version: Long, filesRewritten: Long, filesCarried: Long)

  private def vDir(tableDir: String, v: Long) = f"$tableDir/v$v%09d"
  private def manifestDir(tableDir: String, v: Long) = s"${vDir(tableDir, v)}/_manifest"
  private def commitDir(tableDir: String, v: Long) = s"$tableDir/files/c$v"

  private def listFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted

  /** Snapshot versions present, ascending (zero-padded dir names make
    * lexicographic = numeric, same device as the CDC latest-image). */
  def versions(tableDir: String): Seq[Long] =
    Option(new java.io.File(tableDir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toLong).toOption)
      .sorted

  /** Create the table: cluster the seed data on the key (range
    * partition + in-file sort, so file key-intervals are disjoint and
    * commit-time pruning bites), stat the files, snapshot as v0. */
  def init(df: DataFrame, tableDir: String, keyCol: String, nFiles: Int): Commit = {
    require(versions(tableDir).isEmpty, s"LakeTable.init needs a fresh tableDir: $tableDir")
    val spark = df.sparkSession
    df.repartitionByRange(nFiles, col(keyCol)).sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(commitDir(tableDir, 0L))
    val files = listFiles(commitDir(tableDir, 0L))
    StatsManifest.statsOf(spark, files, Seq(keyCol))
      .coalesce(1).write.mode("overwrite").parquet(manifestDir(tableDir, 0L))
    Commit(0L, files.size.toLong, 0L)
  }

  def manifest(spark: SparkSession, tableDir: String, v: Long): DataFrame =
    spark.read.parquet(manifestDir(tableDir, v))

  /** Time-travel read: the file list of snapshot `v`, whatever commits
    * happened since. File-count-sized driver collect — the same scale
    * class as Spark's own file index (and StatsManifest.scanPruned). */
  def readVersion(spark: SparkSession, tableDir: String, v: Long): DataFrame = {
    val files = manifest(spark, tableDir, v).select(col("file"))
      .collect().map(_.getString(0))
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  def readLatest(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir, versions(tableDir).last)

  /** Apply a CDC batch (key, op ∈ upsert|delete, payload — the
    * ChangeData.mergeApply contract, NULL payload keeps the base
    * value) as one transactional commit:
    *
    *  1. prune: a data file is TOUCHED iff its [min_key, max_key]
    *     interval contains some change key — an interval join of the
    *     batch's distinct keys against the file-count-sized manifest;
    *     untouched files provably hold no change key, so skipping them
    *     is exact, not heuristic;
    *  2. merge: full-outer coalesce of the touched files' rows with the
    *     batch (inserts materialize change-side-only; deletes drop);
    *  3. compact: survivors + inserts land re-clustered on the key in
    *     ⌈rows/targetRowsPerFile⌉ files with a maxRecordsPerFile
    *     ceiling — the writeCompacted small-file governance;
    *  4. re-stat: ONLY the files written in step 3;
    *  5. snapshot: carried manifest rows (verbatim) ∪ new stats rows →
    *     v+1. Readers of v keep an immutable view throughout.
    */
  def commitMerge(changes: DataFrame, tableDir: String, keyCol: String,
                  targetRowsPerFile: Long, opCol: String = "op"): Commit = {
    val spark = changes.sparkSession
    val v = versions(tableDir).last
    val m = manifest(spark, tableDir, v)
    val keys = changes.select(col(keyCol).as("__k")).distinct()
    val touched = m.join(keys,
        col(s"min_$keyCol") <= col("__k") && col(s"max_$keyCol") >= col("__k"), "left_semi")
      .select(col("file")).collect().map(_.getString(0)).toSet
    val allFiles = m.select(col("file")).collect().map(_.getString(0))

    val base =
      if (touched.nonEmpty) spark.read.parquet(touched.toIndexedSeq: _*)
      else spark.read.parquet(allFiles.head).where(lit(false)) // schema-only: all inserts
    val merged = ChangeData.mergeApply(
      base.drop(opCol), changes, keyCol, opCol)

    val next = v + 1
    val rows = merged.count()
    val newFiles =
      if (rows == 0L) Seq.empty[String]
      else {
        val nFiles = math.max(1L, math.ceil(rows.toDouble / targetRowsPerFile).toLong).toInt
        merged.repartitionByRange(nFiles, col(keyCol)).sortWithinPartitions(keyCol)
          .write.mode("overwrite").option("maxRecordsPerFile", targetRowsPerFile)
          .parquet(commitDir(tableDir, next))
        listFiles(commitDir(tableDir, next))
      }
    val carried =
      if (touched.isEmpty) m
      else m.where(!col("file").isin(touched.toSeq: _*))
    val nextManifest =
      if (newFiles.isEmpty) carried
      else carried.unionByName(StatsManifest.statsOf(spark, newFiles, Seq(keyCol)))
    nextManifest.coalesce(1).write.mode("overwrite").parquet(manifestDir(tableDir, next))
    Commit(next, newFiles.size.toLong, (allFiles.length - touched.size).toLong)
  }
}

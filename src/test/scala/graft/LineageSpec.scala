package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Similarity}
import graft.plans.Lineage

/** The reliable-checkpoint seam (VERDICT r11 #3): every iterative
  * operator truncates per-round lineage via Lineage.truncate, which is
  * localCheckpoint on local mode and reliable checkpoint() when
  * `spark.graft.checkpointDir` is set — this spec proves the two paths
  * are value-identical AND that the reliable path really writes
  * recovery blocks to the directory. */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withCheckpointDir[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try body(dir)
    finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("truncate: local path without the conf, reliable path with it") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(Lineage.truncate(df).collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
    withCheckpointDir { dir =>
      val out = Lineage.truncate(df)
      assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
      // the reliable path must have materialized RDD blocks on disk
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).exists(_.isFile),
        s"no checkpoint files written under $dir")
    }
  }

  test("one-shot pins (non-loop operators) are value-identical across both truncation paths") {
    // round 13: the ~80 single-shot relation pins (shared subplans
    // consumed twice+) route through the same seam as the loops — a
    // non-loop operator must answer identically under the reliable
    // path too. minhashNearDups pins its shingle table; bm25 pins its
    // term frequencies.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val localDups = graft.operators.Dedup.minhashNearDups(docs).collect().toSet
    val localBm25 = graft.operators.Retrieval.bm25TopK(docs, Seq("the", "data"), 10).collect().toSet
    withCheckpointDir { _ =>
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      // the SparkContext's checkpoint dir is pinned by the FIRST
      // reliable truncate of the session (truncate only sets it when
      // empty) — count files in the dir actually in effect, not the
      // per-test conf value
      def effectiveFiles(): Int = spark.sparkContext.getCheckpointDir
        .map(d => files(new java.io.File(new java.net.URI(d).getPath)).count(_.isFile))
        .getOrElse(0)
      val before = effectiveFiles()
      assert(graft.operators.Dedup.minhashNearDups(docs).collect().toSet === localDups)
      assert(graft.operators.Retrieval.bm25TopK(docs, Seq("the", "data"), 10).collect().toSet === localBm25)
      assert(effectiveFiles() > before,
        "one-shot pins wrote no reliable checkpoint files")
    }
  }

  test("pageRank and kmeans are value-identical across both truncation paths") {
    val edges = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select((col("doc_id") % 40).as("src"), ((col("doc_id") * 7 + 3) % 40).as("dst"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val localRank = Graph.pageRank(edges, iters = 3).collect().toSet
    val localKm = Similarity.kmeans(emb, k = 4, iters = 2).collect().toSet
    withCheckpointDir { _ =>
      assert(Graph.pageRank(edges, iters = 3).collect().toSet === localRank)
      assert(Similarity.kmeans(emb, k = 4, iters = 2).collect().toSet === localKm)
    }
  }
}

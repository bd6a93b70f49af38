package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextOps}

/** Artifact regeneration tool: learn the frozen BPE merge table +
  * alphabet from a corpus and write the classpath resource
  * [[graft.operators.Bpe.DefaultMerges]] loads. Run when the corpus
  * generation changes:
  *
  *   sbt "runMain graft.tools.LearnBpe /root/testdata/sf0.01 src/main/resources/graft/bpe_merges.txt 600"
  *
  * The merge budget is a CAP — the learner stops at saturation (no
  * pair left to merge), which on a closed toy vocabulary arrives well
  * before a production-size budget. The alphabet line records every
  * codepoint of the cleaned lowercased token stream; codepoints
  * outside it take the applier's `<0xHH>` byte fallback. */
object LearnBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("src/main/resources/graft/bpe_merges.txt")
    val numMerges = args.lift(2).map(_.toInt).getOrElse(600)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir).documents
    val merges = Bpe.learnMerges(docs, numMerges)
    val alphabet = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .select(explode(split(lower(col("tok")), "")).as("ch"))
      .where(length(col("ch")) > 0)
      .distinct().orderBy("ch")
      .collect().map(_.getString(0))
    spark.stop()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try {
      w.println(s"# graft BPE artifact: learned from $sfDir documents by graft.tools.LearnBpe")
      w.println(s"# merge budget $numMerges, learned ${merges.length} (saturation caps a closed vocab)")
      w.println(s"alphabet\t${alphabet.mkString}")
      merges.foreach { case (l, r) => w.println(s"$l\t$r") }
    } finally w.close()
    println(s"wrote ${merges.length} merges + ${alphabet.length}-char alphabet to $out")
  }
}

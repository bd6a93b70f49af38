package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** The CONTINUOUS twin of the ANN index append path: embedding batches
  * arriving as a file stream, each micro-batch folded into the
  * PERSISTED IVF×PQ index under frozen geometry, with the drift
  * decision recorded per batch — the three shipped pieces
  * (Similarity.ivfPqEncodeBatch / appendDrift / the persisted index
  * layout) run as one streaming lifecycle.
  *
  * Exactly-once discipline, the IngestPipeline devices:
  *  - a batch's cells and codes land in batch-keyed subdirs
  *    (`cells/b<id>/`, `codes/b<id>/`) and OVERWRITE them on replay —
  *    a re-delivered batch reproduces its commit instead of doubling
  *    the index; [[Similarity.ivfPqReadGrown]] reads seed + batches as
  *    one relation;
  *  - the drift decision is computed against the BUILD-TIME baseline
  *    (persisted next to the index) and appended batch-keyed too, so
  *    the rebuild trigger's history is replay-stable.
  *
  * Scale shape per micro-batch: one broadcast coarse assignment + one
  * residual encode over the BATCH (index-size-independent — the
  * index's own cells/codes are never read by the append), plus one
  * more broadcast assignment for the drift energies. The expensive
  * path — the retrain [[Similarity.ivfPqMaintain]] runs inline in
  * batch mode — is deliberately NOT taken inside a micro-batch: the
  * decision table tells the offline maintainer when to rebuild, which
  * is how a streaming ingest must treat a corpus-sized operation.
  */
object VectorIngest {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def readVecStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** One micro-batch: encode under frozen geometry, land batch-keyed,
    * record the drift decision. Exposed so the spec can replay a batch
    * verbatim and prove idempotence. */
  def annIngestBatch(batch: DataFrame, batchId: Long, indexDir: String,
                     m: Int = 16, dim: Int = 64, threshold: Double = 1.5,
                     minBatchPerCell: Long = 4L): Unit = {
    val ss = batch.sparkSession
    // one-file micro-batch = one scan task: fan out before the
    // broadcast assignment + residual encode (IngestPipeline.fanOut)
    val batchP = IngestPipeline.fanOut(batch, "vec_id")
    val index = Similarity.ivfPqReadGrown(ss, indexDir, m, dim)
    val (cellsNew, codesNew) = Similarity.ivfPqEncodeBatch(index, batchP)
    cellsNew.write.mode("overwrite").parquet(s"$indexDir/cells/b$batchId")
    codesNew.write.mode("overwrite").parquet(s"$indexDir/codes/b$batchId")
    Similarity.appendDrift(index, ss.read.parquet(s"$indexDir/baseline"),
        batchP, threshold, minBatchPerCell)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$indexDir/drift/b$batchId")
  }

  /** Drain a bounded vector-drop dir into the index; returns the drift
    * decision history (batch_id, cell, n_batch, drift_ratio, rebuild). */
  def runAnnIngest(spark: SparkSession, srcDir: String, indexDir: String,
                   m: Int = 16, dim: Int = 64, threshold: Double = 1.5,
                   minBatchPerCell: Long = 4L): DataFrame = {
    val q = readVecStream(spark, srcDir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        annIngestBatch(batch.toDF(), batchId, indexDir, m, dim, threshold, minBatchPerCell)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // a drain that found nothing to drain is a no-op, not an error:
    // with zero micro-batches the drift dir was never created
    if (new java.io.File(s"$indexDir/drift").exists())
      spark.read.option("recursiveFileLookup", "true").parquet(s"$indexDir/drift")
    else spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("cell", LongType), StructField("n_batch", LongType),
        StructField("drift_ratio", DoubleType), StructField("rebuild", BooleanType),
        StructField("batch_id", LongType))))
  }
}

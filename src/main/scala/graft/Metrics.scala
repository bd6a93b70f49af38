package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability (SURVEY.md §4.2 "Instrumentation" row): the
  * reference hand-rolls per-stage `MPI_Wtime` timers, a critical-section
  * timer, and an MPI-reduced averaged report (map_reduce.cpp:456,
  * 219-231, 597-613). The Spark-native analog reads the SQLMetrics the
  * engine already maintains on every physical operator — scan rows,
  * shuffle volume, spill — instead of timing stages by hand, and a
  * QueryExecutionListener makes the capture ambient: every action on
  * the session is summarized with zero per-query instrumentation code.
  *
  * At 100 TB this is the difference between "the job is slow" and
  * "stage 7 shuffled 40 TB because the broadcast threshold was missed":
  * shuffle bytes, spill, and exchange counts are the quantities that
  * predict cluster behavior, and they come from the same accumulators
  * the Spark UI renders.
  */
object Metrics {

  /** One executed query, summarized from its physical plan's metrics. */
  final case class QuerySummary(
      funcName: String,
      durationMs: Long,
      outputRows: Long,          // root operator's numOutputRows (-1 if absent)
      scanRows: Long,            // Σ leaf scan numOutputRows
      shuffleRecordsWritten: Long,
      shuffleBytesWritten: Long,
      spillBytes: Long,          // Σ spillSize (sorts/aggs that hit disk)
      shuffleExchanges: Int,     // distinct shuffle exchange operators
      codegenSpans: Int) {       // whole-stage-codegen regions (wider = better)
    def jsonLine: String =
      s"""{"func":"$funcName","duration_ms":$durationMs,"output_rows":$outputRows,""" +
        s""""scan_rows":$scanRows,"shuffle_records":$shuffleRecordsWritten,""" +
        s""""shuffle_bytes":$shuffleBytesWritten,"spill_bytes":$spillBytes,""" +
        s""""exchanges":$shuffleExchanges,"codegen_spans":$codegenSpans}"""
  }

  /** Every node of the executed tree, descending through the AQE
    * wrappers (AdaptiveSparkPlanExec and materialized query stages are
    * leaves to the normal `collect`). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    p +: children.flatMap(allNodes)
  }

  private def metric(p: SparkPlan, name: String): Long =
    p.metrics.get(name).map(_.value).getOrElse(0L)

  /** Summarize an executed query. Call AFTER an action has run; metric
    * values are whatever the accumulators hold at call time. */
  def summarize(qe: QueryExecution, funcName: String = "", durationNs: Long = 0L): QuerySummary = {
    val nodes = allNodes(qe.executedPlan)
    val scans = nodes.filter(_.isInstanceOf[org.apache.spark.sql.execution.LeafExecNode])
      .filterNot(n => n.isInstanceOf[AdaptiveSparkPlanExec] || n.isInstanceOf[QueryStageExec])
    QuerySummary(
      funcName = funcName,
      durationMs = durationNs / 1000000L,
      outputRows = qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
      scanRows = scans.map(metric(_, "numOutputRows")).sum,
      shuffleRecordsWritten = nodes.map(metric(_, "shuffleRecordsWritten")).sum,
      shuffleBytesWritten = nodes.map(metric(_, "shuffleBytesWritten")).sum,
      spillBytes = nodes.map(metric(_, "spillSize")).sum,
      shuffleExchanges = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      codegenSpans = nodes.count(_.isInstanceOf[WholeStageCodegenExec]))
  }

  /** Convenience: summarize the plan behind an already-acted-on
    * DataFrame. */
  def of(df: DataFrame): QuerySummary = summarize(df.queryExecution)

  /** Ambient capture: summaries accumulate for every action on the
    * session until the listener is removed. Callbacks arrive on the
    * listener bus (asynchronously, shortly after the action returns) —
    * poll `snapshot` when reading right after an action. */
  final class Recorder extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[QuerySummary]
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.add(summarize(qe, funcName, durationNs))
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def snapshot: Seq[QuerySummary] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()
  }

  /** Install a recorder on the session; pair with `uninstall`. */
  def install(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  def uninstall(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)
}

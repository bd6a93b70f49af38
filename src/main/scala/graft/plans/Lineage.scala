package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, HITS, LPA,
  * k-core, star components, k-means, MMR): each round's result must
  * cut its plan lineage or the optimizer re-analyzes a plan that
  * doubles per iteration. `localCheckpoint` (non-replicated executor
  * blocks) is the right local[32] default — zero I/O — but on a real
  * cluster one lost executor kills a 20-round job with no
  * recomputation path, because the truncated lineage IS the recovery
  * story. The operability seam: when `spark.graft.checkpointDir` is
  * set, rounds persist via RELIABLE `checkpoint()` to that directory
  * instead, so the job survives executor loss at the cost of one
  * write per round (iterated state is |V|-sized for every operator
  * here, never the corpus). Both paths are value-identical —
  * LineageSpec proves it by toggling the conf.
  */
object Lineage {

  /** Truncate `df`'s lineage: reliable `checkpoint()` when
    * `spark.graft.checkpointDir` is set (the first call pins the
    * SparkContext's checkpoint dir), eager `localCheckpoint()`
    * otherwise. */
  def truncate(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    ss.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = ss.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Postfix form, so call sites keep the `.localCheckpoint(true)`
    * shape: `edges.truncateLineage`. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage: DataFrame = truncate(df)
  }
}

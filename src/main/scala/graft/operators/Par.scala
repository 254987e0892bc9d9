package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.DataFrame

/** Concurrent eager materialization of INDEPENDENT intermediate frames
  * (optimization guide §2.6): Spark's scheduler happily runs several
  * jobs at once inside one application — actions are only sequential
  * because the driver calls them sequentially. A query whose result
  * consumes two independent expensive subframes (q338's two catch
  * pipelines, q301's truth + triage sides, q139's candidate + truth
  * sides) pays SUM-of-walls when it checkpoints them one by one;
  * submitting the localCheckpoints from a small thread pool pays
  * MAX-of-walls, with the later jobs' tasks back-filling executor
  * slots the earlier jobs' stage tails leave idle. The same shape
  * holds on a cluster at 100 TB — this is scheduling, not a local
  * core-count tune.
  *
  * Semantics are unchanged: each frame is the same eager
  * localCheckpoint it was before, just submitted concurrently.
  * Failures propagate (Await rethrows), so an error in any branch
  * still fails the query loudly.
  */
private[graft] object Par {

  /** Eagerly localCheckpoint every frame, all in flight at once.
    * Returns the checkpointed frames in input order. */
  def checkpointAll(dfs: DataFrame*): Seq[DataFrame] = {
    if (dfs.sizeIs <= 1) dfs.map(_.localCheckpoint(true)).toSeq
    else {
      val pool = Executors.newFixedThreadPool(dfs.size)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      try {
        val fs = dfs.map(df => Future(df.localCheckpoint(true)))
        fs.map(Await.result(_, Duration.Inf)).toSeq
      } finally pool.shutdown()
    }
  }
}

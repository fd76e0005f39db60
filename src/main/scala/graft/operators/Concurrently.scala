package graft.operators

/** Run INDEPENDENT pipeline actions as concurrent Spark jobs.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; a pipeline step that builds N derived artifacts from
  * the same snapshot serializes only because the driver calls the N
  * actions sequentially — each small job's tail then leaves most of
  * the cluster idle. Submitting them from a pool lets the next build's
  * tasks back-fill executors freed by the current build's stragglers
  * (FIFO scheduling gives exactly the back-fill behavior wanted).
  *
  * Contract: the actions MUST touch disjoint state (separate output
  * directories / separate tables). Results are unchanged by
  * construction — this reorders nothing within an action, only
  * overlaps actions that had no ordering constraint to begin with.
  * Failures propagate: the first failed action's exception is
  * rethrown after the await.
  */
object Concurrently {
  def run(actions: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(actions.map(a => Future(a()))), Duration.Inf): Unit
  }
}

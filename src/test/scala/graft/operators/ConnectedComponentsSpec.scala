package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

import scala.collection.mutable
import scala.util.Random

class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sess = spark
    import sess.implicits._
    ConnectedComponents
      .label(pairs.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  /** Driver-side union-find reference. */
  private def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain, clique, and isolated pair label to the component minimum") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain -> min 1
      (10L, 11L), (10L, 12L), (11L, 12L), // clique -> min 10
      (20L, 21L) // pair -> min 20
    )
    val labels = cc(pairs)
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L
    ))
  }

  test("agrees with a union-find reference on a seeded random graph") {
    val rnd = new Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(pairs) == reference(pairs))
  }

  test("long path converges within the iteration budget") {
    // a 30-node path (diameter 29) fits the default 50-round budget;
    // every node must reach label 0
    val path = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val labels = ConnectedComponents
      .label({ val sess = spark; import sess.implicits._; path.toDF("a", "b") }, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels.values.toSet == Set(0L))
  }

  test("exceeding the iteration budget throws instead of returning wrong labels") {
    val sess = spark
    import sess.implicits._
    val path = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.label(path.toDF("a", "b"), "a", "b", maxIter = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  private def ccStar(pairs: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    val sess = spark
    import sess.implicits._
    ConnectedComponents
      .labelStar(pairs.toDF("a", "b"), "a", "b", maxIter)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("large-star/small-star agrees with union-find on a seeded random graph") {
    val rnd = new Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(ccStar(pairs) == reference(pairs))
  }

  test("large-star/small-star labels a diameter-255 path in O(log^2) rounds") {
    // min-label propagation needs 255 rounds here (it would THROW at the
    // default 50-round budget); the star alternation contracts the path
    // within the same budget — this is exactly the adversarial-diameter
    // case the labelStar scaladoc exists for
    val path = (0L until 256L).sliding(2).map(s => (s(0), s(1))).toSeq
    val labels = ccStar(path)
    assert(labels.keySet == (0L until 256L).toSet)
    assert(labels.values.toSet == Set(0L))
  }

  test("large-star/small-star matches min-label propagation on a mixed graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    )
    assert(ccStar(pairs) == cc(pairs))
  }
}

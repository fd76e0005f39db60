package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the deep-clone replica (q322): vacuum independence (the
  * replica owns its files — the source's history can be physically
  * deleted under it), crash-replay convergence of the catch-up sync
  * (cursor written AFTER the window: a replayed window must converge,
  * not double-apply), fingerprint layout-independence, and the
  * refusal shapes.
  */
class ReplicaSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def fixture(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong)
      .map(i => (i, s"doc$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "body", "par")
  }

  test("vacuum independence: source history physically deleted, replica still serves") {
    val src = freshDir("rep_src")
    val rep = freshDir("rep_rep")
    TableVersions.commitAppend(fixture(60).repartition(3), src) // v0
    TableVersions.commitAppend(fixture(80).filter(col("id") >= 60), src) // v1
    Replica.cloneDeep(spark, src, rep, 1L)
    TableVersions.commitDelete(spark, src, "id % 4 = 1") // v2
    Replica.sync(spark, src, rep, "id")
    val want = TableVersions.readVersion(spark, src, 2L).collect().map(_.toSeq).toSet
    // vacuum the source's entire history: v0/v1 batch files are gone
    val deleted = TableVersions.vacuum(spark, src, 2L)
    assert(deleted.nonEmpty, "vacuum should have reclaimed pre-head files")
    val got = TableVersions
      .readVersion(spark, rep, TableVersions.currentVersion(spark, rep))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(got == want, "replica must be whole after the source vacuumed its history")
  }

  test("crash replay: re-applying a synced window converges (state and fingerprint stable)") {
    val src = freshDir("rep_src2")
    val rep = freshDir("rep_rep2")
    TableVersions.commitAppend(fixture(50), src) // v0
    Replica.cloneDeep(spark, src, rep, 0L)
    TableVersions.commitDelete(spark, src, "id % 5 = 0") // v1
    TableVersions.commitUpdate(spark, src, "par = 'odd'", _.withColumn("body", lit("upd"))) // v2
    assert(Replica.sync(spark, src, rep, "id") == 2L)
    val fpAfter = Replica.fingerprint(spark, rep, TableVersions.currentVersion(spark, rep))
    // simulate the crash window: commits landed, cursor write lost —
    // rewind the cursor file to the pre-sync value and sync again
    val fs = new Path(rep).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cursor = new Path(s"$rep/_replica/cursor")
    fs.delete(cursor, false)
    val out = fs.create(cursor, true)
    out.write("0".getBytes("UTF-8")); out.close()
    assert(Replica.sync(spark, src, rep, "id") == 2L, "replayed sync must reach the head again")
    val fpReplay = Replica.fingerprint(spark, rep, TableVersions.currentVersion(spark, rep))
    assert(fpReplay == fpAfter, "a replayed window must converge, not double-apply")
    assert(
      fpReplay == Replica.fingerprint(spark, src, 2L),
      "replica must still equal the source head"
    )
  }

  test("fingerprint is layout-independent and content-sensitive") {
    val a = freshDir("rep_fp_a")
    val b = freshDir("rep_fp_b")
    TableVersions.commitAppend(fixture(40).repartition(8), a)
    TableVersions.commitAppend(fixture(40).repartition(1).orderBy(col("id").desc), b)
    assert(Replica.fingerprint(spark, a, 0L) == Replica.fingerprint(spark, b, 0L))
    val c = freshDir("rep_fp_c")
    TableVersions.commitAppend(fixture(40).withColumn(
      "body",
      when(col("id") === 7L, lit("mutated")).otherwise(col("body"))
    ), c)
    assert(Replica.fingerprint(spark, a, 0L) != Replica.fingerprint(spark, c, 0L))
  }

  test("refusals: clone onto an initialized table; sync without a cursor") {
    val src = freshDir("rep_src3")
    TableVersions.commitAppend(fixture(10), src)
    val notEmpty = freshDir("rep_notempty")
    TableVersions.commitAppend(fixture(5), notEmpty)
    intercept[IllegalArgumentException] {
      Replica.cloneDeep(spark, src, notEmpty, 0L)
    }
    intercept[IllegalArgumentException] {
      Replica.sync(spark, src, notEmpty, "id") // never cloned: no cursor
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the incrementally-maintained join view (JoinView): the view
  * equals the direct A ⋈ₖ B of both heads at EVERY sync point —
  * through appends on either side, CoW deletes on either side, a
  * B-payload update (content retraction), and a join-key arriving on
  * B AFTER its A rows (growth for already-seen rows) — zero-mult
  * tombstones are filtered from reads but present in state, both
  * cursors advance atomically with the deltas (one merge commit per
  * sync), and a sync against unmoved sources is a no-op.
  */
class JoinViewSpec extends AnyFunSuite with SparkSpec {

  private def fresh(p: String) = graft.queries.Similarity.freshIndexDir(p)

  private val aCols = Seq("id", "x")
  private val bCols = Seq("w")

  private def direct(aDir: String, bDir: String): Set[(Long, String, Long, Long)] = {
    val a = TableVersions.readVersion(spark, aDir, TableVersions.currentVersion(spark, aDir))
    val b = TableVersions.readVersion(spark, bDir, TableVersions.currentVersion(spark, bDir))
    a.join(b, Seq("k"))
      .select("id", "k", "x", "w")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def viewSet(viewDir: String): Set[(Long, String, Long, Long)] =
    JoinView
      .read(spark, viewDir)
      .collect()
      .map { r =>
        assert(r.getAs[Long]("mult") == 1L, s"unexpected multiplicity in $r")
        (r.getAs[Long]("id"), r.getAs[String]("k"), r.getAs[Long]("x"), r.getAs[Long]("w"))
      }
      .toSet

  test("view tracks both sources through appends, deletes, updates, and late join keys") {
    val s = spark
    import s.implicits._
    val aDir = fresh("jv_a")
    val bDir = fresh("jv_b")
    val view = fresh("jv_view")
    val a0 = (0L until 40L)
      .map(i => (i, Seq("a", "b", "c", "z")(i.toInt % 4), i * 10))
      .toDF("id", "k", "x")
    // 'z' has NO dimension row yet; 'd' never gets one
    val b0 = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("k", "w")
    TableVersions.commitAppend(a0.repartition(3), aDir) // A v0
    TableVersions.commitAppend(b0.coalesce(1), bDir) // B v0
    assert(JoinView.init(spark, aDir, bDir, view, "k", aCols, bCols) == (0L, 0L))
    assert(viewSet(view) == direct(aDir, bDir))

    // window 1: A append (incl 'd' rows) + B payload update
    TableVersions.commitAppend(
      (100L until 112L).map(i => (i, if (i % 2 == 0) "a" else "d", i)).toDF("id", "k", "x"),
      aDir
    ) // A v1
    TableVersions.commitUpdate(spark, bDir, "k = 'b'", _.withColumn("w", col("w") + 5)) // B v1
    val vHead1 = TableVersions.currentVersion(spark, view)
    assert(JoinView.sync(spark, aDir, bDir, view, "k", aCols, bCols) == (1L, 1L))
    assert(TableVersions.currentVersion(spark, view) == vHead1 + 1, "one merge commit per sync")
    assert(JoinView.cursors(spark, view) == (1L, 1L))
    assert(viewSet(view) == direct(aDir, bDir))
    // content retraction left tombstones in state: old (k='b', w=200)
    // rows exist with mult 0 and are filtered from read
    val tomb = TableVersions
      .readVersion(spark, view, TableVersions.currentVersion(spark, view))
      .filter(col("w") === 200L && col("mult") === 0L)
    assert(tomb.count() == 10L, "old-payload contents tombstoned, not rewritten")

    // window 2: A delete × B key-insert in the SAME window — the 'z'
    // dimension row arrives after its A rows, while some of those A
    // rows leave; the delta terms must net exactly
    TableVersions.commitDelete(spark, aDir, "id % 5 = 0") // A v2
    TableVersions.commitAppend(Seq(("z", 900L)).toDF("k", "w").coalesce(1), bDir) // B v2
    assert(JoinView.sync(spark, aDir, bDir, view, "k", aCols, bCols) == (2L, 2L))
    assert(viewSet(view) == direct(aDir, bDir))
    assert(viewSet(view).exists(_._2 == "z"), "late join key grew rows for already-seen docs")

    // window 3: one-sided — B loses a whole key (CoW delete)
    TableVersions.commitDelete(spark, bDir, "k = 'a'") // B v3
    assert(JoinView.sync(spark, aDir, bDir, view, "k", aCols, bCols) == (2L, 3L))
    assert(viewSet(view) == direct(aDir, bDir))
    assert(!viewSet(view).exists(_._2 == "a"), "dimension delete retracted the key's rows")
  }

  test("sync against unmoved sources is a no-op") {
    val s = spark
    import s.implicits._
    val aDir = fresh("jv_noop_a")
    val bDir = fresh("jv_noop_b")
    val view = fresh("jv_noop_view")
    TableVersions.commitAppend(Seq((1L, "a", 10L)).toDF("id", "k", "x"), aDir)
    TableVersions.commitAppend(Seq(("a", 100L)).toDF("k", "w"), bDir)
    JoinView.init(spark, aDir, bDir, view, "k", aCols, bCols)
    val head = TableVersions.currentVersion(spark, view)
    assert(JoinView.sync(spark, aDir, bDir, view, "k", aCols, bCols) == (0L, 0L))
    assert(TableVersions.currentVersion(spark, view) == head, "no commit on a no-op sync")
  }
}

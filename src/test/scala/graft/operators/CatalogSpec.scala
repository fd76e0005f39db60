package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the catalog invariants q223's oracle cannot see: the atomicity
  * of publication (crashed transactions invisible AND non-blocking,
  * stranded claims stepped over), the exclusive-create arbitration
  * under a real thread race, and the CAS-loop semantics of
  * [[Catalog.transactRetry]] (losers re-derive against the winner's
  * state, so no pin update is ever lost).
  */
class CatalogSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(p: String) = graft.queries.Similarity.freshIndexDir(p)

  private def table(dir: String, ids: Range): Long = {
    val s = spark
    import s.implicits._
    TableVersions.commitAppend(ids.map(i => (i.toLong, s"r$i")).toDF("id", "body"), dir)
  }

  test("publish / head / pinsAt / readTable round-trip") {
    val cat = freshDir("cat_rt")
    val t = freshDir("cat_rt_t")
    val v = table(t, 0 until 10)
    assert(Catalog.head(spark, cat) == -1L)
    assert(Catalog.pinsAt(spark, cat, -1L).isEmpty)
    val n = Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, v)))
    assert(n == 0L && Catalog.head(spark, cat) == 0L)
    assert(Catalog.pinsAt(spark, cat, 0L) == Map("t" -> Catalog.Pin(t, v)))
    assert(Catalog.readTable(spark, cat, 0L, "t").count() == 10)
    intercept[NoSuchElementException](Catalog.readTable(spark, cat, 0L, "nope"))
  }

  test("crashed transaction is invisible: table committed, snapshot never published") {
    val cat = freshDir("cat_crash")
    val t = freshDir("cat_crash_t")
    val v0 = table(t, 0 until 10)
    Catalog.transact(spark, cat)(_ => Map("t" -> Catalog.Pin(t, v0)))
    // the "crash": a second batch lands in the TABLE but the
    // transaction dies before publishing its snapshot
    table(t, 10 until 30)
    assert(Catalog.head(spark, cat) == 0L)
    assert(Catalog.readTable(spark, cat, Catalog.head(spark, cat), "t").count() == 10)
    // the half-committed state is recoverable the moment a LATER
    // transaction publishes a snapshot that pins it
    Catalog.transact(spark, cat)(cur =>
      cur + ("t" -> Catalog.Pin(t, TableVersions.currentVersion(spark, t)))
    )
    assert(Catalog.readTable(spark, cat, Catalog.head(spark, cat), "t").count() == 30)
  }

  test("stranded claim: invisible to readers, blocks publishers until released") {
    val cat = freshDir("cat_strand")
    val t = freshDir("cat_strand_t")
    val v = table(t, 0 until 5)
    Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, v))) // s0
    // a publisher claims s1 and crashes before its rename
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$cat/snaps/s1.claim"))
    assert(Catalog.head(spark, cat) == 0L)
    intercept[IllegalArgumentException](Catalog.pinsAt(spark, cat, 1L))
    // CAS publishers fail loudly at the stranded number…
    intercept[Catalog.ConcurrentSnapshotException](
      Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, v)))
    )
    // …until the stale claim is confirmed dead and released; releasing
    // a PUBLISHED snapshot's claim is refused
    intercept[IllegalArgumentException](Catalog.releaseStaleClaim(spark, cat, 0L))
    Catalog.releaseStaleClaim(spark, cat, 1L)
    val n = Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, v)))
    assert(n == 1L && Catalog.head(spark, cat) == 1L)
  }

  test("racing publishers: exclusive create arbitrates, exactly one wins per number") {
    val cat = freshDir("cat_race")
    val t = freshDir("cat_race_t")
    val v = table(t, 0 until 3)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    try {
      val results = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
          def call(): Either[Throwable, Long] = {
            barrier.await()
            try Right(Catalog.publish(spark, cat, Map(s"t$i" -> Catalog.Pin(t, v))))
            catch { case e: Throwable => Left(e) }
          }
        })
      }.map(_.get())
      val wins = results.collect { case Right(n) => n }
      val losses = results.collect { case Left(e) => e }
      // every winner a distinct number; every loser a loud conflict —
      // the claim race (ConcurrentSnapshotException) or, when the
      // winner's rename already landed, the stale-pins CAS require
      assert(wins.nonEmpty && wins.distinct.size == wins.size)
      assert(losses.forall(e =>
        e.isInstanceOf[Catalog.ConcurrentSnapshotException] ||
          e.isInstanceOf[IllegalArgumentException]
      ))
      assert(wins.size + losses.size == 4)
    } finally pool.shutdown()
  }

  test("transactRetry: concurrent read-modify-write publishers lose no pin") {
    val cat = freshDir("cat_cas")
    val t = freshDir("cat_cas_t")
    val v = table(t, 0 until 3)
    Catalog.publish(spark, cat, Map("base" -> Catalog.Pin(t, v)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    try {
      (0 until 4)
        .map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              barrier.await()
              // each publisher ADDS its own pin — a lost update would
              // surface as a missing entry in the final head
              Catalog.transactRetry(spark, cat)(cur => cur + (s"t$i" -> Catalog.Pin(t, v)))
            }
          })
        }
        .foreach(_.get())
    } finally pool.shutdown()
    val finalPins = Catalog.pinsAt(spark, cat, Catalog.head(spark, cat))
    assert(finalPins.keySet == Set("base", "t0", "t1", "t2", "t3"))
  }

  test("snapshot file is atomic: no reader ever sees a prefix (rename publication)") {
    val cat = freshDir("cat_atomic")
    val t = freshDir("cat_atomic_t")
    val v = table(t, 0 until 3)
    val pins = (0 until 50).map(i => s"table_$i" -> Catalog.Pin(t, v)).toMap
    val n = Catalog.publish(spark, cat, pins)
    assert(Catalog.pinsAt(spark, cat, n) == pins)
    // no temp debris left behind
    val leftovers = new java.io.File(s"$cat/snaps")
      .listFiles()
      .map(_.getName)
      .filter(_.contains(".tmp."))
    assert(leftovers.isEmpty, s"unexpected temp files: ${leftovers.mkString(", ")}")
  }

  // ------------------------------------------------------------------
  // branches — the q297 oracle covers the disjoint merge and the
  // both-sides conflict; these pin the ref-machinery edges it can't
  // ------------------------------------------------------------------

  test("branch: fast-forward when main never moved; fork point recorded") {
    val cat = freshDir("cat_br_ff")
    val t = freshDir("cat_br_ff_t")
    val v0 = table(t, 0 until 10)
    Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, v0)))
    val bdir = Catalog.createBranch(spark, cat, "work", 0L)
    assert(Catalog.forkPoint(spark, cat, "work") == 0L)
    assert(Catalog.pinsAt(spark, bdir, 0L) == Map("t" -> Catalog.Pin(t, v0)))
    val v1 = table(t, 10 until 20)
    Catalog.transact(spark, bdir)(pins => pins + ("t" -> Catalog.Pin(t, v1)))
    val n = Catalog.merge(spark, cat, "work") // main unmoved: fast-forward
    assert(n == 1L)
    assert(Catalog.readTable(spark, cat, 1L, "t").count() == 20)
  }

  test("branch: double create refuses; unknown branch refuses; bad name refuses") {
    val cat = freshDir("cat_br_dup")
    val t = freshDir("cat_br_dup_t")
    Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, table(t, 0 until 3))))
    Catalog.createBranch(spark, cat, "once", 0L)
    intercept[IllegalArgumentException](Catalog.createBranch(spark, cat, "once", 0L))
    intercept[IllegalArgumentException](Catalog.forkPoint(spark, cat, "never-made"))
    intercept[IllegalArgumentException](Catalog.branchDir(cat, "../escape"))
  }

  test("branch: a creation that crashed before s0 refuses to merge, loudly") {
    val cat = freshDir("cat_br_crash")
    val t = freshDir("cat_br_crash_t")
    Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, table(t, 0 until 3))))
    // simulate the crash: fork point recorded, s0 never published
    val bdir = Catalog.branchDir(cat, "dead")
    val fs = new org.apache.hadoop.fs.Path(bdir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(bdir))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$bdir/base"), false)
    out.write("0".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException](Catalog.merge(spark, cat, "dead"))
    assert(e.getMessage.contains("no snapshots"))
    assert(Catalog.head(spark, cat) == 0L, "the refused merge must publish nothing")
  }

  test("branch: a creation that crashed between the claim and the fork-point write is loud") {
    val cat = freshDir("cat_br_claim")
    val t = freshDir("cat_br_claim_t")
    Catalog.publish(spark, cat, Map("t" -> Catalog.Pin(t, table(t, 0 until 3))))
    // simulate the crash: claim created, base never written
    val bdir = Catalog.branchDir(cat, "half")
    val fs = new org.apache.hadoop.fs.Path(bdir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(bdir))
    fs.create(new org.apache.hadoop.fs.Path(s"$bdir/base.claim"), false).close()
    // a rival creator refuses (the claim is held), the crashed branch
    // refuses to resolve, and the documented remediation (delete the
    // ref dir, re-fork) works
    intercept[IllegalArgumentException](Catalog.createBranch(spark, cat, "half", 0L))
    intercept[IllegalArgumentException](Catalog.forkPoint(spark, cat, "half"))
    assert(fs.delete(new org.apache.hadoop.fs.Path(bdir), true))
    Catalog.createBranch(spark, cat, "half", 0L)
    assert(Catalog.forkPoint(spark, cat, "half") == 0L)
  }

  test("branch: a table deleted on the branch merges as a removed pin") {
    val cat = freshDir("cat_br_del")
    val t = freshDir("cat_br_del_t")
    val u = freshDir("cat_br_del_u")
    Catalog.publish(
      spark,
      cat,
      Map("t" -> Catalog.Pin(t, table(t, 0 until 3)), "u" -> Catalog.Pin(u, table(u, 0 until 3)))
    )
    val bdir = Catalog.createBranch(spark, cat, "drop-u", 0L)
    Catalog.transact(spark, bdir)(pins => pins - "u")
    Catalog.merge(spark, cat, "drop-u")
    assert(Catalog.pinsAt(spark, cat, 1L).keySet == Set("t"))
  }
}

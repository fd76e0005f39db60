package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table atomic snapshots over [[TableVersions]] tables — the
  * catalog layer that turns N independently-versioned tables into ONE
  * consistent unit of publication (the role Nessie / an Iceberg
  * catalog plays above per-table logs; Delta has no cross-table
  * transaction at all).
  *
  * Why a corpus engine needs it: the version store already keeps each
  * table transactional on its own, but a pipeline's invariants span
  * tables — a corpus and its derived aggregate, a document table and
  * its inverted index. A reader that resolves each table's head
  * independently can observe corpus v5 next to an index synced at v4:
  * every cross-table read is a potential torn snapshot. The catalog
  * closes that hole with a tiny indirection: readers never resolve
  * table heads; they resolve ONE catalog snapshot — an immutable map
  * `table name → (dir, version)` — and read every table at its pinned
  * version. Snapshots are published atomically, so the intermediate
  * states of a multi-table transaction are unobservable by
  * construction.
  *
  * Publication protocol (the same three-step discipline as
  * [[TableVersions.claimVersion]]):
  *   1. atomically claim the next snapshot number — an exclusive
  *      create of `snaps/s<N>.claim` (O_CREAT|O_EXCL on local
  *      filesystems, Hadoop's atomic create on HDFS, a conditional
  *      put on object stores): exactly one publisher wins a number;
  *   2. write the pin map to a uniquely-named temp file;
  *   3. rename it onto `snaps/s<N>.list` — atomic on every
  *      rename-capable filesystem, so a reader sees the whole
  *      snapshot or none of it, never a prefix.
  * Publication is a strict compare-and-swap: pins derived from head H
  * publish at exactly H+1, so a transaction can never overwrite a
  * rival's snapshot with pins derived from stale state (the lost-
  * update anomaly a step-past-the-claim scheme would reintroduce — a
  * loser whose rival's rename is still in flight would re-derive from
  * the OLD head yet land at a HIGHER number). A publisher that
  * crashes between 1 and 3 strands a claim with no list file: readers
  * are unaffected (head = highest number whose list exists — the
  * crashed transaction is unobservable, its table commits unreferenced
  * versions, exactly like an unpublished data file below a table log),
  * and rival publishers fail loudly at that number until
  * [[releaseStaleClaim]] confirms the list never materialized — the
  * same recovery contract as [[TableVersions.releaseStaleClaim]].
  *
  * Scale posture: a snapshot is O(tables) text — publishing adds one
  * exclusive create + one rename regardless of data volume, and
  * resolution is one directory listing + one tiny file read. The
  * catalog stores not one byte of data and never reads any table; all
  * data IO stays inside the per-table commits it pins.
  */
object Catalog {

  /** A concurrent publisher won the snapshot number this transaction
    * tried to claim. Nothing was published; retrying re-reads the new
    * head and re-derives the pins (see [[transactRetry]]). */
  final class ConcurrentSnapshotException(msg: String) extends RuntimeException(msg)

  /** One pinned table: where its log lives and which version to read. */
  final case class Pin(dir: String, version: Long)

  private def snapsDir(catDir: String) = s"$catDir/snaps"

  /** Atomically create `p` iff it does not exist — true iff THIS call
    * created it. Hadoop's local create(overwrite = false) is
    * check-then-act (exists() + open), so local filesystems go through
    * the kernel's O_CREAT|O_EXCL instead; everywhere else (HDFS, object
    * stores) create(overwrite = false) is the filesystem's own atomic
    * claim. The single exclusive-create discipline behind every
    * one-winner decision in this catalog (snapshot claims, branch
    * creation). */
  private def exclusiveCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    case remote =>
      try { remote.create(p, /* overwrite = */ false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  private def fsOf(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Snapshot numbers under `snaps/` with `suffix`, ascending. */
  private def numbered(s: SparkSession, catDir: String, suffix: String): Seq[Long] = {
    val p = new Path(snapsDir(catDir))
    val fs = fsOf(s, p.toString)
    if (!fs.exists(p)) Nil
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect {
          case n if n.startsWith("s") && n.endsWith(suffix) =>
            n.stripPrefix("s").stripSuffix(suffix).toLong
        }
        .sorted
  }

  /** Highest PUBLISHED snapshot, or -1 for an empty catalog. Claims
    * without a list file (in-flight or crashed transactions) are
    * invisible here — a snapshot exists only once its rename landed. */
  def head(s: SparkSession, catDir: String): Long = {
    val published = numbered(s, catDir, ".list")
    if (published.isEmpty) -1L else published.max
  }

  /** The pin map of snapshot `n` (empty map for n = -1, the state of
    * an empty catalog). Fails loudly on a claimed-but-unpublished
    * number — that snapshot never happened. */
  def pinsAt(s: SparkSession, catDir: String, n: Long): Map[String, Pin] = {
    if (n < 0) return Map.empty
    val f = new Path(s"${snapsDir(catDir)}/s$n.list")
    val fs = fsOf(s, f.toString)
    require(fs.exists(f), s"catalog snapshot $n of $catDir was never published")
    val in = fs.open(f)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.linesIterator
      .filter(_.nonEmpty)
      .map { line =>
        val Array(name, dir, v) = line.split('\t')
        name -> Pin(dir, v.toLong)
      }
      .toMap
  }

  /** Atomically publish `pins` — derived from snapshot `expectedHead`
    * — as snapshot `expectedHead + 1`; returns that number. This is a
    * strict CAS: racing publishers compute the same number, the
    * exclusive claim create arbitrates, and the loser publishes
    * NOTHING and throws [[ConcurrentSnapshotException]] — it must
    * re-read the head and RE-DERIVE its pins before retrying, which is
    * what makes concurrent read-modify-write updates lose nothing
    * (see [[transactRetry]]). */
  def publish(s: SparkSession, catDir: String, pins: Map[String, Pin], expectedHead: Long): Long = {
    val dir = snapsDir(catDir)
    val fs = fsOf(s, dir)
    fs.mkdirs(new Path(dir))
    val n = expectedHead + 1
    // a rival that won AND renamed before we got here is the same
    // contention outcome as losing the claim below — retryable, so it
    // must carry the same exception type or transactRetry's CAS loop
    // leaks it (a real 4-thread race in CatalogSpec caught exactly
    // that: head read at 0, rival published 1 before this check)
    if (fs.exists(new Path(s"$dir/s$n.list")))
      throw new ConcurrentSnapshotException(
        s"snapshot $n of $catDir is already published — pins derived from $expectedHead " +
          "are stale (re-read the head and re-derive before retrying)"
      )
    val claim = new Path(s"$dir/s$n.claim")
    val won = exclusiveCreate(fs, claim)
    if (!won)
      throw new ConcurrentSnapshotException(
        s"snapshot $n of $catDir is already claimed — a concurrent publisher won it " +
          "(re-read the head and re-derive the pins before retrying), or a crashed " +
          "publisher stranded the claim (releaseStaleClaim removes it iff the " +
          "list file never materialized)"
      )
    val body = pins.toSeq
      .sortBy(_._1)
      .map { case (name, p) =>
        require(!name.contains('\t') && !p.dir.contains('\t'), s"tab in catalog entry: $name")
        s"$name\t${p.dir}\t${p.version}"
      }
      .mkString("", "\n", "\n")
    val tmp = new Path(s"$dir/.s$n.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, new Path(s"$dir/s$n.list")), s"failed to publish snapshot $n")
    n
  }

  /** Publish against the current head (single-publisher convenience). */
  def publish(s: SparkSession, catDir: String, pins: Map[String, Pin]): Long =
    publish(s, catDir, pins, head(s, catDir))

  /** Remove the claim for snapshot `n` ONLY when its list file never
    * materialized — the recovery path for a publisher that claimed a
    * number and crashed before its rename. Refuses to touch the claim
    * of any published snapshot (deleting it would let a later
    * publisher double-publish that number). After release the number
    * is claimable again, so published snapshots stay DENSE 0..head —
    * no holes for readers or [[pinsAt]] to reason about. */
  def releaseStaleClaim(s: SparkSession, catDir: String, n: Long): Unit = {
    val dir = snapsDir(catDir)
    val fs = fsOf(s, dir)
    require(
      !fs.exists(new Path(s"$dir/s$n.list")),
      s"snapshot $n of $catDir is published — refusing to release its claim"
    )
    val claim = new Path(s"$dir/s$n.claim")
    if (fs.exists(claim))
      require(fs.delete(claim, false), s"failed to delete stale claim $claim")
  }

  /** Read one table at the versions snapshot `snap` pinned. This is
    * THE read path: resolving through the snapshot (never through
    * [[TableVersions.currentVersion]]) is what makes cross-table reads
    * torn-free — every table a consumer touches comes from the same
    * published instant. */
  def readTable(s: SparkSession, catDir: String, snap: Long, name: String): DataFrame = {
    val pin = pinsAt(s, catDir, snap).getOrElse(
      name,
      throw new NoSuchElementException(s"table '$name' is not pinned by snapshot $snap")
    )
    TableVersions.readVersion(s, pin.dir, pin.version)
  }

  /** One multi-table transaction: `body` receives the current pins,
    * performs its per-table commits, and returns the new pin map; the
    * catalog then publishes it atomically. A crash anywhere inside
    * `body` leaves the catalog untouched — the half-committed table
    * versions exist but are unreferenced, so no catalog-routed reader
    * ever observes them. */
  def transact(s: SparkSession, catDir: String)(
      body: Map[String, Pin] => Map[String, Pin]
  ): Long = {
    // the head is read ONCE and threaded through to the CAS publish:
    // pins derived from snapshot h may only ever land at h+1
    val h = head(s, catDir)
    publish(s, catDir, body(pinsAt(s, catDir, h)), h)
  }

  /** CAS-loop variant for concurrent publishers: on losing the
    * snapshot race, re-read the head and RE-DERIVE the pins from the
    * winner's state. Unlike blind table appends (which commute and
    * just retry), snapshot publication is a read-modify-write of the
    * whole pin map — replaying the stale map would silently drop the
    * winner's pins, so `body` must run again against the fresh state. */
  def transactRetry(s: SparkSession, catDir: String, maxAttempts: Int = 64)(
      body: Map[String, Pin] => Map[String, Pin]
  ): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return transact(s, catDir)(body)
      catch {
        case e: ConcurrentSnapshotException =>
          if (attempt >= maxAttempts) throw e
          // the rival that won the claim may not have RENAMED yet — a
          // tight retry would re-read the old head and lose the race
          // at the same number again; back off linearly instead
          Thread.sleep(5L * attempt)
      }
    }
    sys.error("unreachable")
  }

  // ------------------------------------------------------------------
  // Branches (round 14): Nessie-style named refs over the same snapshot
  // machinery. A branch is its OWN snapshot log under
  // `refs/<name>/` — every existing operation (head/pinsAt/readTable/
  // transact/publish) works on a branch by addressing
  // [[branchDir]](cat, name) instead of the main catalog dir, so a
  // branch gets the full CAS/claim/recovery discipline for free. The
  // branch records its FORK POINT (the main snapshot its s0 copied) in
  // an exclusively-created `base` file; [[merge]] is a TABLE-GRANULAR
  // three-way merge: tables changed only on the branch adopt the
  // branch pins, tables changed only on main keep main's, a table
  // changed on BOTH sides refuses loudly ([[BranchConflictException]])
  // — rebasing (re-fork + replay) is the caller's move, exactly
  // Nessie's contract. When main has not moved since the fork, merge
  // degenerates to a fast-forward.
  //
  // Why this is the right isolation primitive: WAP (q283) stages ONE
  // table version behind the pin; a branch stages an arbitrary
  // multi-table, multi-commit WORKFLOW — the nightly rebuild that
  // touches a corpus and three indexes runs to completion on the
  // branch, is audited there, and lands on main as one atomic
  // publish. Branch commits write to the same table logs as
  // unreferenced-by-main versions, so an abandoned branch costs only
  // unreferenced files (vacuum-reclaimable) — no copies, no rollback.
  // ------------------------------------------------------------------

  /** A table changed on both main and the branch since the fork point
    * — the merge cannot pick a side without losing the other's
    * commits. Re-fork from the new main head and replay. */
  final class BranchConflictException(msg: String) extends RuntimeException(msg)

  /** The snapshot-log directory of branch `name` — pass to any Catalog
    * operation to read/commit on the branch. */
  def branchDir(catDir: String, name: String): String = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid branch name '$name'")
    s"$catDir/refs/$name"
  }

  /** Fork branch `name` from main snapshot `fromSnap`: records the
    * fork point and publishes the branch's s0 as a copy of main's pins
    * at `fromSnap`. O(tables) metadata; no data moves.
    *
    * One-creator-wins is decided by an EXCLUSIVE CREATE of
    * `base.claim` — the same [[exclusiveCreate]] discipline as
    * [[publish]] — never by rename-refuses-existing: POSIX rename(2)
    * on a raw local filesystem silently REPLACES the destination, so a
    * rename-as-claim would let a late loser overwrite the winner's
    * fork point while the loser's s0 publish fails later with the
    * wrong exception. With the claim held, the fork-point content
    * still lands by tmp-write + rename (atomic — never observable
    * half-written). A creator that crashes between the claim and the
    * content rename leaves `base.claim` without `base`: [[forkPoint]]
    * and [[merge]] refuse loudly, and the remediation is the one
    * already documented for a crash before s0 — delete `refs/<name>`
    * and re-fork. */
  def createBranch(s: SparkSession, catDir: String, name: String, fromSnap: Long): String = {
    val pins = pinsAt(s, catDir, fromSnap) // fails loudly on unpublished snaps
    val bdir = branchDir(catDir, name)
    val fs = fsOf(s, bdir)
    fs.mkdirs(new Path(bdir))
    if (!exclusiveCreate(fs, new Path(s"$bdir/base.claim")))
      throw new IllegalArgumentException(s"branch '$name' of $catDir already exists")
    val base = new Path(s"$bdir/base")
    val tmp = new Path(s"$bdir/.base.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(fromSnap.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, base), s"failed to record fork point of branch '$name'")
    publish(s, bdir, pins, expectedHead = -1L)
    bdir
  }

  /** The main snapshot branch `name` forked from. */
  def forkPoint(s: SparkSession, catDir: String, name: String): Long = {
    val base = new Path(s"${branchDir(catDir, name)}/base")
    val fs = fsOf(s, base.toString)
    require(fs.exists(base), s"branch '$name' of $catDir does not exist")
    val in = fs.open(base)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    finally in.close()
  }

  /** Land the branch's head on main as ONE atomic snapshot — the
    * table-granular three-way merge against the fork point. Returns
    * the new main snapshot. Fast-forward when main has not moved;
    * [[BranchConflictException]] when any table changed on both sides
    * (fail safe — neither side's commits are lost or replayed);
    * [[ConcurrentSnapshotException]] on a publish race (retryable —
    * re-derivation happens here, so callers may simply call again). */
  def merge(s: SparkSession, catDir: String, name: String): Long = {
    val fork = forkPoint(s, catDir, name)
    val basePins = pinsAt(s, catDir, fork)
    val bdir = branchDir(catDir, name)
    val bHead = head(s, bdir)
    // a creation that crashed between the base rename and publishing s0
    // must refuse here, not merge an empty pin map as "every table
    // removed" — delete refs/<name> and re-fork
    require(bHead >= 0, s"branch '$name' of $catDir has no snapshots — creation crashed before s0")
    val branchPins = pinsAt(s, bdir, bHead)
    val mainHead = head(s, catDir)
    val mainPins = pinsAt(s, catDir, mainHead)
    def changed(now: Map[String, Pin]): Set[String] =
      (now.keySet ++ basePins.keySet).filter(t => basePins.get(t) != now.get(t))
    val branchChanged = changed(branchPins)
    val mainChanged = changed(mainPins)
    val conflicts = branchChanged.intersect(mainChanged)
    if (conflicts.nonEmpty)
      throw new BranchConflictException(
        s"branch '$name' and main both changed ${conflicts.toSeq.sorted.mkString(", ")} " +
          s"since fork snapshot $fork — re-fork from snapshot $mainHead and replay"
      )
    // branch-changed tables adopt the branch's state — including a
    // REMOVAL (present at the fork, dropped on the branch): repinning
    // from mainPins alone would silently resurrect a dropped table
    val merged = (mainPins ++ branchPins.view.filterKeys(branchChanged).toMap) --
      branchChanged.filterNot(branchPins.contains)
    publish(s, catDir, merged, mainHead)
  }

  // ------------------------------------------------------------------
  // Replay merge (round 15): the documented Nessie gap closed. A
  // table-granular conflict (both sides changed the same table since
  // the fork) is frequently a FALSE conflict at row level — the
  // nightly branch reworked one key range while main erased another.
  //
  // Isolation prerequisite: the per-table version log is LINEAR, so a
  // branch that commits same-table work into the SHARED log hands its
  // changes to every later main commit's lineage — there is no
  // attribution to replay. Same-table branch work must therefore live
  // on a ZERO-COPY CLONE of the fork image
  // ([[TableVersions.cloneShallow]] — O(metadata), the per-table DAG
  // fork the linear log lacks), with the branch pinning the clone.
  // [[mergeWithReplay]] then has two clean feeds: the clone's
  // (everything the branch did) and main's (everything main did), it
  // proves their touched ROW-KEY sets disjoint, and re-applies the
  // branch's net change on top of main's head as fresh commits — both
  // sides' rows survive. A TRUE row overlap, an unisolated same-log
  // branch, or an add/remove conflict still refuses with
  // [[BranchConflictException]] (fail safe: replay commits land per
  // table only after that table's disjointness is proven).
  // ------------------------------------------------------------------

  /** [[merge]], falling back to ROW-LEVEL REPLAY on a table-granular
    * conflict. `keyOf` names each replayable table's unique row key; a
    * conflicted table with no entry rethrows the conflict. Each
    * conflicted table's branch pin must be a clone of the fork image
    * (see above — provenance REQUIREd by comparing the clone's v0 live
    * file set against the fork version's); its change feed and main's
    * must touch DISJOINT key sets; the branch's net change
    * (latest-wins per key) then lands on main's table as one merge
    * commit plus one request-scaled delete, and the merged snapshot
    * pins the replayed head. Cost: O(both sides' changes) per
    * conflicted table — feeds, never table scans; the merge commit's
    * copy-on-write touches only hit files. NOT idempotent across a
    * lost publish race: the replay commits are already in the table
    * log, so on [[ConcurrentSnapshotException]] re-derive (re-fork)
    * rather than blindly re-invoking. Single-merger discipline, like
    * every staged-swap maintainer in this engine. */
  def mergeWithReplay(
      s: SparkSession,
      catDir: String,
      name: String,
      keyOf: Map[String, String]
  ): Long = {
    import org.apache.spark.sql.functions._
    try merge(s, catDir, name)
    catch {
      case conflict: BranchConflictException =>
        val fork = forkPoint(s, catDir, name)
        val basePins = pinsAt(s, catDir, fork)
        val bdir = branchDir(catDir, name)
        val branchPins = pinsAt(s, bdir, head(s, bdir))
        val mainHead = head(s, catDir)
        val mainPins = pinsAt(s, catDir, mainHead)
        def changed(now: Map[String, Pin]): Set[String] =
          (now.keySet ++ basePins.keySet).filter(t => basePins.get(t) != now.get(t))
        val branchChanged = changed(branchPins)
        val conflicts = branchChanged.intersect(changed(mainPins)).toSeq.sorted
        val replayedPins = conflicts.map { t =>
          val key = keyOf.getOrElse(t, throw conflict)
          // add/remove conflicts have no row-level form; a branch pin
          // still in the SHARED log has no attributable feed — fail safe
          val (basePin, bPin, mPin) = (basePins.get(t), branchPins.get(t), mainPins.get(t)) match {
            case (Some(a), Some(b), Some(m)) if b.dir != a.dir && m.dir == a.dir => (a, b, m)
            case _                                                               => throw conflict
          }
          // provenance: the clone's v0 must BE the fork image
          require(
            TableVersions.liveFiles(s, bPin.dir, 0L).toSet ==
              TableVersions.liveFiles(s, basePin.dir, basePin.version).toSet,
            s"replay of '$t': branch pin ${bPin.dir} is not a clone of " +
              s"${basePin.dir}@${basePin.version} — re-fork and replay by hand"
          )
          if (bPin.version == 0L) {
            // branch cloned but never committed — main's state stands
            t -> mPin
          } else {
            val bFeed = TableVersions.changesFeed(s, bPin.dir, 0L, bPin.version).localCheckpoint()
            val bKeys = bFeed.select(col(key)).distinct()
            val mKeys =
              if (mPin.version == basePin.version) bKeys.limit(0)
              else
                TableVersions
                  .changesFeed(s, basePin.dir, basePin.version, mPin.version)
                  .select(col(key))
                  .distinct()
            val overlap = bKeys.join(mKeys, Seq(key)).limit(1).collect()
            if (overlap.nonEmpty)
              throw new BranchConflictException(
                s"branch '$name' and main both touched row $key=${overlap.head.get(0)} " +
                  s"of '$t' since fork snapshot $fork — a true row conflict; re-fork and rework"
              )
            // net branch change per key (the CoveringIndex fold): later
            // versions win; within one, a post-image/insert outranks the
            // pre-image/delete marker of the same update
            val dataCols = bFeed.columns.toSeq
              .filterNot(c => c == "_change_type" || c == "_commit_version" || c == key)
            val live = when(col("_change_type").isin("insert", "update_postimage"), 1).otherwise(0)
            val packed = struct(col("_commit_version") +: live.as("_live") +: dataCols.map(col): _*)
            val net = bFeed
              .groupBy(col(key))
              .agg(max(packed).as("top"))
              .select(
                col(key) +: (col("top._live") === 1).as("_live") +: dataCols.map(c =>
                  col(s"top.$c").as(c)
                ): _*
              )
              .localCheckpoint()
            val upserts = net.filter(col("_live")).drop("_live")
            if (!upserts.isEmpty) TableVersions.commitMerge(upserts, basePin.dir, key): Unit
            // the delete arm stays as distributed as the upsert arm:
            // the branch's deleted KEY SET lands as a key-only semi-
            // join delete ([[TableVersions.commitDeleteKeys]]), never
            // as a driver-collected IN-list — a delete-heavy branch is
            // data-scaled, and literal-encoding keys would also break
            // on date/decimal/NULL key types
            val dels = net.filter(!col("_live")).select(col(key))
            if (!dels.isEmpty)
              TableVersions.commitDeleteKeys(dels, basePin.dir, key): Unit
            t -> Pin(basePin.dir, TableVersions.currentVersion(s, basePin.dir))
          }
        }
        // three-way outcome for everything else; replayed heads for the
        // conflicted tables. CAS at the head the replay was derived from.
        val merged = (mainPins ++ branchPins.view.filterKeys(branchChanged).toMap) --
          branchChanged.filterNot(branchPins.contains) ++ replayedPins
        publish(s, catDir, merged, mainHead)
    }
  }
}

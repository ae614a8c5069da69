package graft.etl

import java.nio.file.{Files, Paths, FileAlreadyExistsException}

/** Optimistic-concurrency commit protocol for the manifest MVCC store
  * (the store shape used by etl_time_travel / etl_vacuum / etl_wap:
  * `files/<dir>/pt=<p>` data + `manifests/v<N>.txt` version manifests,
  * each manifest a full partition→dir mapping).
  *
  * The round-10 store wrote manifests with tmp+ATOMIC_MOVE, which makes
  * each manifest's CONTENT all-or-nothing but lets two simultaneous
  * committers last-write-win the same version number (rename(2)
  * silently replaces an existing target). This object upgrades the
  * publish step to compare-and-swap, the same discipline Delta Lake's
  * LogStore `putIfAbsent` and Iceberg's atomic metadata swap implement:
  *
  *   1. a committer prepares its data files against the version it
  *      READ (copy-on-write of only its touched partitions);
  *   2. publish = atomically create `v<N+1>.txt` where N is the
  *      version it believes is current. The create-if-absent is a
  *      hard link from a private tmp file ([[Files.createLink]] —
  *      POSIX link(2) fails with EEXIST if the target exists), so
  *      visibility is all-or-nothing AND first-writer-wins;
  *   3. the loser sees [[FileAlreadyExistsException]], reads the
  *      winner's manifest, and REBASES: if the winner touched none of
  *      the loser's partitions, the loser's data files are still
  *      byte-valid (CoW rewrote partitions the winner left alone) and
  *      the retry is a pure manifest merge; if the touched sets
  *      overlap, the loser's rewrite was computed against stale bytes
  *      and must be RECOMPUTED against the new current version.
  *
  * Crash safety: data files land under a per-(writer, attempt) dir
  * BEFORE the CAS, so a crash between data write and publish leaves
  * only invisible orphans — a retry overwrites its own dir (never a
  * committed one) and the orphan is reclaimable by vacuum. The store
  * never has a manifest that names missing data.
  *
  * This matches the restart discipline of the reference's work lists
  * (work_lists.rs:48-200: detect concurrent mutation, hard-error or
  * recover explicitly — never silently lose a committer's work).
  */
object ManifestCommit {

  /** One writer's prepared-but-unpublished commit: data written, CAS
    * pending. `entries` is the FULL manifest this writer wants to
    * publish (its CoW dirs for `touched`, the base manifest's dirs for
    * everything else). */
  final case class Prepared(
      writer: String,
      baseVersion: Int,
      touched: Seq[Int],
      dataDir: String,
      entries: Seq[(Int, String)])

  /** Outcome of [[publish]], for audit rows: which version the writer
    * landed at, how many CAS attempts it took, and whether any retry
    * had to recompute data (vs a pure manifest rebase). */
  final case class Committed(
      writer: String,
      firstReadVersion: Int,
      committedVersion: Int,
      attempts: Int,
      recomputed: Boolean,
      entries: Seq[(Int, String)])

  /** Two-level layout gate (r11 verdict item 4): versions below the
    * gate live flat (`manifests/v<N>.txt` — every store that never
    * crosses it keeps the r11 layout byte-for-byte, and the flat
    * portion of the dir is bounded by GroupSize entries forever); from
    * v >= GroupSize the path is `manifests/g<v/GroupSize>/v<N>.txt` —
    * Iceberg's manifest-of-manifests shape, chosen deterministically
    * from the version number so no marker file, no migration, and
    * mixed-era readers agree. Resolution then lists O(#groups +
    * GroupSize) names instead of O(versions): at 10⁵ commits, ~98
    * group entries + one group's contents, not 10⁵ files (on an
    * object store: prefix-delimited LISTs of the same shape). */
  val GroupSize = 1024L

  def manifestPath(base: String, v: Long): String =
    if (v < GroupSize) s"$base/manifests/v$v.txt"
    else s"$base/manifests/g${v / GroupSize}/v$v.txt"

  /** Directory listings performed by the last [[currentVersionLong]]
    * on this thread — the spec hook that pins resolution cost
    * (manifests dir + normally ONE group dir, not every group). */
  private[graft] val lastResolveListings = new ThreadLocal[Int]

  /** Highest committed version (0 = empty store). Lists the manifests
    * dir (bounded: <= GroupSize flat entries + one name per group)
    * and then group dirs NEWEST-FIRST, stopping at the first that
    * holds a committed manifest — a crash can leave the newest group
    * dir empty (mkdirs before a lost CAS), which steps back one group;
    * versions inside a group need not be dense. Tolerates leaked CAS
    * staging files (`v<N>.txt.tmp.<pid>.<tid>`): only a well-formed
    * `v<N>.txt` is a commit. Long-domain variant shared with the
    * streaming versioned sink (batchId-derived versions). */
  def currentVersionLong(base: String): Long = {
    var listings = 1
    def maxV(files: Array[java.io.File]): Long = files
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("v") && n.endsWith(".txt"))
          scala.util.Try(n.stripPrefix("v").stripSuffix(".txt").toLong).toOption
        else None
      }
      .foldLeft(0L)(math.max)
    val entries = Option(new java.io.File(s"$base/manifests").listFiles)
      .getOrElse(Array.empty)
    val flatMax = maxV(entries)
    val grouped = entries
      .filter(f => f.isDirectory && f.getName.startsWith("g"))
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("g").toLong)
        .toOption.map(_ -> f))
      .sortBy(-_._1)
      .iterator
      .map { case (_, f) =>
        listings += 1
        maxV(Option(f.listFiles).getOrElse(Array.empty))
      }
      .find(_ > 0L)
    lastResolveListings.set(listings)
    // any committed grouped version is >= GroupSize > any flat version
    grouped.getOrElse(flatMax)
  }

  def currentVersion(base: String): Int = currentVersionLong(base).toInt

  def readManifest(base: String, v: Int): Seq[(Int, String)] = {
    val src = scala.io.Source.fromFile(manifestPath(base, v), "UTF-8")
    try src.getLines().map { line =>
      val Array(p, ver) = line.split("\t"); (p.toInt, ver)
    }.toList
    finally src.close()
  }

  /** Compare-and-swap publish of version `v`: true iff THIS caller
    * created `v<N>.txt`. Content is staged to a caller-private tmp and
    * hard-linked into place — link(2) is atomic and fails if the name
    * exists, so concurrent committers can never both "win" a version
    * and a reader can never observe a partial manifest. */
  def cas(base: String, v: Int, entries: Seq[(Int, String)]): Boolean = {
    val path = manifestPath(base, v)
    // parent covers both layouts: manifests/ flat, manifests/g<k>/ past
    // the GroupSize gate
    new java.io.File(path).getParentFile.mkdirs()
    casFile(path,
      entries.sortBy(_._1).map { case (p, d) => s"$p\t$d" }.mkString("\n"))
  }

  /** The raw primitive behind [[cas]]: create-if-absent publish of
    * `body` at `path` via staged tmp + link(2). All-or-nothing
    * visibility AND first-writer-wins, for stores whose manifest is
    * not a partition map (e.g. the streaming versioned sink's
    * file-list manifests). Parent dir must exist. */
  def casFile(path: String, body: String): Boolean = {
    val tmp = Paths.get(
      s"$path.tmp.${ProcessHandle.current().pid()}.${Thread.currentThread().getId}")
    Files.write(tmp, body.getBytes("UTF-8"))
    // fsync the staged bytes BEFORE publishing the link: without it a
    // power/kernel crash can persist the link (metadata) ahead of the
    // data blocks, leaving a committed-looking torn manifest — the
    // Delta LogStore discipline (review r11). Process kills never
    // needed this; machine crashes do.
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.force(true) finally ch.close()
    try {
      Files.createLink(Paths.get(path), tmp)
      // fsync the PARENT DIRECTORY too: link(2) creates a directory
      // entry, and entries are metadata of the dir, not the file — on
      // a power/kernel crash the entry itself can vanish after other
      // processes already observed the commit, exactly the divergence
      // the versionedSink store/checkpoint gate reports as "lost
      // manifests" (review r12). Linux lets a directory be opened
      // READ and force()d; elsewhere this degrades to the pre-r12
      // behavior (best-effort, never fails the won CAS).
      try {
        val dir = java.nio.channels.FileChannel.open(
          Paths.get(path).toAbsolutePath.getParent,
          java.nio.file.StandardOpenOption.READ)
        try dir.force(true) finally dir.close()
      } catch { case _: java.io.IOException => () }
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally Files.delete(tmp)
  }

  /** Publish with optimistic retry. `prepareAgainst(v)` recomputes the
    * writer's CoW data against version `v` — invoked only when a
    * conflicting winner touched one of this writer's partitions.
    * Returns the commit receipt; throws after `maxAttempts` CAS losses
    * (pathological contention — callers surface it, never spin). */
  def publish(base: String, first: Prepared,
      prepareAgainst: Int => Prepared, maxAttempts: Int = 20): Committed = {
    var pc = first
    var recomputed = false
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      if (cas(base, pc.baseVersion + 1, pc.entries))
        return Committed(pc.writer, first.baseVersion, pc.baseVersion + 1,
          attempts, recomputed, pc.entries)
      // Lost the race: find what actually committed, diff it against
      // the manifest this writer's data was computed from.
      val cur = currentVersion(base)
      require(cur > pc.baseVersion,
        s"CAS of v${pc.baseVersion + 1} failed but current=$cur — corrupt store")
      val curMan = readManifest(base, cur)
      val baseMan = readManifest(base, pc.baseVersion)
      val curMap = curMan.toMap
      val baseMap = baseMan.toMap
      // diff over the UNION of partition keys: a partition the winner
      // REMOVED (in base, not in cur) is as much a conflict as one it
      // rewrote — detecting only cur-side differences would let a
      // loser resurrect deleted bytes (review r11)
      val changed = (curMap.keySet ++ baseMap.keySet)
        .filter(p => curMap.get(p) != baseMap.get(p))
      if (changed.intersect(pc.touched.toSet).nonEmpty) {
        // True write-write conflict: the winner rewrote (or removed)
        // bytes this writer's CoW read. Data is stale — recompute
        // from `cur`.
        pc = prepareAgainst(cur)
        recomputed = true
      } else {
        // Disjoint partitions: data still valid; rebase = the winner's
        // manifest with this writer's touched entries UPSERTED — a
        // partition this writer ADDS (absent from the winner's
        // manifest) must survive the rebase, not silently vanish
        // (review r11)
        val mine = pc.touched.toSet
        val curKeys = curMan.map(_._1).toSet
        pc = pc.copy(
          baseVersion = cur,
          entries = curMan.map { case (p, d) =>
            (p, if (mine.contains(p)) pc.dataDir else d)
          } ++ pc.touched.filterNot(curKeys.contains)
            .map(p => (p, pc.dataDir)))
      }
    }
    throw new IllegalStateException(
      s"writer ${pc.writer}: gave up after $maxAttempts CAS attempts")
  }
}

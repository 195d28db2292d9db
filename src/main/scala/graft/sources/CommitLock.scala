package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** The ONE storage primitive the transaction log depends on: atomically
  * publish a fully-written commit file at a version path, failing (not
  * replacing) if the version is already claimed. Everything else in the
  * protocol — snapshot isolation, [[TxnTable.casRetry]]'s rebase loop,
  * orphan-file reclamation — composes on top of this seam, so porting the
  * engine to a new store means implementing exactly one small trait.
  *
  * Implementations:
  *  - [[HardLinkLock]] (default): link(2) fails atomically if the target
  *    exists — the right primitive on POSIX/NFS filesystems, where this
  *    engine's tests run.
  *  - [[LeaseLock]]: for S3-class object stores where hard links do not
  *    exist and a plain rename/PUT silently REPLACES (the classic
  *    lost-commit race). A small lease object is acquired by
  *    create-exclusive (conditional put / If-None-Match — the one atomic
  *    primitive every major object store now offers), the version file is
  *    written under the lease, and the lease releases. Crashed holders are
  *    stolen after expiry; long-held leases heartbeat.
  *
  * Selection: session conf `graft.commit.lock = hardlink | lease`
  * (default hardlink), or [[CommitLock.overrideLock]] for tests that
  * need a custom filesystem model. */
trait CommitLock {
  /** Publish `tmp`'s content at `dst` iff no `dst` exists. Returns true
    * when THIS writer owns the version; false when the version was already
    * claimed. `tmp` is consumed (deleted) on either outcome. */
  def claim(dst: Path, tmp: Path): Boolean
}

object CommitLock {
  /** Test seam: a non-None value wins over the session conf. */
  @volatile private[graft] var overrideLock: Option[CommitLock] = None

  private lazy val lease = new LeaseLock(LeaseLock.PosixRenameFs)

  private[sources] def active: CommitLock = overrideLock.getOrElse {
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(_.conf.getOption("graft.commit.lock")) match {
      case Some("lease") => lease
      case Some("hardlink") | None => HardLinkLock
      case Some(other) => sys.error(
        s"graft.commit.lock: unknown implementation '$other' (hardlink | lease)")
    }
  }
}

/** link(2) is a true compare-and-set: it fails atomically with EEXIST when
  * the target exists, where rename(2) silently replaces. One syscall, no
  * coordination state, no liveness concerns — the default wherever the
  * log lives on a POSIX-semantics filesystem. */
object HardLinkLock extends CommitLock {
  override def claim(dst: Path, tmp: Path): Boolean =
    try { Files.createLink(dst, tmp); Files.deleteIfExists(tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
}

/** Lease-file version claim for stores whose ONLY atomic primitives are
  * conditional-put of a new object (create-exclusive), read, delete, and
  * replacing rename — the S3-class contract ([[LeaseLock.Fs]] is exactly
  * that surface, so the impl cannot quietly reach for links).
  *
  * Protocol per claim:
  *  1. ACQUIRE `<logdir>/.commit-lease` by create-exclusive, payload
  *     `uuid:expiryMs`. A present, unexpired lease means another writer is
  *     mid-commit → this claim fails like a lost CAS (the caller's retry
  *     loop re-reads the log and tries the next version). An EXPIRED lease
  *     is stolen: delete + re-acquire (two stealers race on the
  *     create-exclusive; exactly one wins).
  *  2. Under the lease: if `dst` exists the version is taken → release,
  *     false. Otherwise rename `tmp` → `dst` (replace-rename is safe HERE
  *     because only the lease holder writes commit files).
  *  3. VERIFY + RELEASE: re-read the lease; if it is still ours, delete it
  *     and succeed. If it was stolen mid-write (a pathological pause
  *     longer than `leaseMs` inside a millisecond-scale critical section),
  *     fail LOUDLY — the rename may have raced the thief's commit, and a
  *     silently "successful" lost commit is the one outcome the protocol
  *     exists to prevent. Keep `leaseMs` orders of magnitude above the
  *     exists-check + rename latency; [[heartbeat]] extends a held lease
  *     for implementations that need longer critical sections.
  */
final class LeaseLock(fs: LeaseLock.Fs,
                      leaseMs: Long = 30000L,
                      acquireWaitMs: Long = 10000L) extends CommitLock {
  import java.nio.charset.StandardCharsets.UTF_8

  private def leasePath(dst: Path): Path =
    dst.getParent.resolve(".commit-lease")
  private def payload(id: String): Array[Byte] =
    s"$id:${System.currentTimeMillis() + leaseMs}".getBytes(UTF_8)
  /** Total: None for a payload that is empty or malformed. A real object
    * store's conditional put is atomic (the object appears whole or not at
    * all), but the POSIX adapter's create-then-write is two syscalls, so a
    * concurrent read CAN observe a zero-byte lease mid-put — and defensive
    * parsing also covers operator-truncated debris on any store. */
  private def parse(bytes: Array[Byte]): Option[(String, Long)] = {
    val s = new String(bytes, UTF_8)
    val i = s.lastIndexOf(':')
    if (i <= 0) None
    else scala.util.Try((s.substring(0, i), s.substring(i + 1).toLong)).toOption
  }

  /** Acquire the lease for `dst`'s log directory; returns the holder id,
    * or None when a live competitor held it for the whole wait window. */
  private[graft] def acquire(dst: Path): Option[String] = {
    val lease = leasePath(dst)
    val me = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireWaitMs
    var tornSince = -1L // first sighting of an unparseable lease payload
    while (System.currentTimeMillis() < deadline) {
      if (fs.createExclusive(lease, payload(me))) return Some(me)
      fs.read(lease) match {
        case Some(bytes) =>
          parse(bytes) match {
            case Some((_, expiry)) =>
              tornSince = -1L
              if (expiry < System.currentTimeMillis()) fs.delete(lease) // steal
              else Thread.sleep(5)
            case None =>
              // torn read of an in-flight put: resolves in microseconds.
              // Debris that STAYS unparseable for a whole lease term is a
              // crashed mid-put create — stealable like any expired lease.
              val now = System.currentTimeMillis()
              if (tornSince < 0) tornSince = now
              else if (now - tornSince > leaseMs) { fs.delete(lease); tornSince = -1L }
              else Thread.sleep(1)
          }
        case None => () // released between our put and read — retry now
      }
    }
    None
  }

  /** Extend a HELD lease (same id, fresh expiry) — replace-rename of our
    * own lease object, legal because we hold it. */
  private[graft] def heartbeat(dst: Path, me: String): Unit = {
    val lease = leasePath(dst)
    require(fs.read(lease).flatMap(parse).exists(_._1 == me),
      "heartbeat on a lease this writer no longer holds")
    fs.replaceWith(lease, payload(me))
  }

  private[graft] def release(dst: Path, me: String): Unit = {
    val lease = leasePath(dst)
    if (fs.read(lease).flatMap(parse).exists(_._1 == me)) fs.delete(lease)
  }

  override def claim(dst: Path, tmp: Path): Boolean = {
    val me = acquire(dst).getOrElse {
      fs.delete(tmp)
      return false // busy lease: surface as a lost CAS, caller rebases
    }
    try {
      if (fs.exists(dst)) { fs.delete(tmp); return false }
      fs.rename(dst, tmp)
      // fencing check — see class doc step 3
      val stillMine = fs.read(leasePath(dst)).flatMap(parse).exists(_._1 == me)
      if (!stillMine) sys.error(
        s"graft commit lock: lease for $dst was stolen mid-claim (holder " +
          s"paused past ${leaseMs}ms?) — the commit may have raced another " +
          "writer's; reconcile the log before further writes")
      true
    } finally release(dst, me)
  }
}

object LeaseLock {
  /** The narrow filesystem contract [[LeaseLock]] is allowed: models an
    * object store. NO hard links, NO fail-if-exists rename — `rename`
    * silently replaces (the property that makes the naive CAS unsafe and
    * this lock necessary). `createExclusive` is conditional put. */
  trait Fs {
    /** Atomically create `p` with `bytes` iff absent; false if present. */
    def createExclusive(p: Path, bytes: Array[Byte]): Boolean
    def read(p: Path): Option[Array[Byte]]
    def delete(p: Path): Unit
    def exists(p: Path): Boolean
    /** Move `src` to `dst`, silently REPLACING any existing `dst`. */
    def rename(dst: Path, src: Path): Unit
    /** Overwrite `p` in place with `bytes` (PUT over an owned object). */
    def replaceWith(p: Path, bytes: Array[Byte]): Unit
  }

  /** Production adapter over java.nio restricted to the object-store
    * surface (create-exclusive via CREATE_NEW, replacing renames) — used
    * when `graft.commit.lock=lease` is selected on a real filesystem. */
  object PosixRenameFs extends Fs {
    override def createExclusive(p: Path, bytes: Array[Byte]): Boolean =
      try {
        Files.write(p, bytes, java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    override def read(p: Path): Option[Array[Byte]] =
      try Some(Files.readAllBytes(p))
      catch { case _: java.io.IOException => None }
    override def delete(p: Path): Unit = Files.deleteIfExists(p)
    override def exists(p: Path): Boolean = Files.exists(p)
    override def rename(dst: Path, src: Path): Unit =
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    override def replaceWith(p: Path, bytes: Array[Byte]): Unit = {
      val tmp = p.resolveSibling(p.getFileName.toString + ".hb")
      Files.write(tmp, bytes)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

package graft.sources

/** The commit arbiter for substrates that cannot CAS — the missing
  * piece [[StoreFs]] documents for object stores: S3-class systems
  * give neither an atomic create-if-absent nor a no-replace rename,
  * so the public table formats put the COMMIT POINTER in a small
  * strongly-consistent catalog (DynamoDB/JDBC/REST for Iceberg, the
  * commit-coordinator service for Delta on S3) while data and
  * manifest bytes stay on the store. This trait is that seam: a
  * name→content binding with one atomic operation.
  *
  * Contract mirrors [[StoreFs.atomicCreateString]]'s discrimination
  * rule: [[tryCreate]] returns false ONLY when the name is already
  * bound (a genuine lost race); any I/O failure must THROW, because a
  * false sends the store's publish loop into a retry against an
  * unchanged current version.
  *
  * Bindings are immutable once created; [[drop]] (retention, tag
  * removal) is the only mutation. Contents are commit-pointer-sized
  * (a manifest JSON listing segment paths — the segments themselves
  * live on the data substrate), so a catalog never holds data-scale
  * bytes.
  */
trait CommitCatalog {
  /** Atomically bind `name` to `content` iff unbound. False = the
    * name is already bound (and ONLY that — I/O failures throw).
    */
  def tryCreate(name: String, content: String): Boolean

  /** The bound content, if any. */
  def get(name: String): Option[String]

  /** Unbind `name`; false if it was not bound. */
  def drop(name: String): Boolean

  /** All bound names starting with `prefix` (discovery: a reader
    * listing versions must see commits whose object-store
    * materialization hasn't landed yet).
    */
  def names(prefix: String): Vector[String]
}

/** Reference [[CommitCatalog]]: bindings as files in a directory,
  * serialized by ONE exclusive lock (`catalog.lock`) taken through
  * `FileChannel.lock` — the OS advisory lock that is the standard
  * cross-process mutual-exclusion primitive on POSIX and the same
  * single-writer shape a JDBC `SELECT ... FOR UPDATE` catalog gives.
  * In-JVM, racing instances additionally serialize on a process-wide
  * monitor per canonical lock path (the JVM throws
  * `OverlappingFileLockException` instead of blocking when one
  * process takes the same file lock twice).
  *
  * Entry files are named by the URL-encoded binding name and land via
  * ATOMIC_MOVE, so [[get]] never observes partial content and needs
  * no lock. This is a MINIMAL reference implementation — a production
  * catalog is a real service (indexes its names, survives node loss);
  * the store only needs the contract above.
  *
  * @param dir catalog root — must be on a filesystem whose
  *   `FileChannel.lock` is a real lock (local disk, NFSv4; NOT an
  *   object store — the catalog exists precisely because the data
  *   substrate can't arbitrate)
  */
final class FileLockCatalog(dir: String) extends CommitCatalog {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}
  import java.nio.charset.StandardCharsets.UTF_8

  private val root: Path = Paths.get(dir)
  private val entries: Path = root.resolve("entries")
  Files.createDirectories(entries)
  private val lockFile: Path = root.resolve("catalog.lock")

  private def enc(name: String): String =
    java.net.URLEncoder.encode(name, UTF_8)
  private def dec(file: String): String =
    java.net.URLDecoder.decode(file, UTF_8)

  /** Run `body` holding the catalog's exclusive lock: process-wide
    * monitor first (same-JVM racers), then the OS file lock
    * (cross-process racers). I/O failures acquiring the lock
    * propagate — per the contract they must never read as a lost
    * race.
    */
  private def locked[A](body: => A): A =
    FileLockCatalog.monitorFor(lockFile) synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try body finally l.release()
      } finally ch.close()
    }

  def tryCreate(name: String, content: String): Boolean = locked {
    val dst = entries.resolve(enc(name))
    if (Files.exists(dst)) false
    else {
      val tmp = entries.resolve(
        s".${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      try {
        Files.writeString(tmp, content)
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        true
      } finally Files.deleteIfExists(tmp)
    }
  }

  def get(name: String): Option[String] =
    // entry files are immutable and land atomically — lock-free read;
    // a concurrent drop() between exists and read surfaces as absent
    try Some(Files.readString(entries.resolve(enc(name))))
    catch { case _: java.nio.file.NoSuchFileException => None }

  def drop(name: String): Boolean =
    locked(Files.deleteIfExists(entries.resolve(enc(name))))

  def names(prefix: String): Vector[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(entries)) Vector.empty
    else scala.util.Using.resource(Files.list(entries))(
      _.iterator().asScala.map(_.getFileName.toString)
        // scratch files start with '.'; every real entry's encoded
        // name starts with its path's first character (a name ENDING
        // in .tmp — e.g. a tag called "backup.tmp" — is legitimate)
        .filterNot(_.startsWith(".")).map(dec)
        .filter(_.startsWith(prefix)).toVector.sorted)
  }
}

object FileLockCatalog {
  // one monitor per canonical lock path: two catalog instances in one
  // JVM must serialize BEFORE touching the OS lock (FileChannel.lock
  // throws OverlappingFileLockException on a same-JVM re-acquire
  // rather than blocking)
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(p: java.nio.file.Path): Object =
    monitors.computeIfAbsent(
      p.toAbsolutePath.normalize.toString, _ => new Object)
}

/** [[StoreFs]] for substrates that cannot CAS, arbitrated by a
  * [[CommitCatalog]] — the executable form of the object-store commit
  * story [[StoreFs]] documents: every version/tag creation routes
  * through the catalog (exactly one winner per name, cross-process),
  * while bulk bytes — data files, manifest segments, staging — flow
  * through `inner` untouched. The catalog binding IS the commit of
  * record; the same content is then materialized onto `inner` at the
  * same path so readers, listings and maintenance sweeps keep working
  * against the data substrate, and any reader finding the object
  * missing (a writer that crashed between catalog commit and
  * materialization) HEALS it from the catalog — a committed version
  * can never be lost to a materialization failure.
  *
  * Deletions (retention vacuum, dropTag, destroy) unbind the catalog
  * and delete the object, keeping the two views coherent; name REUSE
  * after a drop (destroy + re-init) therefore works.
  *
  * The inner substrate's own CAS is never invoked, so
  * `CatalogStoreFs(new HadoopStoreFs(conf), catalog)` is safe for
  * CONCURRENT committers even on schemes whose rename replaces
  * (file://, s3a://) — the configuration [[HadoopStoreFs]] refuses
  * without a single-writer declaration.
  */
final class CatalogStoreFs(inner: StoreFs, catalog: CommitCatalog)
    extends StoreFs {

  private def parentOf(path: String): String =
    path.substring(0, path.lastIndexOf('/'))

  /** Best-effort object write for catalog-committed content: sibling
    * tmp + atomic move so inner readers never see a partial file. A
    * losing move against an already-healed object is fine — the
    * content is identical by construction (bindings are immutable).
    */
  private def materialize(path: String, content: String): Unit = {
    inner.mkdirs(parentOf(path))
    val tmp = s"${parentOf(path)}/.${path.substring(path.lastIndexOf('/') + 1)}" +
      s"-${java.util.UUID.randomUUID().toString.take(8)}.tmp"
    inner.writeString(tmp, content)
    try inner.move(tmp, path)
    catch {
      case e: Throwable =>
        inner.delete(tmp)
        if (!inner.exists(path)) throw e // lost to a racing heal = fine
    }
  }

  def atomicCreateString(path: String, content: String): Boolean = {
    if (!catalog.tryCreate(path, content)) return false
    // sole owner of the name from here on. Materialization is a cache
    // fill — if it fails the commit STANDS (the catalog holds it) and
    // reads heal lazily; failing the commit here would make the
    // caller treat a committed version as failed, re-stage, lose the
    // tryCreate, read that as a lost race and land the batch AGAIN.
    // NonFatal, not just IOException: object-store clients surface
    // transport failures as RuntimeExceptions.
    try materialize(path, content)
    catch { case scala.util.control.NonFatal(_) => () }
    true
  }

  def exists(path: String): Boolean =
    inner.exists(path) || catalog.get(path).isDefined

  def readString(path: String): String =
    if (inner.exists(path)) inner.readString(path)
    else catalog.get(path) match {
      case Some(c) => materialize(path, c); c // heal the crashed commit
      case None    => inner.readString(path)  // surface inner's error
    }

  /** Materialize any catalog-bound child missing from `dir` so the
    * delegated listing (and every downstream mtime/size stat) sees
    * the full committed set.
    */
  private def healDir(dir: String): Unit =
    catalog.names(dir + "/").foreach { name =>
      if (name.lastIndexOf('/') == dir.length && !inner.exists(name))
        catalog.get(name).foreach(materialize(name, _))
    }

  def list(dir: String): Vector[String] = { healDir(dir); inner.list(dir) }
  def listStat(dir: String): Vector[StoreFs.Stat] = {
    healDir(dir); inner.listStat(dir)
  }

  def delete(path: String): Boolean = {
    val unbound = catalog.drop(path)
    inner.delete(path) || unbound
  }

  def deleteRecursively(path: String): Unit = {
    catalog.names(path + "/").foreach(catalog.drop)
    catalog.drop(path)
    inner.deleteRecursively(path)
  }

  // pure delegation: non-CAS traffic never touches the catalog
  def mkdirs(dir: String): Unit = inner.mkdirs(dir)
  def isDir(path: String): Boolean = inner.isDir(path)
  def isFile(path: String): Boolean =
    inner.isFile(path) || (!inner.exists(path) && catalog.get(path).isDefined)
  def writeString(path: String, content: String): Unit =
    inner.writeString(path, content)
  def move(src: String, dst: String): Unit = inner.move(src, dst)
  def mtimeMs(path: String): Long = {
    if (!inner.exists(path)) catalog.get(path).foreach(materialize(path, _))
    inner.mtimeMs(path)
  }
  def sizeBytes(path: String): Long = {
    if (!inner.exists(path)) catalog.get(path).foreach(materialize(path, _))
    inner.sizeBytes(path)
  }
}

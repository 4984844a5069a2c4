package graft.sources

/** The storage seam under [[SnapshotStore]]'s commit protocol: every
  * metadata/file operation the protocol needs, small enough to
  * implement over any filesystem-shaped substrate. Paths are plain
  * strings ("/" separated; absolute local paths or any URI the
  * backing filesystem understands) — the store does all path
  * arithmetic by string concatenation, so one root string works
  * against every impl. Bulk DATA bytes never flow through this seam:
  * parquet reads/writes go through Spark's own Hadoop IO against the
  * same path strings. ([[TarShardStore]] needs no seam — both its
  * paths already speak `org.apache.hadoop.fs.FileSystem` directly:
  * executor-side streaming shard writes and `binaryFile` reads.)
  *
  * What the commit protocol actually demands of a substrate:
  *
  *   - [[move]] must be an atomic same-filesystem rename that never
  *     leaves a half-file at `dst` (data files hop tmp→data/, the
  *     version CAS publishes full content in one step).
  *   - [[atomicCreateString]] must atomically create-if-absent with
  *     full content visible — the optimistic-concurrency CAS every
  *     version/tag lands through — and must return false ONLY for a
  *     genuine lost race (the path exists): an I/O failure must
  *     THROW, because a false here sends the publish loop into a
  *     retry against an unchanged current version. POSIX gives the
  *     CAS via hard links, HDFS via rename-without-replace. An
  *     OBJECT STORE (S3) gives neither: deployments there put the
  *     CAS in a catalog or lock service (the public Iceberg catalog
  *     answer — commit pointers in a DynamoDB/JDBC/REST catalog,
  *     data and manifests in the store) and implement this method
  *     against THAT; everything else below maps to plain object
  *     operations.
  *
  * Implementations: [[NioStoreFs]] (the default — java.nio over
  * local paths, bit-identical to the store's historical behavior)
  * and [[HadoopStoreFs]] (any `org.apache.hadoop.fs.FileSystem`:
  * file://, hdfs://, ...).
  */
trait StoreFs {
  /** Create `dir` and any missing parents (idempotent). */
  def mkdirs(dir: String): Unit
  def exists(path: String): Boolean
  def isDir(path: String): Boolean
  def isFile(path: String): Boolean
  /** Child NAMES of `dir` (no paths, this level only), sorted. */
  def list(dir: String): Vector[String]
  /** Children of `dir` WITH the stats the maintenance sweeps need,
    * in one listing pass where the substrate allows (Hadoop
    * `listStatus` already carries both facts; per-file stat RPCs on
    * a 100 k-file directory are the alternative). Entries that
    * vanish mid-listing (a concurrent writer cleaning up its own
    * lost-CAS litter) are SKIPPED, not thrown — the sweep tolerates
    * racing deleters by construction. Sorted by name.
    */
  def listStat(dir: String): Vector[StoreFs.Stat]
  def readString(path: String): String
  /** Write full content (overwrite). NOT the CAS — see
    * [[atomicCreateString]].
    */
  def writeString(path: String, content: String): Unit
  /** The commit CAS: atomically create `path` with `content` iff it
    * does not exist; a reader never observes partial content. False
    * = another writer owns the path (and ONLY that — I/O failures
    * throw). Implementations clean up their own scratch on every
    * exit path.
    */
  def atomicCreateString(path: String, content: String): Boolean
  /** Atomic same-filesystem rename; throws if it cannot be atomic. */
  def move(src: String, dst: String): Unit
  /** Delete a file (or empty dir) if present; false if absent. */
  def delete(path: String): Boolean
  def deleteRecursively(path: String): Unit
  /** Last-modified epoch millis (the vacuum age gate's clock). */
  def mtimeMs(path: String): Long
  /** File size in bytes (per-file byte stats at commit time). */
  def sizeBytes(path: String): Long
}

object StoreFs {
  /** One [[StoreFs.listStat]] entry. */
  final case class Stat(name: String, isFile: Boolean, mtimeMs: Long)
}

/** java.nio over plain local paths — the default substrate, exactly
  * the store's historical behavior: ATOMIC_MOVE renames, hard-link
  * create-if-absent CAS.
  */
object NioStoreFs extends StoreFs {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  private def p(s: String): Path = Paths.get(s)

  def mkdirs(dir: String): Unit = Files.createDirectories(p(dir))
  def exists(path: String): Boolean = Files.exists(p(path))
  def isDir(path: String): Boolean = Files.isDirectory(p(path))
  def isFile(path: String): Boolean = Files.isRegularFile(p(path))

  /** Closes the stream — a bare `Files.list` leaks one directory
    * handle per call, which accumulates in a long-lived driver doing
    * frequent commits.
    */
  def list(dir: String): Vector[String] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(p(dir)))(
      _.iterator().asScala.map(_.getFileName.toString).toVector.sorted)
  }

  def listStat(dir: String): Vector[StoreFs.Stat] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(p(dir)))(
      _.iterator().asScala.flatMap { f =>
        // an entry deleted between list and stat is a concurrent
        // writer's cleanup, not an error — skip it
        try Some(StoreFs.Stat(f.getFileName.toString,
          Files.isRegularFile(f), Files.getLastModifiedTime(f).toMillis))
        catch { case _: java.io.IOException => None }
      }.toVector.sortBy(_.name))
  }

  def readString(path: String): String = Files.readString(p(path))
  def writeString(path: String, content: String): Unit = {
    Files.writeString(p(path), content); ()
  }

  /** Content writes to a sibling dotfile, then lands via
    * `Files.createLink` — an atomic CREATE that FAILS if the target
    * exists (unlike a rename, which replaces on POSIX). The dotfile
    * is removed on every exit path, including a failed write.
    */
  def atomicCreateString(path: String, content: String): Boolean = {
    val dst = p(path)
    val tmp = dst.resolveSibling(
      s".${dst.getFileName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    try {
      Files.writeString(tmp, content)
      Files.createLink(dst, tmp)
      true
    }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def move(src: String, dst: String): Unit = {
    Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE); ()
  }
  def delete(path: String): Boolean = Files.deleteIfExists(p(path))

  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p(path)))
      scala.util.Using.resource(Files.walk(p(path)))(
        _.iterator().asScala.toSeq.reverseIterator
          .foreach(f => Files.deleteIfExists(f)))
  }

  def mtimeMs(path: String): Long =
    Files.getLastModifiedTime(p(path)).toMillis

  def sizeBytes(path: String): Long = Files.size(p(path))
}

/** Any `org.apache.hadoop.fs.FileSystem` — file://, hdfs://, or
  * whatever the Configuration resolves for the path's scheme. The
  * CAS maps to write-tmp + rename-without-replace:
  *
  *   - HDFS: `FileSystem.rename` (no OVERWRITE) is atomic at the
  *     namenode and FAILS when the destination exists — a true CAS.
  *   - Local file://: `RawLocalFileSystem.rename` REPLACES an
  *     existing destination (POSIX rename), so an exists() precheck
  *     guards it — correct ONLY for a single concurrent creator per
  *     name (two racing committers can both pass the precheck and the
  *     slower rename silently replaces the winner: a LOST COMMIT, the
  *     one failure mode a CAS exists to prevent). Because nothing in
  *     the protocol can detect that after the fact, this impl REFUSES
  *     the CAS on any scheme whose rename may replace unless the
  *     caller declares `singleWriterCas = true` — misuse fails loudly
  *     at the first commit instead of losing one under load. A
  *     multi-writer LOCAL deployment should use [[NioStoreFs]]
  *     (hard-link CAS); an object store, [[CatalogStoreFs]].
  *   - S3A and friends: rename is copy+delete (non-atomic) and
  *     create-if-absent races — an object-store deployment routes
  *     [[atomicCreateString]] through a catalog/lock-service CAS
  *     ([[CatalogStoreFs]] over this impl); every other operation
  *     here remains valid there.
  *
  * A rename returning false with the destination ABSENT is a real
  * I/O failure, not a lost race — it throws (a false would send the
  * publish loop into an infinite retry against an unchanged current
  * version).
  *
  * @param singleWriterCas caller's declaration that at most one
  *   process ever CASes a given name — required to use the
  *   precheck+rename fallback on schemes where rename replaces
  */
class HadoopStoreFs(conf: org.apache.hadoop.conf.Configuration,
                    singleWriterCas: Boolean = false)
    extends StoreFs {
  import org.apache.hadoop.fs.{FileSystem, Path}

  private def fsOf(s: String): (FileSystem, Path) = {
    val p = new Path(s)
    (p.getFileSystem(conf), p)
  }

  def mkdirs(dir: String): Unit = {
    val (fs, p) = fsOf(dir); fs.mkdirs(p); ()
  }
  def exists(path: String): Boolean = {
    val (fs, p) = fsOf(path); fs.exists(p)
  }
  def isDir(path: String): Boolean = {
    val (fs, p) = fsOf(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }
  def isFile(path: String): Boolean = {
    val (fs, p) = fsOf(path)
    fs.exists(p) && fs.getFileStatus(p).isFile
  }

  def list(dir: String): Vector[String] = {
    val (fs, p) = fsOf(dir)
    fs.listStatus(p).map(_.getPath.getName).toVector.sorted
  }

  /** One `listStatus` round-trip carries name + kind + mtime for
    * every child — no per-file getFileStatus RPCs (2 extra per file
    * on a 100 k-file data/ would dominate a vacuum).
    */
  def listStat(dir: String): Vector[StoreFs.Stat] = {
    val (fs, p) = fsOf(dir)
    fs.listStatus(p).map(st => StoreFs.Stat(st.getPath.getName,
        st.isFile, st.getModificationTime))
      .toVector.sortBy(_.name)
  }

  def readString(path: String): String = {
    val (fs, p) = fsOf(path)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def writeString(path: String, content: String): Unit = {
    val (fs, p) = fsOf(path)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Schemes whose `rename` is atomic AND fails on an existing
    * destination — a true create-if-absent CAS. Everything else
    * (file://'s POSIX rename, object-store copy+delete) replaces or
    * races and needs the single-writer declaration or a catalog.
    */
  private val noReplaceRenameSchemes = Set("hdfs", "webhdfs", "viewfs")

  def atomicCreateString(path: String, content: String): Boolean = {
    val (fs, dst) = fsOf(path)
    if (!singleWriterCas &&
        !noReplaceRenameSchemes(fs.getUri.getScheme)) {
      // fail LOUDLY at the first commit: on this scheme the fallback
      // below is precheck+rename, and a concurrent creator would not
      // lose the CAS — it would silently REPLACE the winner's
      // committed version. The caller must either declare single-
      // writer discipline, or use NioStoreFs (POSIX hard-link CAS) /
      // CatalogStoreFs (object stores).
      throw new IllegalStateException(
        s"HadoopStoreFs CAS on scheme '${fs.getUri.getScheme}' is " +
          "precheck+rename and NOT safe for concurrent committers " +
          "(a racer silently replaces the winner). Pass " +
          "singleWriterCas = true to declare single-writer " +
          "discipline, or use NioStoreFs / CatalogStoreFs.")
    }
    if (fs.exists(dst)) return false // local rename would REPLACE
    val tmp = new Path(dst.getParent,
      s".${dst.getName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    try {
      val out = fs.create(tmp, false)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // on HDFS this rename is the atomic no-replace CAS; locally the
      // precheck above carries the create-if-absent semantics
      val won =
        try fs.rename(tmp, dst)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      if (won) true
      else if (fs.exists(dst)) { fs.delete(tmp, false); false } // lost the race
      else {
        // destination absent AND rename failed: an I/O failure, not
        // a CAS loss — surface it, never spin the caller's retry loop
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"rename $tmp -> $dst failed but the destination does not " +
            "exist — I/O error, not a lost CAS")
      }
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
        throw e
    }
  }

  def move(src: String, dst: String): Unit = {
    val (fs, s) = fsOf(src)
    val d = new Path(dst)
    if (!fs.rename(s, d))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  }

  def delete(path: String): Boolean = {
    val (fs, p) = fsOf(path)
    try fs.delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }
  }

  def deleteRecursively(path: String): Unit = {
    val (fs, p) = fsOf(path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  def mtimeMs(path: String): Long = {
    val (fs, p) = fsOf(path)
    fs.getFileStatus(p).getModificationTime
  }

  def sizeBytes(path: String): Long = {
    val (fs, p) = fsOf(path)
    fs.getFileStatus(p).getLen
  }
}

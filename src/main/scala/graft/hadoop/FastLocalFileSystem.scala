package graft.hadoop

import java.io.{FileNotFoundException, FileOutputStream, OutputStream}
import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file:` FileSystem without the shell-fork permission calls,
  * plugged in via `fs.file.impl` (spark.hadoop.fs.file.impl in the
  * session conf).
  *
  * WHY (measured, round 20 — the FileSystem-API sibling of the
  * NioCheckpointFileManager fix): with no libhadoop native library,
  * RawLocalFileSystem's LocalFSFileOutputStream constructor invokes
  * `setPermission`, which falls back to FORKING `chmod` as a child
  * process — once per created file, twice per checksummed file (data +
  * .crc). A single streaming-upsert gate run forked ~1300 processes for
  * its slice-prep, bucket-staging and sink writes; /proc/stat deltas and
  * thread dumps pin the cost. The permissions chmod would set are the
  * process-umask defaults the plain FileOutputStream already creates
  * files with — the fork buys nothing on this deployment.
  *
  * What is preserved: this is the stock LocalFileSystem (CHECKSUMMED —
  * .crc twins are still written and verified) over a raw layer whose only
  * overrides are (1) create files with FileOutputStream directly instead
  * of create-then-chmod, and (2) make explicit setPermission a no-op.
  * Rename, delete, listing, mkdirs and every read path are inherited
  * untouched. On deployments where Hadoop's native library IS present,
  * the stock classes never fork either — this class exists for the
  * containers that lack it, and dropping the config reverts to stock
  * behavior with no other change.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override protected def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: FsPermission): OutputStream =
    new FileOutputStream(pathToFile(f), append)

  /** Permission bits on a single-user local scratch FS carry no contract
    * here; the Shell fallback forks `chmod` per call. */
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  /** The stock statuses are DeprecatedRawLocalFileStatus, whose
    * getPermission LAZILY forks `ls -ld` per file — and Spark's file-index
    * listing converts every listed status to a LocatedFileStatus, which
    * reads the permission, so every scan's listing forked once per file.
    * Build plain FileStatus objects with the default permission bits
    * instead (length/mtime/isDirectory straight from java.io.File — the
    * same attributes the stock path reports). */
  private def statusFor(f: Path): FileStatus = {
    val file = pathToFile(f)
    if (!file.exists()) throw new FileNotFoundException(s"File $f does not exist")
    val dir = file.isDirectory
    new FileStatus(file.length(), dir, 1, getDefaultBlockSize(f),
      file.lastModified(), file.lastModified(),
      if (dir) FsPermission.getDirDefault else FsPermission.getFileDefault,
      null, null, makeQualified(f))
  }

  override def getFileStatus(f: Path): FileStatus = statusFor(f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists()) throw new FileNotFoundException(s"File $f does not exist")
    if (!file.isDirectory) return Array(statusFor(f))
    val names = file.list()
    if (names == null) throw new java.io.IOException(s"Could not list $f")
    names.sorted.map(n => statusFor(new Path(f, n)))
  }
}

class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

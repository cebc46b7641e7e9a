package graft.sources

import java.io.FileNotFoundException
import java.nio.file.{Files, NoSuchFileException}
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** [[org.apache.hadoop.fs.RawLocalFileSystem]] with a no-fork
  * `setPermission`.
  *
  * Without libhadoop (NativeIO) on the classpath — this sandbox, and any
  * vanilla-JVM deployment — Hadoop's RawLocalFileSystem falls back to
  * `Shell.execCommand("chmod", …)`: a full `fork`+`exec` of a chmod
  * process PER CREATED FILE AND DIRECTORY (`create` and
  * `mkOneDirWithMode` both route through `setPermission`). Driver jstack
  * sampling during the r21 optimization pass caught the main thread
  * inside that fork on 2 of 8 samples of an index-lifecycle query — at
  * hundreds of tiny files per lifecycle gate (generation dirs, state
  * store deltas, WAL entries, committer `_temporary` trees) the forks
  * are a multi-second per-query tax on both driver gaps and task time.
  *
  * The override sets the same POSIX bits through
  * `java.nio.file.Files.setPosixFilePermissions` — one `chmod(2)`
  * syscall, no process. Bits outside the 9-bit rwx mask (sticky/setuid/
  * setgid, which NIO's POSIX view cannot express) fall back to the
  * parent's shell path, preserving exact semantics on the (never hit in
  * this engine) exotic-permission case. Missing paths raise
  * `FileNotFoundException` like every other RawLocalFileSystem op.
  *
  * Wired in via `fs.file.impl` by [[graft.core.GraftSession]] whenever
  * the raw (no-.crc) local filesystem is requested; scale-neutral — on
  * hdfs:// or s3a:// stores this class is never instantiated. */
class NioLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) { // sticky/setuid/setgid: NIO can't — shell out
      super.setPermission(p, permission)
      return
    }
    val set = new java.util.HashSet[PosixFilePermission]()
    def add(bit: Int, perm: PosixFilePermission): Unit =
      if ((bits & bit) != 0) { set.add(perm); () }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    try Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(
          s"Path $p does not exist (setPermission)")
    }
    ()
  }
}

package graft

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem: local disk behind a non-`file` scheme, so
  * specs can prove the bucket plumbing goes through the Hadoop FS API
  * (java.nio would choke on the `mock:/...` paths).
  *
  * Statuses are copied with materialized (default) permissions:
  * RawLocalFileSystem's deprecated lazy permission loader does
  * `new File(path.toUri)`, which rejects any scheme but `file`.
  */
class MockFs extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")

  private def clean(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    clean(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(clean)
}

/** [[MockFs]] variant that REFUSES setTimes — the object-store shape
  * (raw S3A throws UnsupportedOperationException) where the claim/marker
  * heartbeats must fall back to rewriting the file instead of refreshing
  * its mtime in place. */
class MockNoSetTimesFs extends MockFs {
  override def getScheme: String = "mocknst"
  override def getUri: URI = URI.create("mocknst:///")
  override def setTimes(f: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      s"$getScheme does not support setTimes")
}

/** [[MockFs]] variant that COUNTS metadata RPCs (stat / list / open),
  * for pinning per-operation RPC budgets — e.g. the claim protocol's
  * busy fast path must refuse on ONE stat with no directory LIST (the
  * expensive RPC on object stores). Counters are global (the FS
  * instance is cached per scheme by Hadoop). */
class MockCountingFs extends MockFs {
  override def getScheme: String = "mockcnt"
  override def getUri: URI = URI.create("mockcnt:///")
  override def getFileStatus(f: Path): FileStatus = {
    MockCountingFs.stats.incrementAndGet()
    super.getFileStatus(f)
  }
  override def globStatus(pathPattern: Path): Array[FileStatus] = {
    MockCountingFs.globs.incrementAndGet()
    super.globStatus(pathPattern)
  }
  override def listStatus(f: Path): Array[FileStatus] = {
    MockCountingFs.lists.incrementAndGet()
    super.listStatus(f)
  }
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    MockCountingFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object MockCountingFs {
  val stats = new java.util.concurrent.atomic.AtomicInteger(0)
  val globs = new java.util.concurrent.atomic.AtomicInteger(0)
  val lists = new java.util.concurrent.atomic.AtomicInteger(0)
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { stats.set(0); globs.set(0); lists.set(0); opens.set(0) }
}

/** Full raw-S3A-semantics mock, for pinning the generation-lock
  * protocol's documented object-store degradation as a SPEC instead of a
  * scaladoc argument:
  *
  *  - file rename is COPY + DELETE: non-atomic, and the destination is a
  *    NEW object whose mtime is the copy time (S3's Last-Modified) — a
  *    renamed-aside claim always looks freshly written;
  *  - `create(overwrite = false)` is CHECK-then-act with a widened
  *    window (a deliberate sleep between the existence check and the
  *    overwriting create), so two racers genuinely can both "win" the
  *    create — at-most-one-commit must then come from the nonce
  *    read-back + pre-commit verify, exactly as documented;
  *  - setTimes is unsupported (heartbeats fall back to rewrite).
  */
class MockS3Fs extends MockFs {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  override def setTimes(f: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException(
      s"$getScheme does not support setTimes")

  override def rename(src: Path, dst: Path): Boolean = {
    val st =
      try getFileStatus(src)
      catch { case _: java.io.FileNotFoundException => return false }
    if (st.isDirectory) return super.rename(src, dst) // claims are files
    if (exists(dst)) return false
    val in = open(src)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](4096)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        buf.toByteArray
      } finally in.close()
    val out = create(dst, true) // new object: mtime = NOW, not preserved
    try out.write(bytes) finally out.close()
    delete(src, false)
    true
  }

  // the check-then-act gate, factored so BOTH create overloads that
  // RawLocalFileSystem actually dispatches through get it. The 6-arg
  // (Path, boolean, ...) variant is the one FileSystem.create(Path,
  // boolean) chains to — overriding only the FsPermission variant
  // leaves the gate as dead code (RawLocalFileSystem routes that one
  // through a private helper via invokespecial).
  private def checkThenActGate(f: Path, overwrite: Boolean): Unit =
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(5) // widen the check-then-act window: races are REAL here
    }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    checkThenActGate(f, overwrite)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    checkThenActGate(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }
}

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

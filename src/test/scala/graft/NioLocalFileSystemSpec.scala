package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the r21 [[graft.sources.NioLocalFileSystem]]
  * optimization (fork-free setPermission): the NIO path must set exactly
  * the bits RawLocalFileSystem's shell path sets, keep the
  * FileNotFound contract, and serve a normal write/read round trip when
  * wired in via fs.file.impl. */
class NioLocalFileSystemSpec extends AnyFunSuite {

  private def fsFor(impl: String): FileSystem = {
    val conf = new Configuration()
    conf.set("fs.file.impl", impl)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    FileSystem.get(new java.net.URI("file:///"), conf)
  }

  private val nioImpl = classOf[graft.sources.NioLocalFileSystem].getName
  private val rawImpl = "org.apache.hadoop.fs.RawLocalFileSystem"

  private def posixBits(path: String): Int = {
    import java.nio.file.attribute.PosixFilePermission._
    val set = Files.getPosixFilePermissions(Paths.get(path))
    Seq(OWNER_READ -> 0x100, OWNER_WRITE -> 0x80, OWNER_EXECUTE -> 0x40,
      GROUP_READ -> 0x20, GROUP_WRITE -> 0x10, GROUP_EXECUTE -> 0x8,
      OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2, OTHERS_EXECUTE -> 0x1)
      .collect { case (p, b) if set.contains(p) => b }.sum
  }

  test("setPermission: NIO bits match the RawLocalFileSystem shell path") {
    val dir = Files.createTempDirectory("nio_fs_spec").toString
    val nio = fsFor(nioImpl); val raw = fsFor(rawImpl)
    // rwx combinations incl. asymmetric group/other bits
    Seq(0x1ed /*0755*/ , 0x1a4 /*0644*/ , 0x1c0 /*0700*/ , 0x1ff /*0777*/ ,
        0x124 /*0444*/ ).foreach { bits =>
      val a = new Path(s"$dir/nio_$bits"); val b = new Path(s"$dir/raw_$bits")
      nio.create(a).close(); raw.create(b).close()
      nio.setPermission(a, new FsPermission(bits.toShort))
      raw.setPermission(b, new FsPermission(bits.toShort))
      assert(posixBits(a.toUri.getPath) === bits,
        s"NIO bits for ${Integer.toOctalString(bits)}")
      assert(posixBits(a.toUri.getPath) === posixBits(b.toUri.getPath),
        s"NIO vs shell parity for ${Integer.toOctalString(bits)}")
    }
  }

  test("setPermission on a missing path raises FileNotFoundException") {
    val nio = fsFor(nioImpl)
    intercept[java.io.FileNotFoundException] {
      nio.setPermission(new Path("/tmp/nio_fs_spec_definitely_absent_x9"),
        new FsPermission(0x1a4.toShort))
    }
  }

  test("create + mkdirs + rename + read round-trip under fs.file.impl") {
    val dir = Files.createTempDirectory("nio_fs_rt").toString
    val nio = fsFor(nioImpl)
    val sub = new Path(s"$dir/a/b/c")
    assert(nio.mkdirs(sub))
    val f = new Path(sub, "data.bin")
    val out = nio.create(f)
    out.write("round trip".getBytes("UTF-8")); out.close()
    val dst = new Path(sub, "renamed.bin")
    assert(nio.rename(f, dst))
    val in = nio.open(dst)
    val buf = new Array[Byte](10); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") === "round trip")
    val st = nio.getFileStatus(dst)
    assert(st.getLen === 10L)
  }
}

package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Microbench for the r21 NioLocalFileSystem fix: time N
  * create+close+mkdirs cycles through RawLocalFileSystem (Shell-fallback
  * chmod: one fork per created file/dir without libhadoop) vs
  * [[graft.sources.NioLocalFileSystem]] (java.nio setPermission). */
object FsForkBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300
    def bench(impl: String, tag: String): Unit = {
      val conf = new Configuration()
      conf.set("fs.file.impl", impl)
      conf.setBoolean("fs.file.impl.disable.cache", true)
      val fs = FileSystem.get(new java.net.URI("file:///"), conf)
      val base = new Path(s"/tmp/fsforkbench_$tag")
      fs.delete(base, true)
      fs.mkdirs(base)
      // warm
      (0 until 20).foreach { i =>
        val f = new Path(base, s"w$i"); fs.create(f).close()
      }
      val t0 = System.nanoTime()
      (0 until n).foreach { i =>
        val d = new Path(base, s"d$i")
        fs.mkdirs(d)
        val f = new Path(d, "part")
        fs.create(f).close()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-8s $n mkdir+create+close cycles: $sec%.3f s  (${sec / n * 1000}%.2f ms/cycle)")
      fs.delete(base, true)
    }
    bench("org.apache.hadoop.fs.RawLocalFileSystem", "raw")
    bench(classOf[graft.sources.NioLocalFileSystem].getName, "nio")
    bench("org.apache.hadoop.fs.RawLocalFileSystem", "raw2")
    bench(classOf[graft.sources.NioLocalFileSystem].getName, "nio2")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Quantized-DFT audio features: decode-path equivalence with a driver
  * replica, and spectral sanity (a pure tone concentrates energy in its
  * own bin). */
class AudioSpectrumSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def wavOf(samples: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def spectrum(rows: Seq[(Long, Array[Byte])], freqs: Seq[Int], n: Int) = {
    val assets = Multimodal.toAssets(
      rows.toDF("doc_id", "wav").withColumn("src", lit("t")),
      "doc_id", "wav", "audio", "src")
    Multimodal.audioSpectrum(spark, assets, freqs, n)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  test("decoded spectrum equals a driver-side replica on the closed-form wave") {
    val n = 64
    val ids = Seq(0L, 1L, 7L)
    val rows = ids.map(id => id -> Multimodal.syntheticWav(id, n))
    val got = spectrum(rows, Seq(1, 3), n)
    val tab = Multimodal.spectrumTable(Seq(1, 3), n)
    ids.foreach { id =>
      val s = Array.tabulate(n)(j => java.lang.Math.floorMod(id * 17 + j * 29, 256L))
      Seq(1, 3).foreach { k =>
        val re = (0 until n).map(j => s(j) * tab.find(t => t._1 == k && t._2 == j).get._3).sum
        val im = (0 until n).map(j => s(j) * tab.find(t => t._1 == k && t._2 == j).get._4).sum
        assert(got((id, k)) == ((re, im, re * re + im * im)), s"id=$id k=$k")
      }
    }
  }

  test("a pure k=3 tone concentrates energy in bin 3") {
    val n = 64
    val tone = Array.tabulate(n) { j =>
      (128 + math.round(100.0 * math.cos(2.0 * math.Pi * 3 * j / n))).toByte
    }
    val got = spectrum(Seq(1L -> wavOf(tone)), Seq(1, 2, 3, 4, 5), n)
    val e3 = got((1L, 3))._3
    Seq(1, 2, 4, 5).foreach { k =>
      assert(e3 > 100L * got((1L, k))._3,
        s"tone energy must concentrate at k=3, but k=$k is ${got((1L, k))._3} vs $e3")
    }
  }

  test("too-short payloads fail loudly") {
    val err = intercept[Exception] {
      spectrum(Seq(1L -> wavOf(Array.fill(10)(0x40.toByte))), Seq(1), 64)
    }
    assert(err.getMessage.contains("need 64 samples"))
  }
}

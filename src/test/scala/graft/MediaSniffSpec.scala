package graft

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The container-header sniffer against AUTHENTIC files: real PNG bytes
  * from javax.imageio and a real RIFF/WAVE stream from javax.sound —
  * both produced by the JDK's own encoders, not by this repo — must
  * yield the right format, dimensions, channel count and sample rate.
  * (q_media_sniff gates the same parse against the DuckDB oracle on
  * synthesized headers; this spec pins it to genuine encoders.) */
class MediaSniffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def realWav(sampleRate: Float, channels: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val frames = 4
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("sniffs real ImageIO PNGs and AudioSystem WAVs correctly") {
    import spark.implicits._
    val rows = Seq(
      (1L, realPng(37, 21)),
      (2L, realPng(1920, 1080)),
      (3L, realWav(44100f, 2)),
      (4L, realWav(8000f, 1)),
      (5L, "not a media file".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val got = Multimodal.sniffParse(rows)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "png", Some(37L), Some(21L), None, None),
      (2L, "png", Some(1920L), Some(1080L), None, None),
      (3L, "wav", None, None, Some(2L), Some(44100L)),
      (4L, "wav", None, None, Some(1L), Some(8000L)),
      (5L, "bin", None, None, None, None)), got)
  }
}

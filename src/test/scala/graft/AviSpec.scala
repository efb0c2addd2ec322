package graft

import graft.multimodal.AviOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic AVI fixture is a real RIFF container (hdrl/avih +
  * strl/strh/strf + movi + idx1); these tests decode it back and
  * check every value against the id-arithmetic that generated it. */
class AviSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def expMean(i: Long, f: Int, w: Int, h: Int,
                      km: Long, kf: Long, kx: Long, ky: Long): Double = {
    var s = 0L
    for (x <- 0 until w; y <- 0 until h)
      s += (i * km + f * kf + x * kx + y * ky) % 256
    s.toDouble / (w * h)
  }

  test("syntheticAvi round-trips through videoMeta and frame decode") {
    import spark.implicits._
    val rows = spark.range(0, 40)
      .select(col("id"), AviOps.syntheticAvi(col("id")).as("payload"))
      .select(col("id"), AviOps.videoMeta(col("payload")).as("m"),
        AviOps.videoFrameStats(col("payload")).as("fs"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nf = (3 + i % 5).toInt
      val w = (4 + i % 6).toInt
      val h = (4 + (i * 3) % 7).toInt
      val m = r.getStruct(1)
      assert(m.getInt(0) == w && m.getInt(1) == h, s"dims id=$i")
      assert(m.getInt(2) == nf, s"n_frames id=$i")
      assert(m.getInt(3) == (nf + 2) / 3, s"n_keyframes id=$i")
      assert(m.getString(4) == "DIB")
      val fs = r.getSeq[Row](2)
      assert(fs.length == nf, s"decoded frames id=$i")
      fs.zipWithIndex.foreach { case (f, idx) =>
        assert(f.getInt(0) == idx)
        assert(f.getBoolean(1) == (idx % 3 == 0), s"key flag id=$i f=$idx")
        assert(math.abs(f.getDouble(4) -
          expMean(i, idx, w, h, 31, 19, 7, 13)) < 1e-9, s"mean_r id=$i")
        assert(math.abs(f.getDouble(5) -
          expMean(i, idx, w, h, 17, 23, 11, 3)) < 1e-9, s"mean_g id=$i")
        assert(math.abs(f.getDouble(6) -
          expMean(i, idx, w, h, 5, 29, 3, 29)) < 1e-9, s"mean_b id=$i")
      }
    }
  }

  test("sampleKeyframes picks evenly-spaced keyframes only") {
    import spark.implicits._
    val rows = spark.range(0, 20)
      .select(col("id"),
        AviOps.sampleKeyframes(AviOps.syntheticAvi(col("id")), 2).as("s"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nf = (3 + i % 5).toInt
      val kfs = (0 until nf).filter(_ % 3 == 0)
      val m = math.min(2, kfs.length)
      val expected = (0 until m).map(x => kfs(x * kfs.length / m))
      val got = r.getSeq[Row](1).map(_.getInt(0))
      assert(got == expected, s"id=$i got=$got want=$expected")
      assert(r.getSeq[Row](1).forall(_.getBoolean(1)), s"non-key id=$i")
    }
  }

  test("MJPEG frames decode through ImageIO") {
    // build a tiny MJPG AVI by hand: one JPEG frame from ImageIO
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 6) img.setRGB(x, y, 0x808080)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def s(t: String): Unit = t.foreach(c => out.write(c.toInt))
    def le16(x: Int): Unit = { out.write(x & 0xff); out.write((x >> 8) & 0xff) }
    def le32(x: Int): Unit = { le16(x & 0xffff); le16((x >> 16) & 0xffff) }
    val fsz = jpeg.length + (jpeg.length & 1)
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val moviSize = 4 + 8 + fsz
    s("RIFF"); le32(4 + 8 + hdrlSize + 8 + moviSize); s("AVI ")
    s("LIST"); le32(hdrlSize); s("hdrl")
    s("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0x10); le32(1); le32(0)
    le32(1); le32(0); le32(8); le32(6); le32(0); le32(0); le32(0); le32(0)
    s("LIST"); le32(4 + (8 + 56) + (8 + 40)); s("strl")
    s("strh"); le32(56)
    s("vids"); s("MJPG"); le32(0); le16(0); le16(0)
    le32(0); le32(1); le32(25); le32(0); le32(1); le32(0); le32(0); le32(0)
    le16(0); le16(0); le16(8); le16(6)
    s("strf"); le32(40)
    le32(40); le32(8); le32(6); le16(1); le16(24)
    s("MJPG"); le32(0); le32(2835); le32(2835); le32(0); le32(0)
    s("LIST"); le32(moviSize); s("movi")
    s("00dc"); le32(jpeg.length); out.write(jpeg)
    if ((jpeg.length & 1) == 1) out.write(0)
    val avi = out.toByteArray

    import spark.implicits._
    val fs = Seq(avi).toDF("payload")
      .select(AviOps.videoFrameStats(col("payload")).as("fs"))
      .collect()(0).getSeq[Row](0)
    assert(fs.length == 1)
    assert(fs(0).getInt(2) == 8 && fs(0).getInt(3) == 6)
    // constant gray 0x80 → all channel means ≈ 128 (JPEG is lossy but
    // a flat image survives within a small tolerance)
    assert(math.abs(fs(0).getDouble(4) - 128.0) < 2.0)
    // no idx1, but every MJPEG frame is a standalone JPEG → the
    // default policy treats it as a keyframe and sampling finds it
    val sk = Seq(avi).toDF("payload")
      .select(AviOps.sampleKeyframes(col("payload"), 2).as("s"))
      .collect()(0).getSeq[Row](0)
    assert(sk.length == 1 && sk(0).getBoolean(1))
  }

  test("non-AVI payloads return null, not garbage") {
    import spark.implicits._
    val r = Seq("plain text".getBytes, Array[Byte](1, 2, 3))
      .toDF("payload")
      .select(AviOps.videoMeta(col("payload")).as("m")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("negative chunk sizes bail out instead of looping") {
    // a RIFF/AVI header followed by a chunk whose size field is -1:
    // the walker must terminate (returning whatever it parsed so far)
    val out = new java.io.ByteArrayOutputStream()
    def s(t: String): Unit = t.foreach(c => out.write(c.toInt))
    s("RIFF"); out.write(Array[Byte](100, 0, 0, 0)); s("AVI ")
    s("JUNK"); out.write(Array[Byte](-1, -1, -1, -1))
    out.write(new Array[Byte](32))
    import spark.implicits._
    val r = Seq(out.toByteArray).toDF("payload")
      .select(AviOps.videoMeta(col("payload")).as("m")).collect()
    assert(r(0).isNullAt(0)) // no frames, no dims → null
  }
}

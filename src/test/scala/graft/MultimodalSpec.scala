package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** The honest part of the multimodal decode path: ImageHeader parses
  * the REAL byte layouts of PNG/BMP/GIF (generated here with javax
  * ImageIO, not hand-faked), unrecognized payloads fall to the stub,
  * and the Spark-side extractFeatures contract carries parsed
  * dimensions through the batched mapPartitions plan.
  */
class MultimodalSpec extends AnyFunSuite {

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("ImageHeader parses real PNG and BMP bytes from ImageIO") {
    val png = imageBytes("png", 37, 23)
    assert(Multimodal.ImageHeader.parse(png)
             .contains(Multimodal.ImageHeader.Info("png", 37, 23)))
    val bmp = imageBytes("bmp", 5, 9)
    assert(Multimodal.ImageHeader.parse(bmp)
             .contains(Multimodal.ImageHeader.Info("bmp", 5, 9)))
  }

  test("ImageHeader parses real JPEG bytes (SOF marker walk) and " +
       "rejects corrupt marker chains") {
    val jpg = imageBytes("jpg", 41, 19)
    assert(Multimodal.ImageHeader.parse(jpg)
             .contains(Multimodal.ImageHeader.Info("jpeg", 41, 19)))
    // progressive-style SOF2 with leading fill bytes and a skipped APP0
    val sof2 = Array[Int](
      0xff, 0xd8,                         // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0 len 4
      0xff, 0xff,                         // fill byte before marker
      0xff, 0xc2, 0x00, 0x0b, 0x08,       // SOF2 len 11, precision 8
      0x01, 0x00,                         // height 256
      0x02, 0x03,                         // width 515
      0x01, 0x11, 0x22, 0x00).map(_.toByte)
    assert(Multimodal.ImageHeader.parse(sof2)
             .contains(Multimodal.ImageHeader.Info("jpeg", 515, 256)))
    // SOI then a non-marker byte where a marker must start: corrupt
    val corrupt = Array[Int](0xff, 0xd8, 0x12, 0x34, 0x56, 0x78)
      .map(_.toByte)
    assert(Multimodal.ImageHeader.parse(corrupt).isEmpty)
    // DHT (C4) must NOT be read as a frame header; chain that ends in
    // SOS before any SOF yields no dims
    val dhtOnly = Array[Int](
      0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x04, 0x00, 0x01, // DHT len 4
      0xff, 0xda, 0x00, 0x02).map(_.toByte) // SOS: stop
    assert(Multimodal.ImageHeader.parse(dhtOnly).isEmpty)
  }

  test("ImageHeader parses a GIF logical screen descriptor") {
    // GIF89a, width 300 (0x012C LE), height 70 (0x46 LE) + padding
    val gif = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
                          0x2c, 0x01, 0x46, 0x00, 0, 0, 0, 0)
    assert(Multimodal.ImageHeader.parse(gif)
             .contains(Multimodal.ImageHeader.Info("gif", 300, 70)))
  }

  test("ImageHeader reads BITMAPCOREHEADER 16-bit dims and refuses " +
       "unknown DIB layouts instead of misreading them") {
    // hand-built OS/2 BITMAPCOREHEADER: 14-byte file header + 12-byte
    // DIB (size=12, width=17, height=9 as LE16, planes=1, bpp=24)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte,
                                   ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
                                   ((v >> 8) & 0xff).toByte,
                                   ((v >> 16) & 0xff).toByte,
                                   ((v >> 24) & 0xff).toByte)
    val core = Array[Byte]('B', 'M') ++ le32(26) ++ le32(0) ++
      le32(26) ++ le32(12) ++ le16(17) ++ le16(9) ++ le16(1) ++ le16(24)
    assert(Multimodal.ImageHeader.parse(core)
             .contains(Multimodal.ImageHeader.Info("bmp", 17, 9)))
    // unknown DIB size (e.g. 16) must fall to None, not garbage dims
    val weird = Array[Byte]('B', 'M') ++ le32(30) ++ le32(0) ++
      le32(30) ++ le32(16) ++ le32(17) ++ le32(9) ++ le32(0)
    assert(Multimodal.ImageHeader.parse(weird).isEmpty)
    // negative 32-bit width (crafted) must not parse
    val negW = Array[Byte]('B', 'M') ++ le32(54) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(-5) ++ le32(9) ++ le32(0)
    assert(Multimodal.ImageHeader.parse(negW).isEmpty)
  }

  test("ImageHeader never false-positives on hash-derived payloads") {
    val rnd = new scala.util.Random(11)
    (0 until 20000).foreach { _ =>
      val p = new Array[Byte](32)
      rnd.nextBytes(p)
      assert(Multimodal.ImageHeader.parse(p).isEmpty,
             p.map("%02x".format(_)).mkString)
    }
    // short and empty payloads
    assert(Multimodal.ImageHeader.parse(Array.emptyByteArray).isEmpty)
    assert(Multimodal.ImageHeader.parse(Array[Byte]('B', 'M')).isEmpty)
  }

  test("extractFeatures carries REAL parsed dimensions for image " +
       "payloads and stub dimensions otherwise") {
    val spark = TestSpark.spark
    import spark.implicits._
    val png = imageBytes("png", 37, 23)
    val fake = Array.tabulate[Byte](32)(i => (i * 7 + 1).toByte)
    val df = Seq((1L, png), (2L, fake),
                 (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractFeatures(df, "doc_id", "payload", "image")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getInt(3), r.getInt(4)))))
      .toMap
    assert(out(1L) == Some((37, 23)), out.toString)
    // fake payload: stub fake-header path (first 8 bytes, mod 4096)
    val bb = java.nio.ByteBuffer.wrap(fake)
    assert(out(2L) == Some((math.abs(bb.getInt(0) % 4096),
                            math.abs(bb.getInt(4) % 4096))))
    assert(out(3L).isEmpty) // null payload -> null dims
  }

  test("AudioHeader parses a real RIFF/WAVE chunk chain; corrupt and " +
       "foreign payloads return None") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
                                   (v >> 16).toByte, (v >> 24).toByte)
    val dataBytes = 44100 * 4 // one second of 16-bit stereo
    // LIST chunk before fmt to force a real chunk walk (odd size ->
    // word-aligned skip)
    val list = "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val data = "data".getBytes ++ le32(dataBytes)
    val body = "WAVE".getBytes ++ list ++ fmt ++ data
    val header = "RIFF".getBytes ++ le32(body.length + dataBytes) ++ body
    val wav = header ++ new Array[Byte](dataBytes)
    val info = Multimodal.AudioHeader.parse(wav)
    assert(info.contains(Multimodal.AudioHeader
      .Info("wav", 44100, 2, 16, 44100L, 1000L)))
    // truncated INSIDE the data chunk: frames/duration clamp to the
    // bytes actually present (declared size never inflates them)
    val quarter = Multimodal.AudioHeader.parse(
      header ++ new Array[Byte](dataBytes / 4))
    assert(quarter.contains(Multimodal.AudioHeader
      .Info("wav", 44100, 2, 16, 11025L, 250L)))
    // header-only payload (declared data entirely absent) -> 0 frames
    val headerOnly = Multimodal.AudioHeader.parse(header)
    assert(headerOnly.contains(Multimodal.AudioHeader
      .Info("wav", 44100, 2, 16, 0L, 0L)))
    // truncated mid-chunk: no fmt collected -> None
    assert(Multimodal.AudioHeader.parse(header.take(16)).isEmpty)
    // foreign magic -> None
    assert(Multimodal.AudioHeader.parse("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Multimodal.AudioHeader.parse(Array[Byte](1, 2, 3)).isEmpty)
    // the Spark-side extraction drives the parser: WAV rows carry the
    // parsed fields, foreign/null payloads null out
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, wav), (2L, "not a wav".getBytes),
                 (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractAudioInfo(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) === 44100 && out(1L).getInt(3) === 2 &&
           out(1L).getLong(6) === 1000L)
    assert(out(2L).isNullAt(2) && out(3L).isNullAt(2))
    assert(out(3L).getInt(1) === 0)
  }
}

package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: binary payload + metadata struct schema,
  * and the partition-batched (stub) decode stage.
  */
class MultimodalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, false), StructField("text", StringType, true)))

  test("attachBinary: BinaryType payload + typed prunable metadata struct") {
    val df = mkDf(schema, Row(1L, "hello"), Row(2L, "wörld"))
    val out = Multimodal.attachBinary(df, "doc_id", "text")
    assert(out.schema("payload").dataType === BinaryType)
    val meta = out.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq === Seq("byte_len", "mime", "sig"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq === "hello".getBytes("UTF-8").toSeq)
    assert(rows(0).getAs[Row]("meta").getAs[Long]("byte_len") === 5L)
    assert(rows(1).getAs[Row]("meta").getAs[Long]("byte_len") === 6L) // ö is 2 bytes
  }

  test("decodeFeatures: deterministic fake features, batch-shaped iteration") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "text/plain", "abc".getBytes),
      MediaRow(2L, "text/plain", "abc".getBytes),
      MediaRow(3L, "text/plain", "xyz".getBytes)))
    val out = Multimodal.decodeFeatures(ds, batchSize = 2).collect().sortBy(_.id)
    assert(out.map(_.byteLen).toSeq === Seq(3, 3, 3))
    assert(out(0).checksum === out(1).checksum) // deterministic
    assert(out(0).checksum !== out(2).checksum)
    assert(out.forall(_.featureDim === 16))
  }

  test("resize: bounded rendition, geometry recorded, 1:1 rows") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val ds = spark.createDataset(Seq(MediaRow(1L, "image/png", payload)))
    val out = Multimodal.resize(ds, scalePct = 25).collect().head
    assert(out.srcBytes === 100)
    assert(out.dstBytes === 25) // every 4th byte
    assert(out.payload.toSeq === (0 until 100 by 4).map(_.toByte))
    // non-divisor rates decimate monotonically (an integer stride would
    // keep 100% for any rate over 50)
    val p75 = Multimodal.resize(ds, scalePct = 75).collect().head
    assert(p75.dstBytes === 75)
    val p51 = Multimodal.resize(ds, scalePct = 51).collect().head
    assert(p51.dstBytes === 51)
  }

  test("decodeImageFeatures: REAL ImageIO round-trip recovers exact pixels") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(3L, "image/png", Multimodal.encodePng(3L, 4, 2)),
      MediaRow(99L, "image/png", Array[Byte](9, 9, 9)))) // undecodable
    val out = Multimodal.decodeImageFeatures(ds).collect()
      .map(f => f.id -> f).toMap
    assert(out(3L).width === 4 && out(3L).height === 2)
    // independent closed-form evaluation of the synthetic pixel function
    var expect = 0L
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = (((x * 7 + y * 13 + 3) % 256) << 16) |
        (((x * 3 + y * 5) % 256) << 8) | ((x + y + 3) % 256)
      expect += (y * 4 + x + 1).toLong * p
    }
    assert(out(3L).checksum === expect)
    assert(out(99L) === ImageFeatures(99L, -1, -1, -1L)) // no-throw contract
  }

  test("decodeAudioFeatures: REAL WAV round-trip recovers exact samples") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(5L, "audio/wav", Multimodal.encodeWav(5L, 16000, 2, 40)),
      MediaRow(99L, "audio/wav", Array[Byte](9, 9, 9)))) // undecodable
    val out = Multimodal.decodeAudioFeatures(ds).collect()
      .map(f => f.id -> f).toMap
    assert(out(5L).sampleRate === 16000)
    assert(out(5L).channels === 2)
    assert(out(5L).frames === 40)
    // independent closed-form evaluation of the synthetic sample function
    var expect = 0L
    for (i <- 0 until 80) // frames * channels interleaved samples
      expect += (i + 1).toLong * ((i * 31 + 5 * 7) % 65536 - 32768)
    assert(out(5L).checksum === expect)
    assert(out(99L) === AudioFeatures(99L, -1, -1, -1, -1L)) // no-throw contract
  }

  test("decodeGifFrames: REAL multi-frame round-trip, every-nth sampling") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(4L, "image/gif", Multimodal.encodeGif(4L, 5, 3, 4)),
      MediaRow(99L, "image/gif", Array[Byte](7, 7, 7)))) // undecodable
    val out = Multimodal.decodeGifFrames(ds, everyNth = 2).collect()
      .groupBy(_.id)
    // frames 0 and 2 of 4 survive the every-2nd sampling
    assert(out(4L).map(_.frameIdx).sorted.toSeq === Seq(0, 2))
    out(4L).foreach { fr =>
      assert(fr.width === 5 && fr.height === 3)
      // independent closed-form evaluation of the synthetic gray function
      var expect = 0L
      for (y <- 0 until 3; x <- 0 until 5) {
        val g = (x * 7 + y * 11 + fr.frameIdx * 29 + 4) % 256
        expect += (y * 5 + x + 1).toLong * ((g << 16) | (g << 8) | g)
      }
      assert(fr.checksum === expect, s"frame ${fr.frameIdx}")
    }
    assert(out(99L).toSeq === Seq(VideoFrame(99L, -1, -1, -1, -1L)))
  }

  test("parseMp4Meta: ISO-BMFF round-trip recovers duration/tracks/codecs/geometry") {
    val b = Multimodal.encodeMp4(7L, 640, 360, 12345L)
    assert(Multimodal.parseMp4Meta(b) === Some((12345L, 2, "avc1,mp4a", 640, 360)))
    // corrupt and truncated payloads hit the no-throw None contract
    assert(Multimodal.parseMp4Meta(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.parseMp4Meta(b.take(b.length / 3)) === None)
    // box order must not matter: moov not first (mdat-before-moov layout)
    val ftypLen = {
      val sz = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
        ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      sz
    }
    assert(new String(b, 4, 4, "US-ASCII") === "ftyp")
    val rest = b.drop(ftypLen)
    // find the mdat box (last) and splice it before moov
    val moovLen = ((rest(0) & 0xff) << 24) | ((rest(1) & 0xff) << 16) |
      ((rest(2) & 0xff) << 8) | (rest(3) & 0xff)
    val moov = rest.take(moovLen); val mdat = rest.drop(moovLen)
    val reordered = b.take(ftypLen) ++ mdat ++ moov
    assert(Multimodal.parseMp4Meta(reordered) === Some((12345L, 2, "avc1,mp4a", 640, 360)))
  }

  test("parseMp4Meta: version-1 mvhd/tkhd (64-bit times) parse identically") {
    // hand-build a v1 moov: the synthesizer writes v0, so the v1 branch
    // needs its own construction (what a modern muxer emits for long media)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, parts: Array[Byte]*) = {
      val p = parts.flatten.toArray
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    }
    val zeros = (n: Int) => new Array[Byte](n)
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0),
      be64(0), be64(0), be32(90000L), be64(90000L * 42), // 42 s at 90 kHz
      be32(0x00010000L), zeros(2 + 2 + 8 + 36 + 24), be32(2))
    val tkhdV1 = box("tkhd", Array[Byte](1, 0, 0, 7),
      be64(0), be64(0), be32(1), zeros(4), be64(0),
      zeros(8 + 2 + 2 + 2 + 2 + 36),
      be32(1280L << 16), be32(720L << 16))
    val trak = box("trak", tkhdV1,
      box("mdia", box("minf", box("stbl",
        box("stsd", zeros(4), be32(1), box("hvc1", zeros(6), zeros(2)))))))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
      box("moov", mvhdV1, trak)
    assert(Multimodal.parseMp4Meta(mp4) === Some((42000L, 1, "hvc1", 1280, 720)))
  }

  test("decodeVideoMeta: batched no-decode metadata stage with no-throw contract") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(1L, "video/mp4", Multimodal.encodeMp4(1L, 320, 240, 5000L)),
      MediaRow(2L, "video/mp4", Multimodal.encodeMp4(2L, 1920, 1080, 3600000L)),
      MediaRow(9L, "video/mp4", Array[Byte](0, 0, 0, 0))))
    val out = Multimodal.decodeVideoMeta(media).collect()
      .map(v => v.id -> ((v.durationMs, v.tracks, v.codecs, v.width, v.height))).toMap
    assert(out(1L) === ((5000L, 2, "avc1,mp4a", 320, 240)))
    assert(out(2L) === ((3600000L, 2, "avc1,mp4a", 1920, 1080)))
    assert(out(9L) === ((-1L, -1, "", -1, -1)))
  }

  test("sampleFrames: 1:N explode, every-nth fixed slices, deterministic") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](128)(_.toByte)
    val ds = spark.createDataset(Seq(MediaRow(7L, "video/mp4", payload)))
    val frames = Multimodal.sampleFrames(ds, frameBytes = 32, everyNth = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 2)) // 4 slices, every 2nd
    assert(frames(0).frameBytes.toSeq === (0 until 32).map(_.toByte))
    assert(frames(1).frameBytes.toSeq === (64 until 96).map(_.toByte))
  }

  test("AVI/MJPEG: REAL frame decode — geometry exact, solid-frame luma within JPEG tolerance") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRow(3L, "video/x-msvideo", Multimodal.encodeAvi(3L, 16, 8, 5)),
      MediaRow(4L, "video/x-msvideo", Multimodal.encodeAvi(4L, 6, 10, 2)),
      MediaRow(99L, "video/x-msvideo", Array[Byte](9, 9, 9)))) // corrupt
    val frames = Multimodal.decodeAviFrames(ds, everyNth = 2)
      .collect().sortBy(f => (f.id, f.frameIdx))
    // every-nth sampling over 5 frames -> 0,2,4; over 2 -> 0
    assert(frames.filter(_.id == 3L).map(_.frameIdx).toSeq === Seq(0, 2, 4))
    assert(frames.filter(_.id == 4L).map(_.frameIdx).toSeq === Seq(0))
    // geometry and header metadata come back exact
    frames.filter(_.id == 3L).foreach { f =>
      assert(f.width === 16 && f.height === 8 && f.codec === "MJPG")
      assert(f.durMs === 500L) // 5 frames at 10 fps
      // a solid frame survives JPEG's DC path ~losslessly
      val expected = ((3L * 37 + f.frameIdx * 17) % 216 + 20).toDouble
      assert(math.abs(f.meanLuma - expected) <= 3.0,
        s"frame ${f.frameIdx}: luma ${f.meanLuma} vs $expected")
    }
    // corrupt payload -> one sentinel row, job survives
    assert(frames.filter(_.id == 99L).map(_.frameIdx).toSeq === Seq(-1))
    // header-only walker agrees with the synthesizer
    assert(Multimodal.parseAviMeta(Multimodal.encodeAvi(3L, 16, 8, 5))
      === Some((5, 100000L, "MJPG", 16, 8)))
    assert(Multimodal.parseAviMeta(Array[Byte](1, 2, 3)) === None)
  }

  test("AVI A/V demux: interleaved PCM audio round-trips EXACTLY") {
    import spark.implicits._
    // 3 frames at 10 fps, 80 Hz mono -> 8 samples per '01wb' chunk, 24 total
    val avi = Multimodal.encodeAvi(5L, 8, 8, 3, fps = 10, audioHz = 80)
    val ds = spark.createDataset(Seq(
      MediaRow(5L, "video/x-msvideo", avi),
      MediaRow(6L, "video/x-msvideo", // no audio stream: zero samples
        Multimodal.encodeAvi(6L, 8, 8, 2)),
      MediaRow(99L, "video/x-msvideo", Array[Byte](1, 1, 1)))) // corrupt
    val out = Multimodal.decodeAviAudio(ds).collect().sortBy(_.id).toSeq
    val expected = {
      var checksum = 0L
      (0 until 24).foreach { t =>
        checksum += ((5L * 13 + t * 7) % 251 - 125) * (t + 1L)
      }
      checksum
    }
    assert(out.map(a => (a.id, a.nSamples, a.checksum, a.hz)) === Seq(
      (5L, 24L, expected, 80L),
      (6L, 0L, 0L, -1L),
      (99L, -1L, -1L, -1L)))
    // the video stream of the SAME payload still decodes (true demux:
    // audio chunks don't confuse the frame walker, and vice versa)
    val frames = Multimodal.decodeAviFrames(
      spark.createDataset(Seq(MediaRow(5L, "video/x-msvideo", avi))))
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 1, 2))
    assert(frames.forall(f => f.width == 8 && f.height == 8))
  }
}

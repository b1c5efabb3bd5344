package graft.functions

import graft.SparkSpec
import graft.tools.GenMediaFixtures
import org.apache.spark.sql.functions.col

/** Container probe ([[MediaMeta]]): round-trips against the byte
  * generators behind the committed fixtures, the mvhd-v1 layout the
  * fixtures don't exercise, and the malformed-input contract (null,
  * never throw). The end-to-end gate over the committed files is the
  * `multimodal_audio` oracle (write-time manifest replay). */
class MediaMetaSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(bytes: Array[Byte]): Option[(String, Long, Int, Int, Int, Int)] = {
    val r = Seq(Tuple1(bytes)).toDF("content")
      .select(functions.media_meta(col("content")).as("m"))
      .select("m.format", "m.duration_ms", "m.channels", "m.sample_rate",
        "m.width", "m.height")
      .collect()(0)
    if (r.isNullAt(0)) None
    else Some((r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getInt(5)))
  }

  test("WAV round-trip: fmt + data chunk walk recovers the written params") {
    val b = GenMediaFixtures.wavBytes(seed = 5, channels = 2, rate = 16000,
      nSamples = 24000)
    // duration = dataBytes*1000/byteRate = 24000*4*1000/(16000*4) = 1500
    assert(parseOne(b) == Some(("wav", 1500L, 2, 16000, 0, 0)))
  }

  test("MP4 round-trip: mvhd v0 + tkhd dims") {
    val b = GenMediaFixtures.mp4Bytes(timescale = 600, durationUnits = 3000L,
      w = 320, h = 240)
    assert(parseOne(b) == Some(("mp4", 5000L, 0, 600, 320, 240)))
  }

  test("MP4 mvhd version-1 (64-bit duration) layout parses") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String) = s.getBytes("US-ASCII")
    def box(t: String, c: Array[Byte]) = be32(8L + c.length) ++ cc(t) ++ c
    val mvhd = box("mvhd", be32(0x01000000L) ++ // version 1
      be64(0) ++ be64(0) ++ // ctime, mtime
      be32(1000) ++ be64(90061L)) // timescale, duration → 90061 ms
    val bytes = box("ftyp", cc("isom")) ++ box("moov", mvhd)
    assert(parseOne(bytes) == Some(("mp4", 90061L, 0, 1000, 0, 0)))
  }

  test("malformed input yields null, never throws") {
    assert(parseOne(Array[Byte](1, 2, 3)) == None)
    assert(parseOne("RIFFxxxxWAVE".getBytes("US-ASCII")) == None) // no chunks
    assert(parseOne(Array.empty[Byte]) == None)
    // truncated WAV: valid RIFF/WAVE + fmt id but the chunk body missing
    val wav = GenMediaFixtures.wavBytes(1, 1, 8000, 100)
    assert(parseOne(wav.take(20)) == None)
    // PNG bytes are not an AV container
    assert(parseOne(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)) == None)
  }
}

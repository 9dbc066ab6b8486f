package graft.llm

import graft.SparkSuite

class MultiModalSpec extends SparkSuite {

  test("BMP encode/decode round-trips dimensions and pixel bytes") {
    val px = "the quick brown fox".getBytes("UTF-8")
    val bytes = MultiModal.bmpEncode(640, 480, px)
    assert(bytes.length == 54 + px.length)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val (w, h, off) = MultiModal.bmpDecodeHeader(bytes)
    assert((w, h, off) == (640, 480, 54))
    assert(java.util.Arrays.copyOfRange(bytes, off, bytes.length).sameElements(px))
  }

  test("corrupt payloads fail loudly instead of yielding garbage dimensions") {
    intercept[IllegalArgumentException] {
      MultiModal.bmpDecodeHeader("JFIF not a bitmap at all".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      MultiModal.bmpDecodeHeader(Array[Byte]('B', 'M', 3)) // truncated header
    }
  }

  test("WAV encode/decode round-trips format fields and sample bytes") {
    val samples = "pcm sample payload".getBytes("UTF-8")
    val bytes = MultiModal.wavEncode(16000, 2, samples)
    assert(bytes.length == 44 + samples.length)
    val (rate, ch, bits, dataLen) = MultiModal.wavDecodeHeader(bytes)
    assert((rate, ch, bits, dataLen) == (16000, 2, 16, samples.length))
    assert(java.util.Arrays.copyOfRange(bytes, 44, bytes.length).sameElements(samples))
    intercept[IllegalArgumentException] {
      MultiModal.wavDecodeHeader("OggS definitely not riff audio data here".getBytes("UTF-8"))
    }
  }

  test("multimodal_audio derives duration from the parsed header, exactly") {
    val rows = MultiModal.defs.find(_.name == "multimodal_audio").get
      .fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, rate, ch, durUs) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rate == 8000 + (id % 5) * 4000, s"doc $id: rate $rate")
      assert(ch == 1 + id % 2, s"doc $id: channels $ch")
      val dataLen = n - 44
      assert(durUs == dataLen * 1000000L / (rate * ch * 2), s"doc $id: duration $durUs")
      assert(r.getString(5).length == 64)
    }
  }

  test("Y4M encode/decode round-trips header params and every frame") {
    val payload = ("y4m frame payload " * 10).getBytes("US-ASCII")
    val frames = payload.grouped(64).map(_.padTo(64, 0.toByte)).toArray
    val bytes = MultiModal.y4mEncode(payload.length, frames)
    assert(new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2")
    val (w, h, docLen, parsed) = MultiModal.y4mDecode(bytes)
    assert((w, h, docLen) == (8, 8, payload.length))
    assert(parsed.length == frames.length)
    parsed.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("corrupt Y4M containers fail loudly at the exact broken structure") {
    val good = MultiModal.y4mEncode(64, Array(Array.fill(64)(7.toByte)))
    // wrong magic
    intercept[IllegalArgumentException] {
      MultiModal.y4mDecode("MPEG4VIDEO W8 H8\nFRAME\n".getBytes("US-ASCII"))
    }
    // no stream header newline at all
    intercept[IllegalArgumentException] {
      MultiModal.y4mDecode("YUV4MPEG2 W8 H8".getBytes("US-ASCII"))
    }
    // missing dimension token
    intercept[IllegalArgumentException] {
      MultiModal.y4mDecode("YUV4MPEG2 W8 XDOCLEN=0\n".getBytes("US-ASCII"))
    }
    // frame marker overwritten
    val badMarker = good.clone()
    val markerAt = good.indexOfSlice("FRAME".getBytes("US-ASCII"))
    badMarker(markerAt) = 'X'.toByte
    intercept[IllegalArgumentException] { MultiModal.y4mDecode(badMarker) }
    // final frame truncated
    intercept[IllegalArgumentException] {
      MultiModal.y4mDecode(java.util.Arrays.copyOfRange(good, 0, good.length - 1))
    }
  }

  test("multimodal_frames samples every 4th parsed frame with unpadded lengths") {
    val rows = MultiModal.defs.find(_.name == "multimodal_frames").get
      .fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (idx, len) = (r.getLong(1), r.getLong(2))
      assert(idx % 4 == 0, s"unsampled frame index $idx emitted")
      assert(len >= 0 && len <= 64, s"frame_len $len outside plane size")
      assert(r.getString(3).length == 64, "sha256 hex digest expected")
    }
    // at least one document ends in a partial (unpadded-length) frame
    assert(rows.exists(r => r.getLong(2) > 0 && r.getLong(2) < 64))
  }

  test("multimodal_meta parses the header fields the synthesizer wrote") {
    val rows = MultiModal.defs.find(_.name == "multimodal_meta").get
      .fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 54, s"doc $id: payload smaller than a bare header")
      assert(w == id % 1920 + 1, s"doc $id: width $w")
      assert(h == id * 7 % 1080 + 1, s"doc $id: height $h")
      assert(r.getString(4).length == 64, "sha256 hex digest expected")
    }
  }
}

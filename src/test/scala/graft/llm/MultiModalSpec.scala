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

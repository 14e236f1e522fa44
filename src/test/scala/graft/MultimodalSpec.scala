package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Codec-level checks for the multimodal container stub: header fields
  * and payload survive the encode→decode round trip, including edge
  * payloads (empty, null, multi-byte UTF-8 where byte length ≠ char
  * count).
  */
class MultimodalSpec extends AnyFunSuite {

  test("encode/decode round-trips header fields and payload length") {
    val m = Multimodal.decodeMeta(123L, Multimodal.encodeBlob(123L, "hello world"))
    assert(m == Multimodal.Meta(123L, 64 + 123 % 512, 64 + (123 * 7) % 512, 1 + 123 % 30, 11L))
  }

  test("empty and null payloads decode to zero payload bytes") {
    assert(Multimodal.decodeMeta(0L, Multimodal.encodeBlob(0L, "")).payload_bytes == 0L)
    assert(Multimodal.decodeMeta(0L, Multimodal.encodeBlob(0L, null)).payload_bytes == 0L)
  }

  test("payload length is bytes, not chars, for multi-byte UTF-8") {
    val m = Multimodal.decodeMeta(7L, Multimodal.encodeBlob(7L, "é€"))
    assert(m.payload_bytes == 5L) // 2-byte é + 3-byte €
  }
}

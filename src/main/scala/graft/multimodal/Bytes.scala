package graft.multimodal

/** Shared byte-level primitives for the container parsers
  * ([[MultimodalOps.parseMeta]], [[AviOps]], [[Vp8l.decodeWebp]]) —
  * one place to keep bounds handling honest. All reads assume the
  * caller has checked `i + width <= b.length`; `ascii` checks its own
  * bounds because it doubles as a probe. */
private[graft] object Bytes {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def le24(b: Array[Byte], i: Int): Int = le16(b, i) | (u8(b, i + 2) << 16)
  def le32(b: Array[Byte], i: Int): Int = le16(b, i) | (le16(b, i + 2) << 16)
  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  def be32(b: Array[Byte], i: Int): Int = (be16(b, i) << 16) | be16(b, i + 2)
  def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i >= 0 && i + s.length <= b.length &&
      s.indices.forall(k => b(i + k) == s(k))
  /** A RIFF-style chunk size is sane only when non-negative and not
    * larger than the whole payload — anything else is malformed and
    * (left unchecked) overflows the chunk-advance arithmetic. */
  def saneChunkSize(size: Int, b: Array[Byte]): Boolean =
    size >= 0 && size <= b.length
}

package graft.functions

/** Shared byte-walk primitives for the pure-JVM media codecs
  * ([[MediaHeaders]], [[ImageKernels]], [[AudioKernels]]) — one copy of
  * the endian readers, the ASCII tag probe, and the PNG signature
  * (review r15: three private copies had already drifted on bounds
  * checking). `ascii` is bounds-checked, the safe superset of every
  * prior caller's contract.
  */
private[functions] object ByteReads {

  val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length &&
      s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
}

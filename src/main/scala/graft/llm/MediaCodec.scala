package graft.llm

/** Real media header decoding over opaque binary payloads: PNG, JPEG, GIF and
  * BMP dimension/channel extraction from the container headers, no external
  * codec library needed. Everything is bounds-checked; any malformed or
  * truncated payload yields `None` and the caller falls back to the
  * deterministic stand-in features, so a corrupt blob can never kill a task.
  *
  * This is the piece the reference leaves entirely to the client; here it is
  * the decode step of the multimodal pipeline (SURVEY §2 row 31). Pixel-level
  * decoding (inflate/DCT) would slot in at the same call site behind the same
  * per-partition batching.
  */
object MediaCodec {

  /** Parsed container metadata. `channels` is the sample count per pixel as
    * declared by the header (1 gray, 2 gray+alpha, 3 RGB, 4 RGBA). */
  final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

  def sniff(p: Array[Byte]): Option[ImageMeta] =
    if (p == null) None
    else png(p).orElse(jpeg(p)).orElse(gif(p)).orElse(bmp(p))

  // unsigned byte at i
  @inline private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p, i).toLong << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
  private def be16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)
  private def le16(p: Array[Byte], i: Int): Int = u8(p, i) | (u8(p, i + 1) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u8(p, i).toLong | (u8(p, i + 1).toLong << 8) | (u8(p, i + 2).toLong << 16) | (u8(p, i + 3).toLong << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG: 8-byte signature, then the IHDR chunk must come first —
    * length(4) type(4)="IHDR" width(4 BE) height(4 BE) bitdepth(1) colortype(1). */
  private def png(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 26 || !PngSig.indices.forall(i => u8(p, i) == PngSig(i))) return None
    if (!(u8(p, 12) == 'I' && u8(p, 13) == 'H' && u8(p, 14) == 'D' && u8(p, 15) == 'R')) return None
    val w = be32(p, 16); val h = be32(p, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val channels = u8(p, 25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(ImageMeta("png", w.toInt, h.toInt, channels))
  }

  /** JPEG: SOI (FFD8) then a marker walk. Dimensions live in the first SOFn
    * segment (C0-CF except C4 DHT / C8 JPG / CC DAC):
    * marker(2) length(2 BE, incl. itself) precision(1) height(2) width(2) ncomp(1). */
  private def jpeg(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 4 || u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return None
    var i = 2
    var guard = 0
    while (i + 3 < p.length && guard < 1024) {
      guard += 1
      if (u8(p, i) != 0xff) return None // lost marker sync
      var m = u8(p, i + 1)
      // fill bytes: FF FF ... FF <marker>
      while (m == 0xff && i + 2 < p.length) { i += 1; m = u8(p, i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i += 2 // standalone markers carry no length
      } else if (m == 0xd9 || m == 0xda) {
        return None // EOI / start-of-scan reached without a SOF header
      } else {
        if (i + 3 >= p.length) return None
        val len = be16(p, i + 2)
        if (len < 2) return None
        val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (sof) {
          if (i + 9 >= p.length || len < 8) return None
          val h = be16(p, i + 5); val w = be16(p, i + 7); val ncomp = u8(p, i + 9)
          if (w <= 0 || h <= 0 || ncomp < 1 || ncomp > 4) return None
          return Some(ImageMeta("jpeg", w, h, ncomp))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: logical screen descriptor width/height, little-endian. */
  private def gif(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 10) return None
    val sig = new String(p, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6); val h = le16(p, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h, 3))
  }

  /** BMP: "BM", BITMAPINFOHEADER width at 18 (LE32), height at 22 (LE32,
    * negative means top-down), bits-per-pixel at 28 (LE16). */
  private def bmp(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length < 30 || u8(p, 0) != 'B' || u8(p, 1) != 'M') return None
    val w = le32(p, 18); val h = math.abs(le32(p, 22).toInt).toLong
    val bpp = le16(p, 28)
    if (w <= 0 || w > Int.MaxValue || h <= 0 || h > Int.MaxValue) return None
    val channels = bpp match {
      case 1 | 4 | 8 => 1
      case 16 | 24   => 3
      case 32        => 4
      case _         => return None
    }
    Some(ImageMeta("bmp", w.toInt, h.toInt, channels))
  }
}

package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

/** Deletion-vector codec: the merge-on-read half of DELETE.
  *
  * A deletion vector (DV) marks rows of a parquet data file as deleted by
  * their PHYSICAL row index, so a DELETE touching 0.1% of a 1 GB file
  * commits a few-KB bitmap instead of rewriting the gigabyte — at 100 TB,
  * copy-on-write DELETE amplification is the dominant write cost and DVs
  * are the standard fix. The scan side filters marked rows out with an
  * O(1)-per-row bitmap probe (no join, no shuffle).
  *
  * Everything here is built offline against PUBLIC specifications, the
  * same standard as the Kafka wire / Avro OCF / xlsx codecs in this repo:
  *
  *  - the delta.io PROTOCOL.md "Deletion Vectors" section (descriptor
  *    JSON, on-disk file framing, Z85 path encoding);
  *  - the RoaringFormatSpec 64-bit extension
  *    (github.com/RoaringBitmap/RoaringFormatSpec) for the bitmap bytes,
  *    via the org.roaringbitmap library Spark already ships (its
  *    `serialize` IS the spec's portable 32-bit format);
  *  - ZeroMQ RFC 32 (Z85) for the UUID-in-path encoding.
  *
  * Layouts implemented:
  *
  * '''Serialized bitmap''' (`pathOrInlineDv` target, a.k.a. "DV data"):
  * {{{
  *   magic 1681511377 : i32 little-endian
  *   numBitmaps       : i64 little-endian
  *   repeat numBitmaps times (ascending key order):
  *     key            : i32 little-endian   (high 32 bits of the value)
  *     bitmap         : portable 32-bit RoaringBitmap
  * }}}
  *
  * '''DV file''' (`deletion_vector_<uuid>.bin`, holds every DV of one
  * commit at distinct offsets):
  * {{{
  *   formatVersion    : 1 byte = 0x01
  *   repeat per DV:
  *     dataSize       : i32 big-endian      (descriptor offset points HERE)
  *     dvData         : dataSize bytes      (the serialized bitmap above)
  *     checksum       : i32 big-endian      (CRC-32 of dvData)
  * }}}
  *
  * '''Descriptor''' (rides the add action):
  * `{"storageType":"u"|"i"|"p","pathOrInlineDv":…,"offset":N,
  *   "sizeInBytes":N,"cardinality":N}` — "u" = relative file whose name
  * encodes a UUID (pathOrInlineDv = optional prefix + 20-char Z85 UUID),
  * "i" = the DV data itself Z85-inlined, "p" = absolute file path.
  */
object DeletionVectors {

  // ---- Z85 (ZeroMQ RFC 32) --------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Encode bytes whose length is a multiple of 4 (pad upstream). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input must be 4-aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 text must be 5-aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Decode(s.charAt(i + j).toInt)
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d; j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def encodeUuid(u: UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits); b.putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  def decodeUuid(s: String): UUID = {
    val b = ByteBuffer.wrap(z85Decode(s))
    new UUID(b.getLong, b.getLong)
  }

  // ---- 64-bit roaring bitmap array -------------------------------------------

  /** The delta-protocol magic number prefixed to every serialized bitmap. */
  val Magic: Int = 1681511377

  /** A 64-bit bitmap as an array of keyed 32-bit RoaringBitmaps
    * (RoaringFormatSpec 64-bit extension). Only non-negative values. */
  final class RoaringBitmapArray extends Serializable {
    private val maps =
      new java.util.TreeMap[Integer, org.roaringbitmap.RoaringBitmap]()

    def add(v: Long): Unit = {
      require(v >= 0, s"negative value $v")
      val key = (v >>> 32).toInt
      var m = maps.get(key)
      if (m == null) { m = new org.roaringbitmap.RoaringBitmap(); maps.put(key, m) }
      m.add(v.toInt)
    }

    def contains(v: Long): Boolean = {
      if (v < 0) return false
      val m = maps.get((v >>> 32).toInt)
      m != null && m.contains(v.toInt)
    }

    def or(other: RoaringBitmapArray): Unit =
      other.maps.forEach { (k, m) =>
        val mine = maps.get(k)
        if (mine == null) maps.put(k, m.clone())
        else mine.or(m)
      }

    /** Remove `other`'s values in place (set difference) — the CDF delta
      * between two DV generations of the same file. */
    def andNot(other: RoaringBitmapArray): Unit = {
      other.maps.forEach { (k, m) =>
        val mine = maps.get(k)
        if (mine != null) {
          mine.andNot(m)
          if (mine.isEmpty) maps.remove(k)
        }
      }
    }

    def cardinality: Long = {
      var c = 0L
      maps.forEach((_, m) => c += m.getLongCardinality)
      c
    }

    def isEmpty: Boolean = maps.isEmpty

    /** Magic + 64-bit portable serialization (ascending key order). */
    def serialize(): Array[Byte] = {
      var size = 4 + 8
      maps.forEach((_, m) => { m.runOptimize(); size += 4 + m.serializedSizeInBytes() })
      val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(Magic)
      buf.putLong(maps.size.toLong)
      maps.forEach { (k, m) => buf.putInt(k); m.serialize(buf) }
      require(!buf.hasRemaining, "serialization size mismatch")
      buf.array()
    }
  }

  object RoaringBitmapArray {
    def apply(values: Long*): RoaringBitmapArray = {
      val a = new RoaringBitmapArray; values.foreach(a.add); a
    }

    def deserialize(bytes: Array[Byte]): RoaringBitmapArray = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val magic = buf.getInt
      require(magic == Magic, s"bad deletion-vector magic $magic (want $Magic)")
      val n = buf.getLong
      require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
      val out = new RoaringBitmapArray
      var i = 0L
      while (i < n) {
        val key = buf.getInt
        val m = new org.roaringbitmap.RoaringBitmap()
        m.deserialize(buf)
        // deserialize(ByteBuffer) does not advance the buffer position
        buf.position(buf.position() + m.serializedSizeInBytes())
        out.maps.put(key, m)
        i += 1
      }
      out
    }
  }

  // ---- descriptor -------------------------------------------------------------

  /** The add action's deletionVector payload, spec field names. */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                offset: Int, sizeInBytes: Int,
                                cardinality: Long) {
    /** Resolve the DV file this descriptor points into ("u"/"p" only). */
    def resolveFile(tableRoot: String): Path = storageType match {
      case "u" =>
        // pathOrInlineDv = <optional prefix><20-char Z85 uuid>; the prefix
        // is a directory chain under the table root
        val enc = pathOrInlineDv.takeRight(20)
        val prefix = pathOrInlineDv.dropRight(20)
        val name = s"deletion_vector_${decodeUuid(enc)}.bin"
        if (prefix.isEmpty) Paths.get(tableRoot, name)
        else Paths.get(tableRoot, prefix.stripSuffix("/"), name)
      case "p" => Paths.get(pathOrInlineDv)
      case t   => sys.error(s"deletion vector storageType '$t' has no file")
    }
  }

  /** The directory prefix this writer uses for DV files. */
  private val DvPrefix = "dv"

  // ---- DV file write / read ----------------------------------------------------

  /** Write ONE DV file carrying every bitmap of a commit; returns the
    * descriptors in input order. */
  def writeDvFile(tableRoot: String,
                  bitmaps: Seq[RoaringBitmapArray]): Seq[DvDescriptor] =
    writeDvFileBlobs(tableRoot,
      bitmaps.map(b => (b.serialize(), b.cardinality)))

  private def writeDvFileBlobs(tableRoot: String,
                               blobs: Seq[(Array[Byte], Long)]): Seq[DvDescriptor] = {
    require(blobs.nonEmpty, "no bitmaps to write")
    val uuid = UUID.randomUUID()
    val dir = Paths.get(tableRoot, DvPrefix)
    Files.createDirectories(dir)
    val path = dir.resolve(s"deletion_vector_$uuid.bin")
    val total = 1 + blobs.map(_._1.length + 8).sum
    val buf = ByteBuffer.allocate(total) // framing ints are big-endian
    buf.put(1.toByte)
    val descs = blobs.map { case (data, card) =>
      val offset = buf.position()
      buf.putInt(data.length)
      buf.put(data)
      val crc = new CRC32; crc.update(data)
      buf.putInt(crc.getValue.toInt)
      DvDescriptor("u", DvPrefix + "/" + encodeUuid(uuid), offset,
        data.length, card)
    }
    Files.write(path, buf.array())
    descs
  }

  /** Bitmaps at or under this serialized size inline into the add action
    * itself (storageType "i") — a tiny DV should not cost a sidecar file
    * open per scan. Run-compressed roaring makes band deletes over
    * clustered files routinely land here. */
  val InlineDvMaxBytes: Int = 512

  /** Spec-complete write path: each bitmap becomes an INLINE descriptor
    * when its serialized form fits [[InlineDvMaxBytes]]; the rest batch
    * into one sidecar DV file. Descriptors return in input order; no file
    * is written when everything inlines. */
  def writeDescriptors(tableRoot: String,
                       bitmaps: Seq[RoaringBitmapArray],
                       inlineMaxBytes: Int = InlineDvMaxBytes): Seq[DvDescriptor] = {
    val blobs = bitmaps.map(b => (b.serialize(), b.cardinality))
    val big = blobs.filter(_._1.length > inlineMaxBytes)
    val fileDescs =
      if (big.isEmpty) Iterator.empty
      else writeDvFileBlobs(tableRoot, big).iterator
    blobs.zip(bitmaps).map { case ((data, _), bm) =>
      if (data.length <= inlineMaxBytes) inlineDescriptor(bm)
      else fileDescs.next()
    }
  }

  /** Read the DV data bytes a descriptor points at (checksum-verified for
    * file storage; Z85-decoded for inline). */
  def readDvData(tableRoot: String, d: DvDescriptor): Array[Byte] =
    d.storageType match {
      case "i" =>
        // inline payloads are zero-padded up to Z85's 4-byte alignment;
        // sizeInBytes recovers the true length
        z85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" | "p" =>
        val all = Files.readAllBytes(d.resolveFile(tableRoot))
        require(all.nonEmpty && all(0) == 1.toByte,
          s"unsupported DV file format version ${if (all.isEmpty) "?" else all(0)}")
        val buf = ByteBuffer.wrap(all)
        buf.position(d.offset)
        val size = buf.getInt
        require(size == d.sizeInBytes,
          s"DV size mismatch: file says $size, descriptor says ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        buf.get(data)
        val stored = buf.getInt
        val crc = new CRC32; crc.update(data)
        require(stored == crc.getValue.toInt,
          s"DV checksum mismatch at offset ${d.offset}")
        data
      case t => sys.error(s"unknown deletion vector storageType '$t'")
    }

  def readBitmap(tableRoot: String, d: DvDescriptor): RoaringBitmapArray =
    RoaringBitmapArray.deserialize(readDvData(tableRoot, d))

  /** Inline descriptor for a small bitmap (spec storageType "i"). */
  def inlineDescriptor(b: RoaringBitmapArray): DvDescriptor = {
    val data = b.serialize()
    val padded =
      if (data.length % 4 == 0) data
      else data ++ new Array[Byte](4 - data.length % 4)
    DvDescriptor("i", z85Encode(padded), 0, data.length, b.cardinality)
  }
}

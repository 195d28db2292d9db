package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DeletionVectors
import graft.sources.DeletionVectors.{DvDescriptor, RoaringBitmapArray}

/** Round-trip property gates for the deletion-vector codec: Z85, the
  * 64-bit roaring serialization (magic + RoaringFormatSpec extension),
  * and the DV file framing (version byte, BE size/crc framing). The
  * serialized bytes are additionally pinned against hand-computed
  * expectations so a library upgrade or refactor cannot silently change
  * the on-disk format. */
class DeletionVectorSpec extends AnyFunSuite {

  /** Seeded sampling stand-in for scalacheck's forAll (scalatestplus is
    * not on the offline classpath): 60 deterministic trials per property. */
  private def trials(f: scala.util.Random => Unit): Unit =
    (1 to 60).foreach(i => f(new scala.util.Random(i * 7919L)))

  // ---- Z85 -------------------------------------------------------------------

  test("Z85 matches the RFC 32 reference vector") {
    // ZeroMQ RFC 32's worked example: 0x86 4F D2 6F B5 59 F7 5B → "HelloWorld"
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("Z85 round-trips arbitrary 4-aligned byte strings") {
    trials { rnd =>
      val ls = List.fill(rnd.nextInt(40))(rnd.nextLong())
      val b = java.nio.ByteBuffer.allocate(ls.size * 8)
      ls.foreach(b.putLong)
      val enc = DeletionVectors.z85Encode(b.array())
      assert(DeletionVectors.z85Decode(enc).toSeq == b.array().toSeq)
    }
  }

  test("UUIDs round-trip through the 20-char Z85 form") {
    trials { rnd =>
      val u = new java.util.UUID(rnd.nextLong(), rnd.nextLong())
      val enc = DeletionVectors.encodeUuid(u)
      assert(enc.length == 20)
      assert(DeletionVectors.decodeUuid(enc) == u)
    }
  }

  // ---- bitmap ----------------------------------------------------------------

  test("bitmap add/contains/cardinality over 64-bit values") {
    val b = RoaringBitmapArray(0L, 1L, 63L, (1L << 32) + 7, (5L << 32))
    assert(b.contains(0L) && b.contains(63L) && b.contains((1L << 32) + 7))
    assert(!b.contains(2L) && !b.contains((2L << 32) + 7) && !b.contains(-1L))
    assert(b.cardinality == 5)
  }

  test("serialization round-trips arbitrary value sets (incl. cross-key)") {
    trials { rnd =>
      val vs = List.fill(rnd.nextInt(200))(rnd.nextLong() & Long.MaxValue)
      val b = new RoaringBitmapArray
      vs.foreach(b.add)
      val back = RoaringBitmapArray.deserialize(b.serialize())
      assert(back.cardinality == vs.distinct.size.toLong)
      vs.foreach(v => assert(back.contains(v), s"lost $v"))
      assert(!back.contains(Long.MaxValue - 12345) || vs.contains(Long.MaxValue - 12345))
    }
  }

  test("serialized layout is pinned: magic LE, count LE, key LE, portable bitmap") {
    val b = RoaringBitmapArray(3L)
    val bytes = b.serialize()
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt == 1681511377, "magic")
    assert(buf.getLong == 1L, "one bitmap")
    assert(buf.getInt == 0, "key 0")
    // the remainder is the portable 32-bit roaring serialization of {3}
    val rb = new org.roaringbitmap.RoaringBitmap()
    rb.deserialize(buf)
    assert(rb.contains(3) && rb.getLongCardinality == 1L)
  }

  test("or() merges in place") {
    val a = RoaringBitmapArray(1L, 2L)
    val b = RoaringBitmapArray(2L, (1L << 32) + 1)
    a.or(b)
    assert(a.cardinality == 3 && a.contains((1L << 32) + 1))
  }

  test("andNot() is exact set difference across keys") {
    trials { rnd =>
      val xs = List.fill(rnd.nextInt(150))(rnd.nextLong() & ((1L << 36) - 1))
      val ys = List.fill(rnd.nextInt(150))(rnd.nextLong() & ((1L << 36) - 1)) ++
        xs.take(rnd.nextInt(xs.size + 1)) // guaranteed overlap
      val a = new RoaringBitmapArray; xs.foreach(a.add)
      val b = new RoaringBitmapArray; ys.foreach(b.add)
      a.andNot(b)
      val want = xs.toSet -- ys.toSet
      assert(a.cardinality == want.size.toLong)
      want.foreach(v => assert(a.contains(v)))
      ys.foreach(v => assert(!a.contains(v)))
    }
  }

  // ---- DV file framing ---------------------------------------------------------

  test("DV file: version byte, BE size/data/crc blocks, offset-addressed reads") {
    val root = Files.createTempDirectory("dvspec").toString
    val b1 = RoaringBitmapArray(0L, 5L, 100L)
    val b2 = RoaringBitmapArray(2L)
    val Seq(d1, d2) = DeletionVectors.writeDvFile(root, Seq(b1, b2))
    assert(d1.storageType == "u" && d1.cardinality == 3 && d2.cardinality == 1)
    assert(d1.offset == 1, "first DV starts right after the version byte")
    assert(d2.offset == 1 + 4 + d1.sizeInBytes + 4)
    // both descriptors point into the SAME file
    assert(d1.resolveFile(root) == d2.resolveFile(root))
    val file = d1.resolveFile(root)
    assert(Files.exists(file) &&
      file.getFileName.toString.startsWith("deletion_vector_"))
    assert(Files.readAllBytes(file)(0) == 1.toByte)
    val r1 = DeletionVectors.readBitmap(root, d1)
    val r2 = DeletionVectors.readBitmap(root, d2)
    assert(r1.contains(100L) && !r1.contains(2L) && r2.contains(2L))
    // checksum is enforced: flip a data byte, read must fail
    val bytes = Files.readAllBytes(file)
    bytes(5) = (bytes(5) ^ 0x7f).toByte
    Files.write(file, bytes)
    intercept[IllegalArgumentException](DeletionVectors.readBitmap(root, d1))
  }

  test("inline descriptors round-trip with zero-padding") {
    trials { rnd =>
      val vs = List.fill(rnd.nextInt(100))(rnd.nextLong() & ((1L << 40) - 1))
      val b = new RoaringBitmapArray
      vs.foreach(b.add)
      val d = DeletionVectors.inlineDescriptor(b)
      assert(d.storageType == "i")
      val back = RoaringBitmapArray.deserialize(
        DeletionVectors.readDvData("/nonexistent", d))
      assert(back.cardinality == vs.distinct.size.toLong)
      vs.foreach(v => assert(back.contains(v)))
    }
  }
}

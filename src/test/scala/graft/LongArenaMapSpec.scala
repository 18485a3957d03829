package graft

import graft.storage.LongArenaMap
import org.scalatest.funsuite.AnyFunSuite

/** Unit edge cases of the primitive serving map behind PointIndex
  * (whole-path behavior — point/scan parity, null sentinels — is
  * pinned by PointIndexSpec; this covers the raw structure). */
class LongArenaMapSpec extends AnyFunSuite {

  private def pairsOf(m: LongArenaMap, key: Long): Seq[(Long, Long)] = {
    val s = m.payloadStart(key)
    if (s < 0) Seq.empty
    else (s + 1).until(s + 1 + m.payloadLen(s)).by(2)
      .map(i => (m.payload(i), m.payload(i + 1)))
  }

  test("fixed-pair records: multiplicity, key 0, negative keys, misses") {
    val b = new LongArenaMap.Builder
    b.add2(0L, 1L, 100L)            // key 0 is a legitimate key
    b.add2(-7L, 2L, 200L)
    b.add2(42L, 3L, 300L)
    b.add2(42L, 4L, 400L)           // same key again, interleaved below
    b.add2(Long.MinValue, 5L, 500L)
    b.add2(42L, 6L, 600L)
    val m = b.result()
    assert(pairsOf(m, 0L) == Seq((1L, 100L)))
    assert(pairsOf(m, -7L) == Seq((2L, 200L)))
    // insertion order preserved per key even when interleaved
    assert(pairsOf(m, 42L) == Seq((3L, 300L), (4L, 400L), (6L, 600L)))
    assert(pairsOf(m, Long.MinValue) == Seq((5L, 500L)))
    assert(m.payloadStart(1L) == -1 && m.payloadStart(43L) == -1)
  }

  test("length-prefixed rows: var-len payloads, null rows, empty rows") {
    val b = new LongArenaMap.Builder
    b.addRow(10L, Array(1L, 2L, 3L))
    b.addRow(10L, null)              // null row → [-1]
    b.addRow(10L, Array.empty[Long]) // empty row → [0]
    b.addRow(11L, Array(9L))
    val m = b.result()
    val s = m.payloadStart(10L)
    assert(s >= 0)
    var i = s + 1
    val end = s + 1 + m.payloadLen(s)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Option[Seq[Long]]]
    while (i < end) {
      val l = m.payload(i).toInt
      if (l < 0) { rows += None; i += 1 }
      else { rows += Some((i + 1).until(i + 1 + l).map(m.payload)); i += 1 + l }
    }
    assert(rows.toSeq == Seq(Some(Seq(1L, 2L, 3L)), None, Some(Seq.empty)))
    assert(m.payloadStart(12L) == -1)
  }

  test("empty builder and dense load: 100k sequential + hashed keys " +
    "all resolve, absent keys miss") {
    assert(new LongArenaMap.Builder().result().payloadStart(5L) == -1)
    val b = new LongArenaMap.Builder
    (0 until 100000).foreach { i =>
      b.add2(i.toLong, i.toLong % 16, i.toLong * 3) // sequential (sig-tier shape)
      b.add2(scala.util.hashing.byteswap64(i.toLong), 1L, i.toLong)
    }
    val m = b.result()
    (0 until 100000).foreach { i =>
      assert(pairsOf(m, i.toLong).contains((i.toLong % 16, i.toLong * 3)), i)
      assert(pairsOf(m, scala.util.hashing.byteswap64(i.toLong))
        .contains((1L, i.toLong)), i)
    }
    assert(m.payloadStart(-123456789L) == -1)
    // round-trips Java serialization (MEMORY_AND_DISK spill path)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(m)
    val m2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[LongArenaMap]
    assert(pairsOf(m2, 7L) == pairsOf(m, 7L))
  }
}

package killa.codec

/** Minimal growable primitive byte sink for the encoders. The old
  * `ArrayBuffer[Byte]` boxed every appended byte (ArrayBuffer is generic —
  * each `+=` goes through java.lang.Byte and an Object[] backing store, and
  * `toArray` unboxes the whole thing again); encode runs once per posting
  * run and once per block on the build hot path, so the boxing was pure
  * per-task overhead (guide §1.2 step 2). Same bytes out, primitive all the
  * way.
  */
private[codec] final class ByteSink(initial: Int) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var n = 0
  @inline def add(b: Byte): Unit = {
    if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n << 1)
    buf(n) = b
    n += 1
  }
  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, n)
}

/** Unsigned LEB128 varints over non-negative Longs. Pure functions —
  * property-tested for roundtrip (CodecSpec).
  */
object Varint {
  private[codec] def put(buf: ByteSink, v0: Long): Unit = {
    require(v0 >= 0L, s"varint requires non-negative value, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf.add(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    buf.add(v.toByte)
  }

  /** Plain varint sequence (for tfs / dls). */
  def encode(vals: Array[Long]): Array[Byte] = {
    val buf = new ByteSink(vals.length * 2)
    var i = 0
    while (i < vals.length) { put(buf, vals(i)); i += 1 }
    buf.toArray
  }

  def decode(bin: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        val b = bin(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      out(i) = v
      i += 1
    }
    out
  }
}

/** Delta coding for strictly-ascending docId sequences: first value absolute,
  * then gaps (≥ 1 since docIds are unique). Composed with varint this is the
  * posting compression the baseline mandates ("delta+varint-compressed docID
  * blocks", BASELINE.json north_star).
  */
object Delta {
  def encode(sortedAsc: Array[Long]): Array[Byte] = {
    val buf = new ByteSink(sortedAsc.length * 2)
    var prev = 0L
    var i = 0
    while (i < sortedAsc.length) {
      val v = sortedAsc(i)
      if (i == 0) Varint.put(buf, v)
      else {
        require(v > prev, s"docIds must be strictly ascending: $prev then $v")
        Varint.put(buf, v - prev)
      }
      prev = v
      i += 1
    }
    buf.toArray
  }

  def decode(bin: Array[Byte], n: Int): Array[Long] = {
    val gaps = Varint.decode(bin, n)
    var i = 1
    while (i < n) { gaps(i) += gaps(i - 1); i += 1 }
    gaps
  }
}

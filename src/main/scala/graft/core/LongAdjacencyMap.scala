package graft.core

/** Open-addressing hash grouper with primitive `long` keys and primitive
  * `long[]` value arrays — the JVM analog of the reference's
  * `aggregate()` + `convert()` KMV build
  * (`/root/reference/mapreduce-7Apr14/src/mapreduce.cpp` hash-bin
  * grouping) without per-element boxing. `java.util.HashMap[Long,
  * ArrayList[Long]]` allocates a boxed key per probe and a boxed element
  * per append; on the reference's 100k-vertex benchmark graphs that
  * boxing is ~half the MapReduce-phase wall time. Linear probing with a
  * Murmur-style finalizer, doubling at 70% load.
  *
  * Single-threaded, one instance per partition — use inside
  * `mapPartitions`, never shared.
  */
final class LongAdjacencyMap(initialCapacity: Int = 1 << 16) {
  // clamp to the 2^30 ceiling grow() enforces — highestOneBit(>2^29)<<1
  // overflows Int to a negative capacity/mask otherwise
  private var cap = {
    val want = Integer.highestOneBit(math.max(initialCapacity - 1, 15)) << 1
    if (want <= 0 || want > (1 << 30)) 1 << 30 else want
  }
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var vals = new Array[Array[Long]](cap)
  private var lens = new Array[Int](cap)
  private var n = 0

  /** Murmur3 fmix64 finalizer — full avalanche so sequential vertex ids
    * don't cluster in the probe sequence. */
  private def mix(k: Long): Int = {
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    (h ^ (h >>> 33)).toInt
  }

  private def slot(key: Long): Int = {
    var i = mix(key) & mask
    while (used(i) && keys(i) != key) i = (i + 1) & mask
    i
  }

  def add(key: Long, value: Long): Unit = {
    // long arithmetic: at ~188M keys `n * 10` overflows Int and the
    // guard would fire on every add while `cap <<= 1` wraps negative
    if (n.toLong * 10 >= cap.toLong * 7) grow()
    val i = slot(key)
    if (!used(i)) {
      used(i) = true; keys(i) = key
      vals(i) = new Array[Long](4); lens(i) = 0
      n += 1
    }
    var a = vals(i)
    if (lens(i) == a.length) {
      a = java.util.Arrays.copyOf(a, a.length << 1)
      vals(i) = a
    }
    a(lens(i)) = value
    lens(i) += 1
  }

  private def grow(): Unit = {
    if (cap >= (1 << 30))
      throw new IllegalStateException(
        s"LongAdjacencyMap at maximum capacity ($n keys) — repartition the input")
    val oldCap = cap; val oldKeys = keys; val oldUsed = used
    val oldVals = vals; val oldLens = lens
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    vals = new Array[Array[Long]](cap); lens = new Array[Int](cap)
    var i = 0
    while (i < oldCap) {
      if (oldUsed(i)) {
        val j = slot(oldKeys(i)) // rehash moves the array pointer, not the data
        used(j) = true; keys(j) = oldKeys(i)
        vals(j) = oldVals(i); lens(j) = oldLens(i)
      }
      i += 1
    }
  }

  def size: Int = n

  /** (key, group size) pairs in internal (hash) order. */
  def groupSizes: Iterator[(Long, Int)] = new Iterator[(Long, Int)] {
    private var i = advance(0)
    private def advance(from: Int): Int = {
      var j = from
      while (j < cap && !used(j)) j += 1
      j
    }
    def hasNext: Boolean = i < cap
    def next(): (Long, Int) = {
      val r = (keys(i), lens(i)); i = advance(i + 1); r
    }
  }

  /** (key, values, liveLength) triples; the array is the live backing
    * store whose length may exceed the group size — only the first
    * `liveLength` elements are valid. */
  def groups: Iterator[(Long, Array[Long], Int)] = new Iterator[(Long, Array[Long], Int)] {
    private var i = advance(0)
    private def advance(from: Int): Int = {
      var j = from
      while (j < cap && !used(j)) j += 1
      j
    }
    def hasNext: Boolean = i < cap
    def next(): (Long, Array[Long], Int) = {
      val r = (keys(i), vals(i), lens(i)); i = advance(i + 1); r
    }
  }
}

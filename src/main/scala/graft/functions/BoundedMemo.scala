package graft.functions

/** Tiny bounded memo for per-process derived constants: MinHash
  * coefficients, random-projection hyperplanes, fitted IVF quantizers.
  *
  * Reads must stay a single lock-free ConcurrentHashMap hit — the hash
  * memos sit on the per-ROW path of generated code. So instead of LRU
  * bookkeeping (a lock or CAS per read), the memo RESETS wholesale when
  * an insert would exceed `maxEntries`: every cached value here is a
  * cheap-to-rebuild pure function of its key, so the worst case after a
  * reset is one recompute per live key. This bounds what a long-lived
  * session probing many corpora/configs can accumulate (unbounded maps
  * through r3) without taxing the hot path.
  */
final class BoundedMemo[K, V <: AnyRef](maxEntries: Int) {
  require(maxEntries > 0)
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()

  def getOrCompute(key: K, f: K => V): V = {
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val v = m.computeIfAbsent(key, k => f(k))
      // enforce AFTER the insert: a pre-insert check-then-act lets N
      // racing inserters overshoot the cap and stay there forever on a
      // read-heavy workload. Post-insert, the last insert to land sees
      // any overshoot and resets, so the map is within the cap whenever
      // no insert is in flight. Concurrent resets are benign; v is
      // already in hand.
      if (m.size > maxEntries) m.clear()
      v
    }
  }

  def size: Int = m.size
}

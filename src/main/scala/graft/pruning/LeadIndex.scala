package graft.pruning

import graft.store.SegmentFile

/** Interval index over the segments' LEADING-key spans, making static
  * segment pruning O(log n + answer) per qualified range instead of a
  * linear pass over every segment's bounds.
  *
  * Why it exists: the planner's `survivors` filter evaluates the
  * qualified lead ranges (and then the full tri-valued predicate)
  * against EVERY live segment. At bench scale (10,000 segments) that
  * linear pass costs ~7–13 ms per query — tolerable — but a 100 TB
  * table at ~256 MB/segment carries ~400k segments, putting every
  * point lookup ~300–500 ms deep in driver-side planning before a
  * single byte is read. The index flips the direction of the search:
  * instead of asking each segment "do the ranges intersect you?"
  * (`CriticalPoints.MultiRange.intersects`, already a binary search
  * over the RANGES), each range binary-searches the SEGMENTS.
  *
  * Structure: segment positions sorted by normalized lead(minKey),
  * plus a max-tree over lead(maxKey) in that order. A query range
  * [lo, hi] takes the sorted prefix with min ≤ hi (binary search) and
  * descends the max-tree over it, pruning whole subtrees whose max
  * lead span ends below lo — O(log n + k) per range, k = candidates.
  * Bounds are treated as CLOSED regardless of the range's inclusivity,
  * so the result is a superset of the exact `intersects` answer; the
  * caller re-runs its exact per-segment predicates on the candidates,
  * which keeps the pruning semantics byte-identical to the linear scan
  * (the index only decides what NOT to look at).
  *
  * Caching: one index per materialized segment list, weak-keyed by the
  * list's object IDENTITY. `SegmentFile`'s planning cache returns the
  * SAME `Seq[Meta]` instance for a given (table, manifest version), so
  * in the steady state the index is built once per commit and shared
  * by every query against that version; when the stats cache evicts a
  * version (or a new commit supersedes it) the weak key lets the index
  * go with it. Identity (not `WeakHashMap`'s equality) keying matters
  * at the scale the index exists for: a Seq hashCode/equals walk is
  * itself O(segments) per lookup, which would quietly reinstate ~40%
  * of the linear cost this class removes. Callers holding a derived /
  * filtered list (e.g. the runtime re-planner pruning the static
  * survivors) must NOT index it — a fresh build per query would cost
  * more than the linear scan it replaces.
  */
final class LeadIndex private (
    metas: IndexedSeq[SegmentFile.Meta],
    mins: Array[Any], // normalized lead of minKey, by original position
    maxs: Array[Any], // normalized lead of maxKey, by original position
    order: Array[Int], // original positions sorted by mins
    tree: Array[Any], // max-tree over maxs in sorted order (size 4n)
    cmp: (Any, Any) => Int) {

  private val n = order.length

  /** Count of sorted ranks whose min lead is ≤ `hi` (n for unbounded). */
  private def prefixLen(hi: Option[Any]): Int = hi match {
    case None => n
    case Some(h) =>
      var lo = 0
      var up = n
      while (lo < up) {
        val mid = (lo + up) >>> 1
        if (cmp(mins(order(mid)), h) <= 0) lo = mid + 1 else up = mid
      }
      lo
  }

  private def buildNode(node: Int, nl: Int, nh: Int): Any =
    if (nh - nl == 1) { tree(node) = maxs(order(nl)); tree(node) }
    else {
      val mid = (nl + nh) >>> 1
      val l = buildNode(2 * node, nl, mid)
      val r = buildNode(2 * node + 1, mid, nh)
      tree(node) = if (cmp(l, r) >= 0) l else r
      tree(node)
    }

  private def collect(node: Int, nl: Int, nh: Int, ub: Int,
      lo: Option[Any], out: java.util.BitSet): Unit = {
    if (nl >= ub) return
    if (lo.exists(l => cmp(tree(node), l) < 0)) return // whole node ends below lo
    if (nh - nl == 1) { out.set(order(nl)); return }
    val mid = (nl + nh) >>> 1
    collect(2 * node, nl, mid, ub, lo, out)
    collect(2 * node + 1, mid, nh, ub, lo, out)
  }

  /** Segments (in original list order) whose closed lead span may
    * intersect any of `ranges` — a superset of the exact answer; run
    * the exact predicates on the result. */
  def candidates(ranges: Seq[TriEval.ValueRange]): Seq[SegmentFile.Meta] = {
    if (n == 0 || ranges.isEmpty) return Vector.empty
    // a fully unbounded range admits everything — skip the bitset walk
    if (ranges.exists(r => r.lo.isEmpty && r.hi.isEmpty)) return metas
    val hit = new java.util.BitSet(metas.length)
    ranges.foreach(r => collect(1, 0, n, prefixLen(r.hi), r.lo, hit))
    val b = Vector.newBuilder[SegmentFile.Meta]
    var i = hit.nextSetBit(0)
    while (i >= 0) { b += metas(i); i = hit.nextSetBit(i + 1) }
    b.result()
  }
}

object LeadIndex {

  /** Below this size the linear pass is ~1 ms and the cache machinery
    * isn't worth engaging. A var only as a test hook: specs lower it to
    * force the indexed path onto small fixtures and compare its plans
    * row-for-row against the linear pass. */
  @volatile private[graft] var MinSegments: Int = 1024

  /** Weak-IDENTITY key: hashes by `System.identityHashCode` and equals
    * by reference of the referent, so a cache hit costs O(1) instead
    * of a full Seq equality walk. A cleared referent equals nothing,
    * so its entry becomes unreachable garbage; `purge` drops such
    * entries opportunistically on every miss (the map stays bounded by
    * the number of LIVE version lists, which the planning stats cache
    * caps at 32). */
  private final class IdKey(referent: AnyRef) {
    val ref = new java.lang.ref.WeakReference[AnyRef](referent)
    private val h = System.identityHashCode(referent)
    override def hashCode: Int = h
    override def equals(o: Any): Boolean = o match {
      case k: IdKey =>
        (k eq this) || { val a = ref.get; a != null && (a eq k.ref.get) }
      case _ => false
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[IdKey, LeadIndex]()

  private def purge(): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().ref.get == null) it.remove()
  }

  /** Index for `segs`, built once per list (weak-keyed on the list
    * itself — see class doc for why that equals once per manifest
    * version). `decodeLead` must yield values ordered by `cmp` exactly
    * as the caller's range bounds are. */
  def forSegments(segs: Seq[SegmentFile.Meta],
      decodeLead: Array[Byte] => Any,
      cmp: (Any, Any) => Int): LeadIndex = {
    val key = new IdKey(segs)
    val hit = cache.get(key)
    if (hit != null) return hit
    purge()
    val ms = segs.toIndexedSeq
    val n = ms.length
    val mins = new Array[Any](n)
    val maxs = new Array[Any](n)
    var i = 0
    while (i < n) {
      mins(i) = decodeLead(ms(i).minKey)
      maxs(i) = decodeLead(ms(i).maxKey)
      i += 1
    }
    val order = Array.range(0, n)
      .sortWith((a, b) => cmp(mins(a), mins(b)) < 0)
    val idx = new LeadIndex(ms, mins, maxs, order,
      new Array[Any](math.max(4 * n, 2)), cmp)
    if (n > 0) idx.buildNode(1, 0, n): Unit
    cache.put(key, idx)
    idx
  }

  private[graft] def cachedCount: Int = cache.size()
}

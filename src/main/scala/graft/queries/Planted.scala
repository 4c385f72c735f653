package graft.queries

/** Planted-copy id offsets for the deterministic-oracle corpora
  * (d04/d13, s-family, g-family, p-family): exact copies of known
  * rows are unioned in at `id + Off` (trios add `id + Off2`), making
  * hash-family results deterministic and SQL-expressible.
  *
  * The offset must exceed every organic id at EVERY rung a planted
  * query ever runs at — ADVICE r12 caught the old 1e6 offset
  * colliding with organic ids once the scale ladder outgrew it
  * (documents reach doc_id 1,999,999 at sf40 and 3,999,999 at sf80;
  * embeddings reach vec_id 1,599,999 at sf80), silently giving the
  * planted corpora two distinct rows per id. 1e12 clears a ~100 TB
  * corpus (~4e11 embedding rows at 256 B/vector) with headroom, and
  * [[graft.ShuffleAudit]] asserts `max(id) < Off` against the live
  * tables before each audit, so a corpus that outgrows it fails
  * loudly instead of skewing measurements.
  *
  * The DuckDB oracles state the same value as the literal
  * `1000000000000` (and `2000000000000`) — keep them in sync.
  */
object Planted {
  val Off: Long = 1000000000000L
  val Off2: Long = 2 * Off
}

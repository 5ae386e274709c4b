package graft

import org.apache.spark.sql.DataFrame

/** Registry of frames a module persisted: `track` every persist,
  * `clear` to release them all. This is the one discipline behind each
  * module's `clearCaches()` (Dedup's signature/shingle bases,
  * Similarity's k-means codebooks) — shared so the next persisting
  * module reuses it instead of hand-rolling a subtly different copy,
  * and so the Bench/Verify end-of-run release has one shape to call.
  */
final class PersistRegistry {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Record a frame for later release and return it unchanged. */
  def track(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Unpersist every tracked frame (non-blocking) and forget them. */
  def clear(): Unit = {
    frames.forEach(df => { df.unpersist(false); () })
    frames.clear()
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document's placement after sequence packing. */
final case class PackedDoc(source: String, doc_id: Long, chunk_id: Long,
                           offset_chars: Long)

/**
 * SEQUENCE PACKING for training pipelines: concatenate documents, in a
 * deterministic order, into fixed-capacity training chunks — the step that
 * turns a cleaned corpus into equal-budget model inputs.
 *
 * Semantics (greedy, order-preserving, per group): walk the group's docs in
 * ascending `doc_id`; if the running chunk cannot fit the next doc
 * (`filled + len > capacity`) close it and start a new one. A doc larger
 * than `capacity` occupies a chunk of its own (the chunk overflows rather
 * than splitting the doc). Output is one row per doc: its chunk ordinal
 * within the group and its byte/char offset inside the chunk.
 *
 * Why this shape at scale: packing is inherently SEQUENTIAL within a group
 * (chunk boundaries depend on every earlier doc) but embarrassingly
 * parallel ACROSS groups, so the plan is one shuffle by group key plus an
 * in-partition sort, then a single streamed pass per group
 * (`flatMapSortedGroups` — the iterator is spill-backed, never a per-group
 * in-memory list). For 10^12 docs where one source is itself too large,
 * pre-shard the key (e.g. `(source, doc_id >> 20)`): each shard packs
 * independently and the boundary waste is at most one underfull chunk per
 * shard.
 */
object Packing {

  /** Pack `docs` (needs `source`, `doc_id`, `n_chars` columns) into
    * chunks of at most `capacity` chars per source. */
  def packSequences(docs: DataFrame, capacity: Long): Dataset[PackedDoc] = {
    require(capacity > 0, "capacity must be positive")
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id").asc) { (src, it) =>
        var chunk = 0L; var filled = 0L; var first = true
        it.map { case (_, id, len) =>
          if (!first && filled + len > capacity) { chunk += 1; filled = 0L }
          first = false
          val off = filled
          filled += len
          PackedDoc(src, id, chunk, off)
        }
      }
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document's placement after sequence packing. */
final case class PackedDoc(source: String, doc_id: Long, chunk_id: Long,
                           offset_chars: Long)

/** One assembled training chunk. */
final case class PackedChunk(source: String, chunk_id: Long, n_docs: Long,
                             n_chars: Long, text: String)

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

  /** Assemble the packed chunks themselves: same greedy walk as
    * [[packSequences]] (same boundaries — capacity counts the docs'
    * `n_chars`, not the separators), emitting one row per chunk with the
    * docs' text joined by `sep` in doc_id order. The chunk is built lazily
    * inside the group's streamed iterator, so memory is bounded by ONE
    * chunk (~capacity chars), never the group. */
  def packChunks(docs: DataFrame, capacity: Long,
                 sep: String = "\u001e"): Dataset[PackedChunk] = {
    require(capacity > 0, "capacity must be positive")
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
      .as[(String, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id").asc) { (src, it0) =>
        new Iterator[PackedChunk] {
          private val it = it0.buffered
          private var chunk = -1L
          override def hasNext: Boolean = it.hasNext
          override def next(): PackedChunk = {
            chunk += 1
            val sb = new java.lang.StringBuilder
            var filled = 0L; var n = 0L
            var open = true
            while (open && it.hasNext) {
              val len = it.head._3
              if (n == 0L || filled + len <= capacity) {
                if (n > 0L) sb.append(sep)
                sb.append(it.head._4); filled += len; n += 1; it.next()
              } else open = false
            }
            PackedChunk(src, chunk, n, filled, sb.toString)
          }
        }
      }
  }
}

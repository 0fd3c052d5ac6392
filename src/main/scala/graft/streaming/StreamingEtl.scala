package graft.streaming

import graft.dsl.{Etl, PipelineResult}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming execution of an Etl pipeline (reference §2.8).
  *
  * The reference's streaming is chunk-at-a-time batch: map each chunk,
  * bind relationships within {chunk ∪ eager tables}, flush, evict. That
  * maps 1:1 onto Structured Streaming micro-batches:
  *
  *   readStream → foreachBatch { batch =>
  *     result = pipelineFor(batch).run()       // fresh state per chunk —
  *                                             // auto-keys reset for free
  *     checkRelationshipCompleteness(...)      // left-anti join
  *     flush(result)                           // per component, topo order
  *   }                                         // eviction is automatic
  *
  * Eager dimension tables (reference `load_eager`) are plain static
  * DataFrames the factory closes over — Catalyst broadcasts them into
  * every micro-batch join; no per-chunk rebuild.
  */
object StreamingEtl {

  final case class RelationshipIncompleteError(
      childTable: String, parentTable: String, missing: Seq[String])
    extends RuntimeException(
      s"chunk is missing parents for $childTable→$parentTable: " +
        s"${missing.take(5).mkString(", ")}${if (missing.size > 5) ", …" else ""}" +
        " — every chunk must contain all rows for each key it references" +
        " (or load the parent table eagerly)")

  /** Key-completeness check (reference relationships.py:541-616): every
    * child lookup value must resolve inside {chunk parents ∪ eager
    * parents}; raise naming the missing keys otherwise.
    */
  def checkRelationshipCompleteness(
      child: DataFrame, childKey: String,
      parents: DataFrame, parentKey: String,
      childTable: String, parentTable: String): Unit = {
    val missing = child
      .select(col(childKey))
      .filter(col(childKey).isNotNull)
      .join(parents.select(col(parentKey)),
        child(childKey) === parents(parentKey), "left_anti")
      .distinct().limit(6)
      .collect().map(_.get(0).toString).toSeq
    if (missing.nonEmpty)
      throw RelationshipIncompleteError(childTable, parentTable, missing)
  }

  /** Per-chunk flush behavior (reference chunking.py FlushStrategy). */
  trait FlushStrategy extends Serializable {
    def flush(result: PipelineResult, batchId: Long): Unit
  }

  /** Default: plain insert per micro-batch, component by component
    * (KeyCompleteFlushStrategy, chunking.py:281-315; the reference's
    * streaming loop flushes each weakly-connected component as its own
    * cycle, fluent.py:1894-2027 — topo order inside the component). */
  final case class AppendStrategy(writer: (String, DataFrame) => Unit)
      extends FlushStrategy {
    def flush(result: PipelineResult, batchId: Long): Unit =
      result.writeByComponent(writer)
  }

  /** Upsert by conflict columns per table (UpsertFlushStrategy,
    * chunking.py:361-540): rows re-appearing across chunks update instead
    * of duplicate — exact, no LRU heuristic needed, because the DB holds
    * the state the reference kept in its BufferedKey cache.
    */
  final case class JdbcUpsertStrategy(url: String,
      upsertOn: Map[String, Seq[String]], batchSize: Int = 500,
      nonNullUpdate: Boolean = false)
      extends FlushStrategy {
    def flush(result: PipelineResult, batchId: Long): Unit =
      graft.dsl.JdbcLoad.upsert(result, url, upsertOn, batchSize, nonNullUpdate)
  }

  /** The reference's BufferedKeyFlushStrategy (chunking.py:543-677) as an
    * exact DB-side operation: a key re-appearing in a later chunk UPDATEs
    * only the columns the new row provides (null columns keep the stored
    * value — "copy non-None scalars onto the cached instance"), while new
    * keys INSERT as-is. No LRU bound is needed: the database holds the
    * state the reference kept in a bounded in-process cache, so the
    * strategy is exact at any corpus size instead of heuristic.
    */
  def bufferedKeyStrategy(url: String, upsertOn: Map[String, Seq[String]],
      batchSize: Int = 500): FlushStrategy =
    JdbcUpsertStrategy(url, upsertOn, batchSize, nonNullUpdate = true)

  /** Attach a chunked Etl pipeline to a stream: every micro-batch becomes
    * one chunk. `pipeline` receives the batch DataFrame (the chunk's
    * roots) and builds the Etl plan — closing over any eager/broadcast
    * dimension tables.
    *
    * This is the reference's `sequential` chunk shape (chunking.py:26-33):
    * every record maps against pipeline root 0 with shared auto-key state
    * (one `run()` per chunk gives exactly that). A pipeline that calls
    * `root(i)` with i > 0 fails at build time inside the batch — use
    * [[foreachMultiRootChunk]] so each goto_root index gets its own root.
    */
  def foreachChunk(
      stream: DataFrame,
      pipeline: DataFrame => Etl,
      strategy: FlushStrategy): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val etl = pipeline(batch)
        etl.validateForStreaming(sequentialOnly = true)
        strategy.flush(etl.run(), batchId)
      }
    }

  /** Multi-root chunks (reference Chunk(sequential=False),
    * chunking.py:26-33, fluent.py:1406-1446): each micro-batch carries
    * rows for SEVERAL pipeline roots — `splitter` slices the batch into
    * one DataFrame per `goto_root` index (typically by a discriminator
    * column), and the pipeline maps root i of the chunk to root(i).
    */
  def foreachMultiRootChunk(
      stream: DataFrame,
      splitter: DataFrame => Seq[DataFrame],
      pipeline: Seq[DataFrame] => Etl,
      strategy: FlushStrategy): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val roots = splitter(batch)
        val etl = pipeline(roots)
        etl.validateForStreaming(sequentialOnly = false)
        strategy.flush(etl.run(), batchId)
      }
    }

  /** Group-by-key chunking (reference GroupByChunkSource /
    * ExternalPartitionChunkSource, chunking.py:74-233): in Spark the
    * shuffle IS the disk-backed partitioner — repartition by the chunk
    * key so each micro-batch task sees whole key groups, with no
    * pre-sorted-input requirement.
    */
  def repartitionByKey(df: DataFrame, key: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(key))
}

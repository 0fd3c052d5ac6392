package graft.dsl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import java.sql.{Connection, DriverManager, PreparedStatement}

/** Relational sinks (reference §2.1: SQLAlchemy/Supabase flush,
  * fluent.py:1584-1708 + adapters/supabase_adapter.py).
  *
  * Tables flush parent-first (topological order, driver-side); row data
  * moves executor→DB directly via per-partition JDBC batches — the driver
  * never materializes rows. Batch size bounds memory per task
  * (`load(batch_size=...)` in the reference).
  */
object JdbcLoad {

  /** Plain append of every pipeline table in topo order. */
  def append(result: PipelineResult, url: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    result.write { (table, df) =>
      df.write.mode("append").jdbc(url, table, props)
    }

  /** Update-else-insert upsert by per-table conflict columns (reference
    * `load(upsert=True, upsert_on=[...])` → ON CONFLICT DO UPDATE;
    * engine-portable two-step form, batched per partition).
    *
    * @param updateNonNull when true, an UPDATE only overwrites columns the
    *        incoming row provides (`SET c = COALESCE(?, c)`) — the
    *        reference's BufferedKeyFlushStrategy semantics
    *        (chunking.py:543-677: a re-appearing key copies non-None
    *        scalars onto the cached instance), made exact and unbounded by
    *        letting the DB hold the state the reference kept in its LRU.
    */
  def upsert(result: PipelineResult, url: String,
      upsertOn: Map[String, Seq[String]], batchSize: Int = 500,
      updateNonNull: Boolean = false): Unit =
    result.writeByComponent { (table, df) =>
      upsertOn.get(table) match {
        case None => df.write.mode("append").jdbc(url, table, new java.util.Properties())
        case Some(keys) =>
          upsertTable(df, url, table, keys, batchSize, updateNonNull); ()
      }
    }

  /** Identifier allowlist: table/column names come from pipeline code, but
    * they are still interpolated into SQL — refuse anything that isn't a
    * plain identifier rather than quoting (quoting would change case
    * folding under Derby/Postgres and break existing unquoted DDL). */
  private[dsl] def checkIdent(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"'$name' is not a plain SQL identifier")
    name
  }

  /** Table names may be schema-qualified ("app.users"); each dot-separated
    * segment must still be a plain identifier. */
  private[dsl] def checkTable(name: String): String = {
    val parts = name.split("\\.", -1)
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"'$name' is not a plain (optionally schema-qualified) SQL table name")
    name
  }

  /** Update-else-insert for one table, batched: each chunk of `batchSize`
    * rows issues ONE batched UPDATE round trip, the missed rows ONE
    * batched INSERT, then a commit — 2-3 round trips per chunk instead of
    * 1-2 per row (the reference batches its REST upserts the same way,
    * adapters/supabase_adapter.py:14-71). Rows must be unique on `keys`
    * within `df` (merged pipeline tables are by construction).
    *
    * @return number of DB statement round trips (batches executed), for
    *         observability and tests
    */
  private[dsl] def upsertTable(df: DataFrame, url: String, table: String,
      keys: Seq[String], batchSize: Int,
      updateNonNull: Boolean = false): Long = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    checkTable(table); cols.foreach(checkIdent)
    val roundTrips = df.sparkSession.sparkContext
      .longAccumulator(s"graft.jdbc.$table.roundTrips")
    if (nonKeys.isEmpty) {
      // pure-key table (e.g. an association table): there is nothing to
      // UPDATE — "UPDATE t SET WHERE ..." isn't even valid SQL — so the
      // correct upsert degenerates to insert-if-missing: per-row INSERT,
      // duplicate-key violations skipped (the reference's
      // on_conflict="skip" SAVEPOINT path, chunking.py:361-540)
      df.foreachPartition { (rows: Iterator[Row]) =>
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val insert = conn.prepareStatement(
            s"INSERT INTO $table (${cols.mkString(", ")}) " +
              s"VALUES (${cols.map(_ => "?").mkString(", ")})")
          var n = 0
          rows.foreach { row =>
            cols.zipWithIndex.foreach { case (c, i) =>
              insert.setObject(i + 1, row.getAs[Any](c)) }
            // savepoint per row: engines like Postgres abort the whole
            // transaction on a violation; rollback-to-savepoint keeps the
            // batch's earlier inserts (savepoints release at commit)
            val sp = conn.setSavepoint()
            try { insert.executeUpdate(); roundTrips.add(1) }
            catch {
              // SQLState class 23 = integrity-constraint violation. The
              // Postgres driver throws PSQLException(23505), which does NOT
              // subclass SQLIntegrityConstraintViolationException (Derby/
              // MySQL do) — match on the state class, not the subclass.
              case e: java.sql.SQLException
                  if e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
                    (e.getSQLState != null && e.getSQLState.startsWith("23")) =>
                conn.rollback(sp)
            }
            n += 1
            if (n % batchSize == 0) conn.commit()
          }
          conn.commit()
        } finally conn.close()
      }
      return roundTrips.value
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val setClause =
          if (updateNonNull) nonKeys.map(c => s"$c = COALESCE(?, $c)")
          else nonKeys.map(c => s"$c = ?")
        val update = conn.prepareStatement(
          s"UPDATE $table SET ${setClause.mkString(", ")} " +
            s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}")
        val insert = conn.prepareStatement(
          s"INSERT INTO $table (${cols.mkString(", ")}) " +
            s"VALUES (${cols.map(_ => "?").mkString(", ")})")
        val pending = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
        // Some drivers (Oracle always; MySQL with rewriteBatchedStatements)
        // legally return SUCCESS_NO_INFO (-2) per batch element, so
        // "count == 0" cannot identify missed rows there. Single
        // executeUpdate always reports a real count, so on first detection
        // this partition switches to per-row updates for ALL later chunks
        // (only the detecting chunk pays the batch twice — and its batch
        // did apply, so the per-row re-run is idempotent).
        var perRowMode = false
        def setParams(row: Row): Unit = {
          nonKeys.zipWithIndex.foreach { case (c, i) =>
            update.setObject(i + 1, row.getAs[Any](c)) }
          keys.zipWithIndex.foreach { case (c, i) =>
            update.setObject(nonKeys.size + i + 1, row.getAs[Any](c)) }
        }
        def perRowMisses(): Seq[Row] =
          pending.filter { row =>
            setParams(row)
            val n = update.executeUpdate(); roundTrips.add(1)
            n == 0
          }.toSeq
        def flush(): Unit = if (pending.nonEmpty) {
          val misses =
            if (perRowMode) perRowMisses()
            else {
              pending.foreach { row => setParams(row); update.addBatch() }
              val counts = update.executeBatch(); roundTrips.add(1)
              if (counts.contains(java.sql.Statement.SUCCESS_NO_INFO)) {
                perRowMode = true
                update.clearBatch()
                perRowMisses()
              } else pending.iterator.zip(counts.iterator)
                .collect { case (row, 0) => row }.toSeq
            }
          if (misses.nonEmpty) {
            misses.foreach { row =>
              cols.zipWithIndex.foreach { case (c, i) =>
                insert.setObject(i + 1, row.getAs[Any](c)) }
              insert.addBatch()
            }
            insert.executeBatch(); roundTrips.add(1)
          }
          conn.commit()
          pending.clear()
        }
        rows.foreach { row =>
          pending += row
          if (pending.size >= batchSize) flush()
        }
        flush()
      } finally conn.close()
    }
    roundTrips.value
  }

  /** Two-phase generated-ID capture (reference: Supabase link_to(fk=...),
    * fluent.py:820-901): insert rows, read back each DB-generated key, and
    * return (natural key columns, generated id) for joining onto children
    * before their own flush. Runs on executors per partition; use for
    * dimension-sized parents.
    */
  def insertReturningIds(df: DataFrame, url: String, table: String,
      naturalKey: Seq[String], idCol: String): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    checkTable(table); cols.foreach(checkIdent)
    val outSchema = StructType(
      naturalKey.map(k => df.schema(k)) :+ StructField(idCol, LongType))
    val outRows = df.rdd.mapPartitions { rows =>
      val conn = DriverManager.getConnection(url)
      try {
        val insert = conn.prepareStatement(
          s"INSERT INTO $table (${cols.mkString(", ")}) " +
            s"VALUES (${cols.map(_ => "?").mkString(", ")})",
          java.sql.Statement.RETURN_GENERATED_KEYS)
        // per-row executeUpdate is deliberate here: getGeneratedKeys after
        // executeBatch is driver-dependent (Derby returns only the last
        // key); this path is for dimension-sized parents
        rows.map { row =>
          cols.zipWithIndex.foreach { case (c, i) =>
            insert.setObject(i + 1, row.getAs[Any](c)) }
          insert.executeUpdate()
          val rs = insert.getGeneratedKeys
          rs.next()
          val id = rs.getLong(1)
          Row.fromSeq(naturalKey.map(k => row.getAs[Any](k)) :+ id)
        }.toVector.iterator // drain before closing the connection
      } finally conn.close()
    }
    spark.createDataFrame(outRows, outSchema)
  }
}

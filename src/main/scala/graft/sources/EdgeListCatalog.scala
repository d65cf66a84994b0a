package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-based `TableCatalog` over [[EdgeListSource]] directories — what
  * turns the connector into a SQL DML target with no metastore:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.EdgeListCatalog")
  *   CREATE TABLE graft.`/data/edges` (src BIGINT, dst BIGINT)
  *   INSERT INTO  graft.`/data/edges` VALUES (1, 2)
  *   SELECT ...   FROM graft.`/data/edges`
  *   DELETE FROM  graft.`/data/edges` WHERE src = 1     -- SupportsDeleteV2
  *   DROP TABLE   graft.`/data/edges`
  * }}}
  *
  * Table identity IS the filesystem path: a backquoted absolute path is
  * the table name; dotted identifiers join namespace segments with '/'
  * (`graft.data.edges` → `data/edges`). Nothing is cached — every load
  * re-lists the directory, so concurrent writers (the streaming sink,
  * compaction) are always seen at their latest committed state. The
  * schema is (src BIGINT, dst BIGINT), optionally + weight DOUBLE or
  * + label BIGINT chosen at CREATE — the extra-column choice persists
  * as a `_graft_meta` sidecar so later loads resolve it with no read
  * option. */
class EdgeListCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catName = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  /** FunctionCatalog face — serves the ONE function the storage layer
    * defines: `bucket(n, key)`, the hash behind bucketed layouts. This
    * is what lets Catalyst resolve a scan's reported `bucket(n, col)`
    * transform ([[EdgeListScan.outputPartitioning]]) and prove two
    * bucketed tables share a layout, i.e. plan their join with zero
    * Exchange (storage-partitioned join). */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  /** No metastore to enumerate — tables are paths. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  /** The persisted extra-column choice of a catalog-created table
    * (`_graft_meta` holding "weight" or "label"), so SQL resolves a
    * weighted/labeled table without any read option. Absent file =
    * plain (src, dst) — every pre-existing table. */
  private def metaOf(p: String): (Boolean, Boolean) = {
    val m = new java.io.File(p, "_graft_meta")
    if (!m.isFile) (false, false)
    else new String(java.nio.file.Files.readAllBytes(m.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim match {
      case "weight" => (true, false)
      case "label" => (false, true)
      case other => throw new IllegalStateException(
        s"corrupt _graft_meta in $p: '$other' (expected weight|label)")
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!new java.io.File(p).exists()) throw new NoSuchTableException(ident)
    val (w, l) = metaOf(p)
    new EdgeListTable(p, withWeight = w, withLabel = l)
  }

  /** SQL time travel — `SELECT … FROM graft.`path` VERSION AS OF n`:
    * pins the scan to snapshot n of the table's `_graft_log` manifest
    * history (every connector commit records one). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!new java.io.File(p).exists()) throw new NoSuchTableException(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"edge-list snapshot versions are integers; got '$version'")
    }
    val (w, l) = metaOf(p)
    new EdgeListTable(p, versionAsOf = Some(v), withWeight = w,
      withLabel = l)
  }

  /** SQL `TIMESTAMP AS OF` — resolves to the latest snapshot committed
    * at or before the timestamp (micros), then pins it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    if (!new java.io.File(p).exists()) throw new NoSuchTableException(ident)
    val (w, l) = metaOf(p)
    new EdgeListTable(p, versionAsOf =
      Some(EdgeLog.versionAt(new java.io.File(p), timestamp)),
      withWeight = w, withLabel = l)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val f = new java.io.File(pathOf(ident))
    if (f.exists()) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty, "edge-list tables are unpartitioned")
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val plain = schema.isEmpty ||
      (schema.fieldNames.toSeq == Seq("src", "dst") &&
        schema.fields.forall(_.dataType == LongType))
    val weighted = schema.fieldNames.toSeq == Seq("src", "dst", "weight") &&
      schema.fields.take(2).forall(_.dataType == LongType) &&
      schema.fields(2).dataType == DoubleType
    val labeled = schema.fieldNames.toSeq == Seq("src", "dst", "label") &&
      schema.fields.forall(_.dataType == LongType)
    require(plain || weighted || labeled,
      "edge-list tables have schema (src BIGINT, dst BIGINT)" +
        " [, weight DOUBLE | label BIGINT]; " +
        s"got ${schema.simpleString}")
    require(f.mkdirs(), s"cannot create edge-list table directory $f")
    // persist the extra-column choice so loadTable resolves it with no
    // read option (pre-existing plain tables simply have no meta file)
    if (weighted || labeled)
      java.nio.file.Files.write(new java.io.File(f, "_graft_meta").toPath,
        (if (weighted) "weight" else "label")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new EdgeListTable(f.getPath, withWeight = weighted, withLabel = labeled)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "edge-list tables have a fixed schema, chosen at CREATE " +
        "((src, dst) [+ weight | label])")

  override def dropTable(ident: Identifier): Boolean = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(pathOf(ident))
    if (!f.exists()) false else { rm(f); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = new java.io.File(pathOf(oldIdent))
    val to = new java.io.File(pathOf(newIdent))
    if (!from.exists()) throw new NoSuchTableException(oldIdent)
    if (to.exists()) throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.move(from.toPath, to.toPath)
    ()
  }
}

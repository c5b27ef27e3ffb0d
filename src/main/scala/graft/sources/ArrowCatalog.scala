package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-addressed [[TableCatalog]] over arrow-ipc directories — the hook
  * that lets Spark's own SQL DML reach the source:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.ArrowCatalog")
  *   spark.sql("SELECT * FROM graft.`/data/events`")
  *   spark.sql("INSERT INTO graft.`/data/events` SELECT ...")
  *   spark.sql("DELETE FROM graft.`/data/events` WHERE ts < ...")
  * }}}
  *
  * The identifier IS the directory path (one backquoted part; dotted
  * parts re-join with `/` so `graft.tmp.dir` also resolves). Tables are
  * stateless views over the directory — `loadTable` re-infers the schema
  * from the sentinel on every call, so DDL state can never go stale; a
  * path without a committed arrow-ipc dataset raises the standard
  * no-such-table error. DELETE resolves through [[ArrowIpcTable]]'s
  * `SupportsDelete` (metadata-level whole-file deletes, refusal
  * otherwise); INSERT INTO/OVERWRITE ride the standard DSv2 write path
  * (append / truncate). CREATE/ALTER/RENAME are refused — directories
  * are created by writes, not DDL. */
class ArrowCatalog extends TableCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val spark = SparkSession.active
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(p, "_schema.arrows")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace :+ ident.name)
    new ArrowIpcTable(ArrowInterchange.readSchema(spark, dir), dir)
  }

  override def tableExists(ident: Identifier): Boolean = {
    val spark = SparkSession.active
    val p = new Path(dirOf(ident))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_schema.arrows"))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    throw new UnsupportedOperationException(
      s"$catalogName: a path-addressed catalog cannot enumerate tables")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catalogName: create directories by WRITING to them " +
        "(df.write.format(\"arrow-ipc\").save(path)), not by DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName: schema is fixed by the directory's sentinel")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName: refusing to recursively delete a directory via DDL " +
        "— remove the path with filesystem tooling if that is really meant")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: rename the directory with filesystem tooling")
}

package graft.engine

import org.apache.spark.sql.types._

/** Column storage types — the 8 kinds the reference accepts
  * (reference: src/protos/protos/sql.proto:68-77, DDL mapping at
  * src/sql/postgresql/mod.rs:149-184).
  */
sealed abstract class ColumnTypeKind(val name: String, val sparkType: DataType) {
  /** May a serial counter drive this type? (reference: src/sql/client.rs:278-306) */
  def serialCapable: Boolean = false
  /** Upper bound for serial values; Long.MaxValue when unbounded. */
  def serialMax: Long = Long.MaxValue
}
object ColumnTypeKind {
  case object BooleanKind extends ColumnTypeKind("Boolean", BooleanType)
  case object Int16Kind extends ColumnTypeKind("Int16", ShortType) {
    override def serialCapable = true
    override def serialMax: Long = Short.MaxValue.toLong
  }
  case object Int32Kind extends ColumnTypeKind("Int32", IntegerType) {
    override def serialCapable = true
    override def serialMax: Long = Int.MaxValue.toLong
  }
  case object Int64Kind extends ColumnTypeKind("Int64", LongType) {
    override def serialCapable = true
  }
  case object Float32Kind extends ColumnTypeKind("Float32", FloatType)
  case object Float64Kind extends ColumnTypeKind("Float64", DoubleType)
  case object BytesKind extends ColumnTypeKind("Bytes", BinaryType)
  case object StringKind extends ColumnTypeKind("String", StringType)

  val all: Seq[ColumnTypeKind] =
    Seq(BooleanKind, Int16Kind, Int32Kind, Int64Kind, Float32Kind, Float64Kind, BytesKind, StringKind)
  def fromName(n: String): ColumnTypeKind =
    all.find(_.name == n).getOrElse(throw SqlError.unexpected(s"unknown type kind $n"))
}

/** Index kinds (reference: src/protos/protos/sql.proto:131-148). */
sealed abstract class IndexKind(val name: String)
object IndexKind {
  case object NotUnique extends IndexKind("NotUnique")
  case object UniqueNullsDistinct extends IndexKind("UniqueNullsDistinct")
  case object UniqueNullsNotDistinct extends IndexKind("UniqueNullsNotDistinct")
  case object PrimaryKey extends IndexKind("PrimaryKey")
  val all: Seq[IndexKind] = Seq(NotUnique, UniqueNullsDistinct, UniqueNullsNotDistinct, PrimaryKey)
  def fromName(n: String): IndexKind =
    all.find(_.name == n).getOrElse(throw SqlError.unexpected(s"unknown index kind $n"))
}

/** reference: src/protos/protos/sql.proto:121-129. `maxLength` carries a
  * `varchar(n)` declaration; `defaultValue` exists in the reference model
  * but no DDL path produces it (DEFAULT is rejected), so it is omitted.
  */
final case class ColumnDescriptor(
    id: Int,
    name: String,
    nullable: Boolean,
    serial: Boolean,
    typeKind: ColumnTypeKind,
    maxLength: Option[Int]) {
  def toStructField: StructField = {
    val md = maxLength match {
      case Some(n) => new MetadataBuilder().putLong("varcharMaxLength", n.toLong).build()
      case None => Metadata.empty
    }
    StructField(name, typeKind.sparkType, nullable, md)
  }
}

/** reference: src/protos/protos/sql.proto:131-148. */
final case class IndexDescriptor(
    id: Int,
    name: String,
    kind: IndexKind,
    columnIds: Seq[Int],
    storingColumnIds: Seq[Int]) {
  def isPrimary: Boolean = kind == IndexKind.PrimaryKey
  def isUnique: Boolean = kind != IndexKind.NotUnique
}

/** reference: src/protos/protos/sql.proto:47-61. */
final case class TableDescriptor(
    id: Long,
    name: String,
    lastColumnId: Int,
    lastIndexId: Int,
    columns: Seq[ColumnDescriptor],
    indices: Seq[IndexDescriptor]) {
  def findColumn(name: String): Option[ColumnDescriptor] = columns.find(_.name == name)
  def column(id: Int): ColumnDescriptor =
    columns.find(_.id == id).getOrElse(throw SqlError.unexpected(s"no column id $id in table $name"))
  def primaryIndex: IndexDescriptor = indices.find(_.isPrimary).get
  def toStructType: StructType = StructType(columns.map(_.toStructField))
}

/** Mirrors the reference's TableDescriptorBuilder rules
  * (reference: src/sql/shared.rs:57-186, id assignment src/sql/traits.rs:34-61):
  * column ids assigned in order from 1; primary index mandatory, added
  * first, storing every non-key column; auto names
  * primary_index_N / unique_index_N / index_N.
  */
final class TableDescriptorBuilder(tableName: String) {
  private var columns = Vector.empty[ColumnDescriptor]
  private var primary: Option[(Option[String], Seq[String])] = None
  private var uniques = Vector.empty[(Option[String], Seq[String], IndexKind)]
  private var plains = Vector.empty[(Option[String], Seq[String])]

  def addColumn(name: String, kind: ColumnTypeKind, maxLength: Option[Int]): this.type = {
    if (columns.exists(_.name == name))
      throw SqlError.invalid(s"multiple columns named $name")
    columns :+= ColumnDescriptor(columns.size + 1, name, nullable = true, serial = false, kind, maxLength)
    this
  }
  private def updateLast(f: ColumnDescriptor => ColumnDescriptor): Unit =
    columns = columns.init :+ f(columns.last)
  def setNullable(nullable: Boolean): this.type = { updateLast(_.copy(nullable = nullable)); this }
  /** serial forces NOT NULL (reference: src/sql/shared.rs:77-81). */
  def setSerial(serial: Boolean): this.type = {
    updateLast(c => c.copy(nullable = c.nullable && !serial, serial = serial))
    this
  }
  def lastColumnName: String = columns.last.name

  def addPrimaryIndex(name: Option[String], columnNames: Seq[String]): this.type = {
    primary.foreach { case (n, cols) =>
      throw SqlError.invalid(
        s"multiple primary indices: name $n, columns $cols and name $name, columns $columnNames")
    }
    checkColumns(columnNames, IndexKind.PrimaryKey, name)
    primary = Some((name, columnNames))
    this
  }
  def addUniqueIndex(name: Option[String], columnNames: Seq[String], nullsDistinct: Boolean): this.type = {
    val kind = if (nullsDistinct) IndexKind.UniqueNullsDistinct else IndexKind.UniqueNullsNotDistinct
    checkColumns(columnNames, kind, name)
    uniques :+= ((name, columnNames, kind))
    this
  }
  def addIndex(name: Option[String], columnNames: Seq[String]): this.type = {
    checkColumns(columnNames, IndexKind.NotUnique, name)
    plains :+= ((name, columnNames))
    this
  }

  private def checkColumns(names: Seq[String], kind: IndexKind, idxName: Option[String]): Unit =
    names.foreach { n =>
      if (!columns.exists(_.name == n))
        throw SqlError.invalid(s"table $tableName has no column in defining ${kind.name} $idxName")
    }
  private def ids(names: Seq[String]): Seq[Int] =
    names.map(n => columns.find(_.name == n).get.id)

  def build(tableId: Long): TableDescriptor = {
    val (pkName, pkCols) = primary.getOrElse(
      throw SqlError.invalid(s"table $tableName defines no primary index"))
    val pkIds = ids(pkCols)
    var nextIndexId = 0
    def mk(name: Option[String], kind: IndexKind, columnIds: Seq[Int]): IndexDescriptor = {
      nextIndexId += 1
      val autoName = kind match {
        case IndexKind.PrimaryKey => s"primary_index_$nextIndexId"
        case IndexKind.UniqueNullsDistinct | IndexKind.UniqueNullsNotDistinct => s"unique_index_$nextIndexId"
        case IndexKind.NotUnique => s"index_$nextIndexId"
      }
      val storing =
        if (kind == IndexKind.PrimaryKey) columns.map(_.id).filterNot(columnIds.contains)
        else Seq.empty[Int]
      IndexDescriptor(nextIndexId, name.getOrElse(autoName), kind, columnIds, storing)
    }
    val pk = mk(pkName, IndexKind.PrimaryKey, pkIds)
    // primary key columns are implicitly NOT NULL
    columns = columns.map(c => if (pkIds.contains(c.id)) c.copy(nullable = false) else c)
    val idx = pk +: (uniques.map { case (n, cols, kind) => mk(n, kind, ids(cols)) } ++
      plains.map { case (n, cols) => mk(n, IndexKind.NotUnique, ids(cols)) })
    TableDescriptor(tableId, tableName, columns.size, nextIndexId, columns, idx)
  }
}

/** JSON (de)serialization via jackson-databind (ships with Spark). */
object DescriptorJson {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.ObjectNode
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  def write(d: TableDescriptor): String = {
    val root = mapper.createObjectNode()
    root.put("id", d.id)
    root.put("name", d.name)
    root.put("lastColumnId", d.lastColumnId)
    root.put("lastIndexId", d.lastIndexId)
    val cols = root.putArray("columns")
    d.columns.foreach { c =>
      val n = cols.addObject()
      n.put("id", c.id); n.put("name", c.name); n.put("nullable", c.nullable)
      n.put("serial", c.serial); n.put("typeKind", c.typeKind.name)
      c.maxLength.foreach(m => n.put("maxLength", m))
    }
    val idx = root.putArray("indices")
    d.indices.foreach { i =>
      val n = idx.addObject()
      n.put("id", i.id); n.put("name", i.name); n.put("kind", i.kind.name)
      val ci = n.putArray("columnIds"); i.columnIds.foreach(ci.add)
      val si = n.putArray("storingColumnIds"); i.storingColumnIds.foreach(si.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def read(json: String): TableDescriptor = {
    val root = mapper.readTree(json)
    def arr(n: JsonNode, f: String): Seq[JsonNode] = n.get(f).elements().asScala.toSeq
    TableDescriptor(
      id = root.get("id").asLong(),
      name = root.get("name").asText(),
      lastColumnId = root.get("lastColumnId").asInt(),
      lastIndexId = root.get("lastIndexId").asInt(),
      columns = arr(root, "columns").map { c =>
        ColumnDescriptor(
          c.get("id").asInt(), c.get("name").asText(), c.get("nullable").asBoolean(),
          c.get("serial").asBoolean(), ColumnTypeKind.fromName(c.get("typeKind").asText()),
          Option(c.get("maxLength")).map(_.asInt()))
      },
      indices = arr(root, "indices").map { i =>
        IndexDescriptor(
          i.get("id").asInt(), i.get("name").asText(), IndexKind.fromName(i.get("kind").asText()),
          arr(i, "columnIds").map(_.asInt()), arr(i, "storingColumnIds").map(_.asInt()))
      })
  }
}

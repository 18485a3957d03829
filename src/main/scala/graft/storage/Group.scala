package graft.storage

import org.apache.spark.sql.SparkSession
import graft.core.Json
import graft.core.Json._

/** Hierarchical namespace of arrays and groups with group metadata
  * (reference: tiledb/group.py:11-340; catalog ops object_type/ls/walk/
  * move/remove at tiledb/highlevel.py:412-475). A group is a directory
  * with a `__group.json` member list; arrays are array-table dirs.
  */
object Group {

  case class Member(uri: String, name: Option[String], objectType: String)

  private def groupFile(uri: String) = s"$uri/__group.json"

  def create(spark: SparkSession, uri: String): Unit = {
    val fs = VFS(spark)
    require(!fs.exists(groupFile(uri)), s"group already exists at $uri")
    fs.mkdirs(uri)
    fs.writeString(groupFile(uri), JObj(Seq("members" -> JArr(Nil))).render)
  }

  def objectType(spark: SparkSession, uri: String): String = {
    val fs = VFS(spark)
    if (fs.exists(s"$uri/__schema")) "array"
    else if (fs.exists(groupFile(uri))) "group"
    else "invalid"
  }

  def members(spark: SparkSession, uri: String): Seq[Member] = {
    val fs = VFS(spark)
    if (!fs.exists(groupFile(uri))) Nil
    else Json.parse(fs.readString(groupFile(uri))).obj("members").get.arr.map { m =>
      val o = m.obj
      Member(o("uri").get.str, o("name").flatMap(_.strOpt), o("type").get.str)
    }
  }

  private def writeMembers(spark: SparkSession, uri: String, ms: Seq[Member]): Unit =
    VFS(spark).writeString(groupFile(uri), JObj(Seq("members" -> JArr(ms.map(m =>
      JObj(Seq("uri" -> JStr(m.uri),
        "name" -> m.name.map(JStr).getOrElse(JNull),
        "type" -> JStr(m.objectType))))))).render)

  def add(spark: SparkSession, uri: String, memberUri: String, name: Option[String] = None): Unit = {
    val t = objectType(spark, memberUri)
    require(t != "invalid", s"cannot add non-array/group member: $memberUri")
    writeMembers(spark, uri, members(spark, uri) :+ Member(memberUri, name, t))
  }

  def remove(spark: SparkSession, uri: String, memberUri: String): Unit =
    writeMembers(spark, uri, members(spark, uri)
      .filterNot(m => m.uri == memberUri || m.name.contains(memberUri)))

  /** Recursive walk (preorder), yielding (uri, objectType). */
  def walk(spark: SparkSession, uri: String): Seq[(String, String)] =
    members(spark, uri).flatMap { m =>
      (m.uri, m.objectType) +: (if (m.objectType == "group") walk(spark, m.uri) else Nil)
    }

  def move(spark: SparkSession, from: String, to: String): Unit = {
    require(VFS(spark).rename(from, to), s"move failed: $from -> $to")
  }

  def putMeta(spark: SparkSession, uri: String, key: String, value: JVal): Unit =
    ArrayTable.putMeta(spark, uri, key, value)
  def getMeta(spark: SparkSession, uri: String, key: String): Option[JVal] =
    ArrayTable.getMeta(spark, uri, key)
}

package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal JSON support: a hand-rolled writer (deterministic field order)
  * plus jackson-databind (ships with Spark) for parsing. Used for array
  * schema / fragment-manifest / metadata sidecar files.
  */
object Json {
  sealed trait JVal { def render: String = Json.render(this) }
  case class JStr(v: String) extends JVal
  case class JNum(v: Double) extends JVal
  case class JLong(v: Long) extends JVal
  case class JBool(v: Boolean) extends JVal
  case object JNull extends JVal
  case class JArr(items: Seq[JVal]) extends JVal
  case class JObj(fields: Seq[(String, JVal)]) extends JVal {
    def apply(k: String): Option[JVal] = fields.find(_._1 == k).map(_._2)
  }

  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(v: JVal): String = v match {
    case JStr(s)  => "\"" + escape(s) + "\""
    case JNum(d)  => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case JLong(l) => l.toString
    case JBool(b) => b.toString
    case JNull    => "null"
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JObj(fs) => fs.map { case (k, x) => "\"" + escape(k) + "\":" + render(x) }.mkString("{", ",", "}")
  }

  private val mapper = new ObjectMapper()

  def parse(s: String): JVal = fromNode(mapper.readTree(s))

  private def fromNode(n: JsonNode): JVal =
    if (n == null || n.isNull) JNull
    else if (n.isTextual) JStr(n.asText)
    else if (n.isIntegralNumber) JLong(n.asLong)
    else if (n.isNumber) JNum(n.asDouble)
    else if (n.isBoolean) JBool(n.asBoolean)
    else if (n.isArray) JArr(n.elements.asScala.map(fromNode).toSeq)
    else JObj(n.properties.asScala.map(e => e.getKey -> fromNode(e.getValue)).toSeq)

  // convenience extractors
  implicit class JValOps(v: JVal) {
    def str: String = v.asInstanceOf[JStr].v
    def long: Long = v match { case JLong(l) => l; case JNum(d) => d.toLong; case x => sys.error(s"not a number: $x") }
    def dbl: Double = v match { case JNum(d) => d; case JLong(l) => l.toDouble; case x => sys.error(s"not a number: $x") }
    def bool: Boolean = v.asInstanceOf[JBool].v
    def arr: Seq[JVal] = v.asInstanceOf[JArr].items
    def obj: JObj = v.asInstanceOf[JObj]
    def strOpt: Option[String] = v match { case JStr(s) => Some(s); case _ => None }
  }
}

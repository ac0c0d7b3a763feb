package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** YAML project configuration (S5/E9 — the reference's `config.yaml`
  * driving all DDL and ingest, `create_project.py:31-32`).
  *
  * Parsed into an untyped tree with typed accessors: the schema is
  * config-driven by design (dynamic sample columns, VCF field tables), so
  * a rigid bean mapping would defeat the point.
  */
final class ProjectConfig(root: Map[String, Any]) {

  private def node(path: String*): Option[Any] =
    path.foldLeft(Option[Any](root)) {
      case (Some(m: Map[_, _]), key) =>
        m.asInstanceOf[Map[String, Any]].get(key)
      case _ => None
    }

  def string(path: String*): Option[String] =
    node(path: _*).map(String.valueOf)

  def int(path: String*): Option[Int] = node(path: _*).collect {
    case n: Number => n.intValue
    case s: String => s.toInt
  }

  def bool(path: String*): Boolean = node(path: _*).exists {
    case b: Boolean => b
    case s: String  => s.toBoolean
    case _          => false
  }

  def stringList(path: String*): Seq[String] =
    node(path: _*).collect { case l: Seq[_] => l.map(String.valueOf) }
      .getOrElse(Nil)

  /** name → value map (e.g. sample manifests, VCF field→type tables). */
  def stringMap(path: String*): Seq[(String, String)] =
    node(path: _*).collect { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq
        .map { case (k, v) => k -> String.valueOf(v) }
    }.getOrElse(Nil)

  def has(path: String*): Boolean = node(path: _*).isDefined
}

object ProjectConfig {
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  def load(path: String): ProjectConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val tree = mapper.readValue(new java.io.File(path),
      classOf[java.util.Map[String, Any]])
    new ProjectConfig(toScala(tree).asInstanceOf[Map[String, Any]])
  }
}

package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** Normalization between the reference's schemaless JSON tree and the
  * engine's relational form (SURVEY.md §1.4, FIXTURES.md §2):
  *
  *   frdb_rows(path: string, key: string, value_json: string)
  *
  * one row per LEAF edge — `path` is the '/'-rooted parent path built by
  * string concatenation exactly as the reference descends
  * (BackupProcessor.php:115), `key` the child key (total string order,
  * BackupProcessor.php:90,163), `value_json` the opaque JSON scalar
  * round-tripped byte-compatibly (BackupProcessor.php:213,
  * RestoreProcessor.php:80).
  *
  * Pure functions over strings (jackson is on the Spark classpath) —
  * used inside `flatMap`/`mapPartitions` on executors, so flattening a
  * corpus of trees is embarrassingly parallel; no driver-side recursion
  * over data (SURVEY.md §3.4).
  *
  * JSON arrays are treated as objects with integer keys — Firebase's own
  * array encoding (SURVEY.md §1.1).
  */
object TreeCodec {

  final case class Edge(path: String, key: String, valueJson: String)

  private val mapper = new ObjectMapper()

  /** The '/'-rooted path-join rule — load-bearing for backup/restore
    * path identity, so it lives in exactly one place (previously five
    * private copies across the walker, planner, archive decoder, DSv2
    * scan, and this codec). */
  def childPath(parent: String, key: String): String =
    if (parent == "/") s"/$key" else s"$parent/$key"

  /** Flatten one JSON document into leaf edges. Empty objects/arrays
    * produce no edges (Firebase has no empty-node representation). */
  def flatten(json: String, rootPath: String = "/"): Seq[Edge] = {
    val buf = Vector.newBuilder[Edge]
    def walk(path: String, node: JsonNode): Unit =
      if (node.isObject) {
        node.fields().asScala.foreach { e =>
          val (k, v) = (e.getKey, e.getValue)
          if (v.isObject || v.isArray) walk(childPath(path, k), v)
          else buf += Edge(path, k, mapper.writeValueAsString(v))
        }
      } else if (node.isArray) {
        node.elements().asScala.zipWithIndex.foreach { case (v, i) =>
          if (v.isObject || v.isArray) walk(childPath(path, i.toString), v)
          else buf += Edge(path, i.toString, mapper.writeValueAsString(v))
        }
      } else {
        // scalar root: keyed under "" at its parent, like Firebase's
        // root-value PUT; callers with tree roots never hit this.
        buf += Edge(path, "", mapper.writeValueAsString(node))
      }
    walk(rootPath, mapper.readTree(json))
    buf.result()
  }

  /** Reassemble leaf edges into a JSON tree (inverse of flatten on
    * object-rooted trees whose leaves came from flatten). Key order is
    * normalized to sorted — the order the reference's key-ordered scan
    * (orderBy="$key") would produce. Array-ness is NOT resurrected:
    * like Firebase, arrays round-trip as integer-keyed objects. */
  def assemble(edges: Seq[Edge]): String = {
    val root = mapper.createObjectNode()
    def nodeAt(path: String): ObjectNode = {
      if (path == "/") root
      else path.stripPrefix("/").split('/')
        .foldLeft(root) { (n, seg) =>
          n.get(seg) match {
            case o: ObjectNode => o
            case _ => val c = mapper.createObjectNode(); n.set[JsonNode](seg, c); c
          }
        }
    }
    // sorted insertion => deterministic serialization
    edges.sortBy(e => (e.path, e.key)).foreach { e =>
      nodeAt(e.path).set[JsonNode](e.key, mapper.readTree(e.valueJson))
    }
    mapper.writeValueAsString(root)
  }

  /** Canonical JSON equality (key order irrelevant) — the round-trip
    * law's comparator. */
  def jsonEqual(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)
}

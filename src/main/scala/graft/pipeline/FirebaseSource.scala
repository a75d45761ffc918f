package graft.pipeline

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 face of the live walker (SURVEY.md §4's deferred item):
  *
  * {{{
  *   spark.read.format("firebase")
  *     .option("url", "https://<project>.firebaseio.com")
  *     .option("token", "<secret>")        // optional
  *     .option("root", "/")                // optional
  *     .option("maxIpp", "1000")           // optional
  *     .load()                             // (path, key, value_json)
  * }}}
  *
  * Planning mirrors [[LiveExport.plan]]'s split rule — one
  * InputPartition per walkable subtree, fat subtrees (floor page too
  * large, the go-deeper condition) split into their children — so a
  * skewed database still spreads across the cluster. The probe loop
  * here runs ON THE DRIVER (DSv2 planning cannot launch jobs): one
  * floor-page GET per candidate subtree, which is fine for the
  * planning fan-out; the function-API path (LiveExport.export)
  * distributes even the probing when the top level is huge.
  *
  * Each partition reader walks its subtree with its own [[LiveExport
  * .Walker]] (C1 keyset pagination, C2 adaptive IPP, C3 go-deeper
  * recursion — BackupProcessor.php:71-199) and emits the engine's
  * canonical leaf-edge rows. Memory per reader is bounded by one
  * subtree, the same contract as the mapPartitions walk.
  */
class FirebaseSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "firebase"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FirebaseSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FirebaseTable(FirebaseSource.conf(
      new CaseInsensitiveStringMap(properties)))
}

object FirebaseSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value_json", StringType, nullable = false)))

  /** Plain-string config so every plan node serializes cleanly into
    * executor tasks. */
  final case class Conf(url: String, token: Option[String],
                        root: String, maxIpp: Int,
                        startIpp: Option[Int] = None) {
    def client(): RestClient = new HttpRestClient(url, token)
    def walker(): LiveExport.Walker =
      new LiveExport.Walker(client(), maxIpp, startIpp = startIpp)
  }

  def conf(o: CaseInsensitiveStringMap): Conf = {
    val url = o.get("url")
    require(url != null && url.nonEmpty,
      "firebase source requires .option(\"url\", ...)")
    Conf(url,
      Option(o.get("token")).filter(_.nonEmpty),
      Option(o.get("root")).filter(_.nonEmpty).getOrElse("/"),
      Option(o.get("maxipp")).map(_.toInt)
        .getOrElse(LiveExport.DefaultMaxIpp),
      // the reference's root_start_ipp (ExportCommand.php:45)
      Option(o.get("rootstartipp")).map(_.toInt))
  }
}

final class FirebaseTable(conf: FirebaseSource.Conf)
    extends Table with SupportsRead {
  override def name(): String = s"firebase(${conf.url}${conf.root})"
  override def schema(): StructType = FirebaseSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FirebaseScan(conf)
}

final class FirebaseScan(conf: FirebaseSource.Conf)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = FirebaseSource.Schema
  override def toBatch: Batch = this

  /** The [[LiveExport.plan]] loop, driver-side: probe each pending
    * subtree with one floor page; split the too-fat ones into their
    * children until every work item is walkable whole. */
  override def planInputPartitions(): Array[InputPartition] = {
    val walker = conf.walker()
    def childPath(parent: String, key: String): String =
      TreeCodec.childPath(parent, key)
    var pending: Seq[String] =
      walker.shallowKeys(conf.root).map(childPath(conf.root, _))
    val work = Array.newBuilder[InputPartition]
    while (pending.nonEmpty) {
      val verdicts = pending.map(p => p -> walker.probeSplit(p))
      pending = verdicts.flatMap(_._2)
      verdicts.foreach { case (p, splits) =>
        if (splits.isEmpty) work += FirebasePartition(p)
      }
    }
    work.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FirebaseReaderFactory(conf)
}

final case class FirebasePartition(path: String) extends InputPartition

final class FirebaseReaderFactory(conf: FirebaseSource.Conf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = conf.walker()
        .fetchTree(p.asInstanceOf[FirebasePartition].path).iterator
      private var cur: TreeCodec.Edge = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur.path),
        UTF8String.fromString(cur.key),
        UTF8String.fromString(cur.valueJson))
      override def close(): Unit = ()
    }
}

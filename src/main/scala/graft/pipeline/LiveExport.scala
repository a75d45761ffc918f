package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** The live Firebase-REST export path — the reference's actual reason to
  * exist (`firebase->get` pagination, BackupProcessor.php:150-200) for a
  * user who holds only a live database, no archive.
  *
  * Faithful control-plane semantics, per path (all references are
  * BackupProcessor.php):
  *
  *  - C1 keyset pagination: `orderBy="$key"` + `limitToFirst=ipp` +
  *    `startAt="<lastKey>"`, startAt inclusive so every page after the
  *    first drops its leading duplicate key (:150-199).
  *  - C2 adaptive page sizing ("intelligent IPP"): halve on
  *    `Payload is too large` (floor MIN_IPP=2, :10,:173-175), grow x1.2
  *    after 5 consecutive successful pages, capped at max_ipp
  *    (:181-184), remembered per path across the path's pages.
  *  - C3 go-deeper recursion: a page that still fails at the floor means
  *    one child is too fat to fetch whole — list the path's keys with
  *    `shallow=true` (retried <=10x, then BackupFailure — :80-87),
  *    descend into exactly one child, then resume pagination at the next
  *    shallow key with the preserve-last-key flag so the resumed page
  *    keeps its inclusive first element (:88-127).
  *
  * The data plane diverges deliberately: the reference is one PHP
  * process walking the whole tree; here the driver only lists the
  * root's shallow keys and each executor task walks its own top-level
  * subtrees ([[export]]), so a 1000-executor cluster drains a database
  * 1000 subtrees at a time. Page payloads are flattened to the engine's
  * canonical leaf-edge frame (TreeCodec) instead of chunk files.
  *
  * Ordering note: shallow keys sort in Firebase's `$key` CURSOR order
  * ([[LiveExport.KeyOrdering]] — integer-parseable keys first,
  * numerically), NOT the reference's plain lexicographic
  * `sort($this->shallow_tree[$path])` (:90): the go-deeper resume sets
  * `startAt` from the client-side sort while the server pages in cursor
  * order, so a lexicographic sort (which puts "10" before "2") makes a
  * resume at "10" silently skip key "2"'s subtree — a latent
  * completeness bug in the reference for mixed integer/string keys.
  */
object LiveExport {

  /** Reference constants: BackupProcessor.php:10 (MIN_IPP), :16
    * (max_ipp default), :84 (shallow retry cap), :181 (grow-after). */
  val MinIpp = 2
  val DefaultMaxIpp = 1000
  val ShallowRetries = 10
  val GrowAfter = 5

  /** The BackupFailureException analog (exceptions/
    * BackupFailureException.php): shallow listing failed 10x. */
  final class BackupFailure(msg: String) extends RuntimeException(msg)

  /** Control-flow sentinel for [[Walker.fetchTreeLimited]]'s early
    * stop; never escapes it (stackless — thrown once per limited
    * walk, not worth a fill-in). */
  private[pipeline] final class StopWalk
      extends RuntimeException(null, null, false, false)

  /** Firebase `$key` cursor order (REST API "Ordering of data"): keys
    * parseable as 32-bit integers sort FIRST, numerically; everything
    * else follows lexicographically. The go-deeper resume
    * (startAt = the child after the one descended into) walks pages in
    * this order, so the client-side shallow-key sort MUST match the
    * server's EXACTLY — a lexicographic sort puts "10" before "2", and
    * resuming at "10" makes the server-side cursor silently skip key
    * "2"'s subtree. Same failure mode for any parser disagreement,
    * which is why [[parseIntKey]] mirrors the server's `nameCompare`
    * integer rule (the SDKs' `^-?(0*)\d{1,10}$` + 32-bit bounds)
    * rather than the JVM's: Scala's `toIntOption` accepts a leading
    * '+' that Firebase treats as a string key — a client sorting "+5"
    * first among integers while the server pages it among strings
    * re-creates the resume-skip bug for that key's subtree. Equal
    * integer values ("1" vs "01" vs "-0"/"0") tie-break by string
    * LENGTH, the server's deterministic rule (distinct same-value
    * same-length keys are impossible, so length settles every tie). */
  val KeyOrdering: Ordering[String] = Ordering.by { k: String =>
    parseIntKey(k) match {
      case Some(v) => (0, v.toLong, k.length, "")
      case None => (1, 0L, 0, k)
    }
  }

  /** Firebase's integer-key test: optional '-', digits only (leading
    * zeros fine, leading '+' NOT an integer), value within 32-bit
    * bounds. Every digit must be ASCII '0'..'9': `Integer.parseInt`
    * (and so `toIntOption`) accepts non-ASCII Unicode digits
    * (e.g. '٥' ARABIC-INDIC FIVE parses as 5), but Firebase's
    * nameCompare matches only ASCII — a Unicode-digit key sorted
    * among integers client-side but paged among strings server-side
    * re-creates the resume-skip subtree loss for that key class.
    * `toIntOption` then supplies only the 32-bit bounds check
    * (11-significant-digit overflows come back None).
    *
    * Adopted authority: the JS SDK's `^-?(0*)\d{1,10}$` — unlimited
    * leading zeros, so '000000000001' is an integer key here. The
    * Java/ObjC SDKs additionally cap key length at 11 chars and would
    * classify it as a string; against a server following the capped
    * rule this client diverges for zero-padded keys >11 chars (the
    * stub's independent NameCompare encodes the same JS choice, so
    * the suite documents rather than hides it). */
  private[graft] def parseIntKey(k: String): Option[Int] = {
    val digits = if (k.startsWith("-")) k.substring(1) else k
    if (digits.isEmpty || !digits.forall(c => c >= '0' && c <= '9')) None
    else k.toIntOption
  }

  private sealed trait PageOut
  /** One fetched page: direct children in key order (leading startAt
    * duplicate already dropped unless preserved). */
  private final case class Page(data: Seq[(String, JsonNode)],
                                lastKey: String,
                                isLastPage: Boolean) extends PageOut
  /** Even MIN_IPP items exceed the payload limit — descend (C3). */
  private case object GoDeeper extends PageOut
  /** The path itself is a scalar leaf (possible when descending into a
    * shallow key whose value is not a container). */
  private final case class ScalarLeaf(json: String) extends PageOut

  /** One walker instance per task/thread (holds per-path IPP state; not
    * thread-safe by design — cheap to construct).
    *
    * @param sleep retry pacing seam: called with the backoff delay in
    *        ms before every shallow-listing RETRY (never on the first
    *        attempt — the happy path performs zero sleeps). Injectable
    *        so tests assert the schedule instead of waiting it out.
    * @param startIpp the reference's `root_start_ipp` knob
    *        (ExportCommand.php:45, seeded into the IPP map at
    *        BackupProcessor.php:44-46): the FIRST page size tried for a
    *        path with no IPP history yet, instead of min(1000, maxIpp).
    *        A user who knows the default is too big for their data
    *        seeds a smaller start and skips the halve-churn. One
    *        deliberate generalization: the reference seeds only the
    *        root path, but in the distributed export every work item
    *        is the root of its own walk, so the seed applies to every
    *        path's first fetch (adaptive per-path sizing takes over
    *        from there, exactly as in the reference).
    */
  final class Walker(client: RestClient, maxIpp: Int = DefaultMaxIpp,
                     sleep: Long => Unit = Thread.sleep,
                     startIpp: Option[Int] = None) {
    private val initIpp: Int =
      math.max(MinIpp, math.min(startIpp.getOrElse(DefaultMaxIpp), maxIpp))
    private val mapper = new ObjectMapper()
    /** path -> (current ipp, consecutive successes) — the reference's
      * `intelligent_IPP` map (BackupProcessor.php:151-155). */
    private val ipp = mutable.Map.empty[String, (Int, Int)]

    /** 401/403 are definitive — retrying or halving cannot fix a bad
      * token, and degrading into the go-deeper path buries the real
      * cause in "could not get shallow data" noise. */
    private def failIfDenied(resp: RestResponse, path: String): Unit =
      if (resp.status == 401 || resp.status == 403)
        throw new BackupFailure(
          s"permission denied for $path (HTTP ${resp.status}): ${resp.body}")

    /** The reference classifies errors by BODY shape because its PHP
      * lib discards the HTTP status (`{"error": ...}` — BackupProcessor
      * .php:174). Body shape alone misclassifies legitimate data whose
      * child KEY is "error" (a page of such a node answers
      * `{"error": <value>}` with 200), so here the status — which
      * Firebase does send (400 for size-capped reads) — is the signal,
      * one of the deliberate production-shaped divergences. */
    private def isErrorResponse(resp: RestResponse): Boolean =
      resp.status >= 400

    private def isEmptyPayload(n: JsonNode): Boolean =
      n == null || n.isNull || n.isMissingNode ||
        (n.isObject && n.size() == 0) || (n.isArray && n.size() == 0)

    /** BackupProcessor.php:150-199, one call = one successful page (or
      * a go-deeper verdict), shrinking inside the loop. */
    private def getPathsPaginated(path: String, startKey: Option[String],
                                  preserveLastKey: Boolean): PageOut = {
      var itemsPerPage = ipp.getOrElse(path, (initIpp, 0))._1
      var out: PageOut = null
      while (out == null) {
        val query = Map("orderBy" -> "\"$key\"",
          "limitToFirst" -> itemsPerPage.toString) ++
          startKey.map(k => "startAt" -> ("\"" + k + "\""))
        val resp = client.getR(path, query)
        failIfDenied(resp, path)
        val node = mapper.readTree(resp.body)
        val shrink = isErrorResponse(resp) || isEmptyPayload(node)
        if (!shrink && !node.isObject && !node.isArray) {
          out = ScalarLeaf(mapper.writeValueAsString(node))
        } else if (shrink) {
          if (itemsPerPage == MinIpp) {
            ipp(path) = (MinIpp, 0)
            out = GoDeeper
          } else {
            itemsPerPage =
              math.max(MinIpp, math.ceil(itemsPerPage / 2.0).toInt)
            // store the halved size AND reset the success streak —
            // the reference counts its grow-after-5 successes FROM the
            // failure (BackupProcessor.php:181-188); without the reset
            // one post-failure success inherits the old streak and
            // immediately re-grows toward the size that just failed
            ipp(path) = (itemsPerPage, 0)
          }
        } else {
          // success: per-path IPP bookkeeping (:180-188)
          val (_, succ) = ipp.getOrElse(path, (itemsPerPage, 0))
          if (succ + 1 > GrowAfter)
            ipp(path) = (math.min(maxIpp,
              math.ceil(itemsPerPage * 1.2).toInt), 0)
          else ipp(path) = (itemsPerPage, succ + 1)
          // Firebase serializes dense integer-keyed nodes as JSON
          // ARRAYS (element index = key), padding skipped leading
          // indices with nulls on filtered reads — an object-only
          // fields() here returned an empty iterator and crashed on
          // .last. Arrays translate to index-keyed fields; the normal
          // startAt-duplicate drop and isLast logic then apply
          // unchanged (the first non-null element IS the inclusive
          // startAt key).
          val fields: Vector[(String, JsonNode)] =
            if (node.isArray)
              node.elements().asScala.zipWithIndex.collect {
                case (v, i) if !v.isNull => (i.toString, v)
              }.toVector
            else node.fields().asScala
              .map(e => e.getKey -> e.getValue).toVector
          if (fields.isEmpty) {
            // an all-null padded array page past the end: final page
            out = Page(Vector.empty, startKey.getOrElse(""), isLastPage = true)
          } else {
            val lastKey = fields.last._1
            val isLast = fields.size < itemsPerPage ||
              (fields.size == 1 && startKey.contains(lastKey))
            val data = if (startKey.isDefined && !preserveLastKey)
              fields.drop(1) else fields
            out = Page(data, lastKey, isLast)
          }
        }
      }
      out
    }

    /** `shallow=true` key listing with the reference's retry law
      * (BackupProcessor.php:80-87): <=10 attempts, then BackupFailure.
      * Retries pace out exponentially via [[Backoff]] — the reference
      * retries back-to-back, which against a rate-limited live
      * database burns all 10 attempts in milliseconds; a transient
      * quota window outlives our whole schedule. Array nodes list as
      * their non-null element indices in NUMERIC order — the same
      * cursor order the server uses for integer keys, which the
      * go-deeper resume (`shallow.indexOf(lastKey) + 1`) relies on. */
    def shallowKeys(path: String): Vector[String] = {
      var tries = 0
      while (tries < ShallowRetries) {
        if (tries > 0) sleep(Backoff.delayMs(tries - 1))
        val resp = client.getR(path, Map("shallow" -> "true"))
        failIfDenied(resp, path)
        val node = mapper.readTree(resp.body)
        tries += 1
        if (!isErrorResponse(resp)) {
          if (node != null && node.isObject && node.size() > 0)
            // sorted in the SERVER's cursor order (integer keys first,
            // numerically) — the go-deeper resume depends on it
            return node.fieldNames().asScala.toVector.sorted(KeyOrdering)
          if (node != null && node.isArray && node.size() > 0)
            return node.elements().asScala.zipWithIndex.collect {
              case (v, i) if !v.isNull => i.toString
            }.toVector
          // a 200 null/{}/[] is DEFINITIVE: the path is empty (an
          // empty database, or a subtree deleted since planning) —
          // retrying a correct answer ~33s just to abort the whole
          // export would turn "nothing here" into a failure
          if (isEmptyPayload(node)) return Vector.empty
        }
      }
      throw new BackupFailure(
        s"Could not get database shallow data for $path " +
          s"($ShallowRetries attempts)")
    }

    private def childPath(parent: String, key: String): String =
      TreeCodec.childPath(parent, key)

    private def emitValue(path: String, key: String, v: JsonNode,
                          emit: TreeCodec.Edge => Unit): Unit =
      if (v.isObject || v.isArray)
        TreeCodec.flatten(mapper.writeValueAsString(v),
          childPath(path, key)).foreach(emit)
      else emit(TreeCodec.Edge(path, key, mapper.writeValueAsString(v)))

    /** The reference's `getData` loop (BackupProcessor.php:71-136):
      * paginate `path`, recursing into children too large to page. */
    def fetchSubtree(path: String, emit: TreeCodec.Edge => Unit): Unit = {
      var firstKey: Option[String] = None
      var preserveLastKey = false
      var isLastPage = false
      var shallowCache: Vector[String] = null
      while (!isLastPage) {
        getPathsPaginated(path, firstKey, preserveLastKey) match {
          case ScalarLeaf(json) =>
            // the path itself is a leaf: it IS one edge at its parent
            val (parent, key) =
              if (path == "/") ("/", "")
              else {
                val i = path.lastIndexOf('/')
                (if (i == 0) "/" else path.substring(0, i),
                  path.substring(i + 1))
              }
            emit(TreeCodec.Edge(parent, key, json))
            isLastPage = true
          case Page(data, lastKey, last) =>
            data.foreach { case (k, v) => emitValue(path, k, v, emit) }
            firstKey = Some(lastKey)
            isLastPage = last
            preserveLastKey = false
          case GoDeeper =>
            if (shallowCache == null) shallowCache = shallowKeys(path)
            val shallow = shallowCache
            if (shallow.isEmpty) isLastPage = true
            else {
              // BackupProcessor.php:96-121: pick the ONE child to
              // descend into, then resume pagination at the next key
              val nextIdx: Option[Int] = firstKey match {
                case Some(fk) =>
                  val sub = if (preserveLastKey) -1 else 0
                  val cand = shallow.indexOf(fk) + 1 + sub
                  if (cand >= 0 && cand < shallow.size) Some(cand)
                  else { isLastPage = true; None }
                case None => Some(0)
              }
              nextIdx.foreach { i =>
                fetchSubtree(childPath(path, shallow(i)), emit)
                if (i + 1 < shallow.size) {
                  firstKey = Some(shallow(i + 1))
                  preserveLastKey = true
                } else isLastPage = true
              }
            }
        }
      }
    }

    /** Materialized convenience (tests, per-task use). */
    def fetchTree(path: String): Seq[TreeCodec.Edge] = {
      val buf = Vector.newBuilder[TreeCodec.Edge]
      fetchSubtree(path, buf += _)
      buf.result()
    }

    /** [[fetchTree]] that STOPS WALKING once `limit` edges are
      * collected — the reference's `limitToFirst` effect
      * (BackupProcessor.php:165) lifted to the whole-subtree walk:
      * pages past the limit are never requested, not fetched-then-
      * dropped. Mid-walk pagination state is simply abandoned (the
      * walker is per-task and the caller discards it). */
    def fetchTreeLimited(path: String, limit: Int): Seq[TreeCodec.Edge] = {
      if (limit <= 0) return Vector.empty
      val buf = Vector.newBuilder[TreeCodec.Edge]
      var n = 0
      try fetchSubtree(path, { e =>
        buf += e; n += 1
        if (n >= limit) throw new LiveExport.StopWalk
      })
      catch { case _: LiveExport.StopWalk => () }
      buf.result()
    }

    /** Planning probe — the go-deeper verdict applied at PLAN time
      * instead of mid-walk. One page fetch of `path`: if even the
      * floor-sized page is too large (the exact condition the serial
      * walker answers with recursion), the subtree is too fat to be
      * one task's unit of work — return its shallow children as
      * independent work items. Anything else (a normal page, a scalar
      * leaf) means the path is walkable whole: return empty. The probe
      * page is discarded — the walk stage re-fetches it, trading one
      * duplicate page per work item for a dataflow where edge data
      * never routes through the driver. */
    def probeSplit(path: String): Seq[String] =
      getPathsPaginated(path, None, preserveLastKey = false) match {
        case GoDeeper => shallowKeys(path).map(childPath(path, _))
        case _ => Nil
      }
  }

  /** Work-list planner for the distributed export. Round 0 is the
    * root's shallow children; each round probes every pending path IN
    * PARALLEL ([[Walker.probeSplit]]: one floor-page fetch) and splits
    * the too-fat ones into their children for the next round. Only
    * PATHS flow through the driver — never edge data — and the number
    * of rounds is bounded by the depth of the fat spine, not the tree.
    *
    * This is what makes the export's parallelism granularity survive a
    * skewed database: the earlier planner assigned whole top-level
    * subtrees to tasks, so one fat subtree (the exact case go-deeper
    * exists for, BackupProcessor.php:96-127) was walked serially by
    * ONE task while the rest of the cluster idled. Now that subtree
    * splits into its children and drains cluster-wide. */
  def plan(spark: SparkSession, clientFactory: () => RestClient,
           root: String = "/", maxIpp: Int = DefaultMaxIpp,
           startIpp: Option[Int] = None): Seq[String] = {
    import spark.implicits._
    def childPath(parent: String, key: String): String =
      TreeCodec.childPath(parent, key)
    var pending: Seq[String] = new Walker(clientFactory(), maxIpp)
      .shallowKeys(root).map(childPath(root, _))
    val work = Seq.newBuilder[String]
    while (pending.nonEmpty) {
      val par = math.max(1, math.min(pending.size,
        spark.sparkContext.defaultParallelism))
      val verdicts = spark.createDataset(pending)
        .repartition(par)
        .mapPartitions { ps =>
          val w = new Walker(clientFactory(), maxIpp, startIpp = startIpp)
          ps.map(p => p -> w.probeSplit(p))
        }
        .collect()
      pending = verdicts.flatMap(_._2).toSeq
      work ++= verdicts.collect { case (p, splits) if splits.isEmpty => p }
    }
    work.result()
  }

  /** Distributed live export: [[plan]] builds the work list (splitting
    * fat subtrees so no single task owns one), then each executor task
    * walks its assigned subtrees with its own Walker — the
    * cluster-wide form of the reference's single-process tree walk.
    * The resulting frame feeds Export.writeBackup unchanged.
    *
    * @param clientFactory built once per partition ON THE EXECUTOR (the
    *        closure must be serializable; HttpRestClient instances are)
    */
  def export(spark: SparkSession, clientFactory: () => RestClient,
             root: String = "/", maxIpp: Int = DefaultMaxIpp,
             startIpp: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val items = plan(spark, clientFactory, root, maxIpp, startIpp)
    val par = math.max(1, math.min(items.size,
      spark.sparkContext.defaultParallelism))
    spark.createDataset(items)
      .repartition(par)
      .mapPartitions { ps =>
        val walker = new Walker(clientFactory(), maxIpp, startIpp = startIpp)
        ps.flatMap(p => walker.fetchTree(p))
      }
      .toDF("path", "key", "value_json")
  }

  /** Single URL convenience mirroring the reference CLI surface
    * (`frdbackup export -u <url> -k <token>`). */
  def export(spark: SparkSession, baseUrl: String,
             authToken: Option[String], maxIpp: Int,
             startIpp: Option[Int]): DataFrame =
    export(spark, () => new HttpRestClient(baseUrl, authToken),
      "/", maxIpp, startIpp)
}

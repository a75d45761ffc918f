package graft.operators

/** One index-maintenance pass's decision plus the evidence it was made
  * on — the return of [[Dedup.maintainShingleIndex]] and
  * [[Similarity.maintainIvfIndex]], designed to be logged verbatim by
  * an ingest operator ("why did tonight's maintenance rewrite 2 TB?").
  *
  * `action` is what the policy chose ("none" | "compact" | "refresh");
  * `ran` is whether it executed (false under `dryRun`, or when the
  * underlying op reported an idempotent no-op). The stats fields hold
  * what the decision read: the manifest's applied/uncompacted batch
  * counts, the stored vs size-targeted bucket spec, and — IVF only —
  * the hot-cell occupancy pair ([[Similarity.ivfOccupancy]]); -1 marks
  * a stat the pass did not need to measure. */
final case class MaintenanceReport(index: String, action: String,
                                   ran: Boolean, appliedBatches: Int,
                                   uncompactedBatches: Int,
                                   storedBuckets: Int, targetBuckets: Int,
                                   hotCellMax: Long, hotCellMedian: Long) {
  def render: String =
    s"""{"index":"$index","action":"$action","ran":$ran,""" +
      s""""batches":$appliedBatches,"uncompacted":$uncompactedBatches,""" +
      s""""buckets":$storedBuckets,"targetBuckets":$targetBuckets,""" +
      s""""hotCellMax":$hotCellMax,"hotCellMedian":$hotCellMedian}"""
}

/** Measured default thresholds for condition-driven index maintenance.
  *
  * The cadence knobs the streams already carry (`compactEvery`,
  * `refreshEvery`) are BLIND: a fixed refresh cadence pays the
  * O(n x nlist) reassignment even when every cell is healthy, and
  * misses drift that arrives faster than the cadence. These
  * thresholds instead trigger each op exactly when its measured
  * symptom appears:
  *
  *  - `DefaultCompactAfter` = 8: at N=8 appends the probe-side
  *    file-layout tax measured 1.20x (shingle) / ~1.0x (IVF) and at
  *    N=32 it reached 1.32x / 1.18x, while one compaction costs ~0.7x
  *    a base build and repays it (the r15 AppendSmoke curve) — so the
  *    fold fires just before the tax becomes measurable.
  *  - `DefaultHotCellRatio` = 16: healthy (fresh or refreshed) IVF
  *    indexes sit at 4.3-4.9x median cell occupancy (DriftGate at
  *    256k and 1,024k vectors), while frozen centroids under a 25%
  *    concentrated drift collapse to 92-192x; 16 separates the two
  *    regimes with >3x margin on both sides.
  */
object Maintenance {
  val DefaultCompactAfter = 8
  val DefaultHotCellRatio = 16.0
}

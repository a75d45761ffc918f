package graft.operators

import graft.{GraftQuery, Tables}
import graft.pipeline.Export
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental backup: snapshot diff as a first-class engine operator.
  *
  * The reference can only re-export the whole database each run
  * (BackupProcessor.php restarts from `$root_path = '/'` at :43 every
  * time; no previous-snapshot input exists anywhere in its surface). At
  * 100 TB a full re-export per backup window is the difference between
  * a feasible pipeline and an impossible one, so the engine adds the
  * two primitives the reference is missing:
  *
  *   - [[Export.diffBackups]]: two backup frames -> the changed rows
  *     (`added`/`removed`/`changed` + old/new values), digests-first so
  *     the unchanged 99% is never shuffled;
  *   - [[graft.pipeline.Restore.restoreDiff]]: apply that diff via the
  *     adaptive PATCH drain (null-PATCH = Firebase delete).
  *
  * The query below derives two deterministic snapshots from `orders`
  * (the brief's rule: use the provided tables) and diffs them; the
  * DuckDB twin formulates the same diff as a FULL JOIN, so the oracle
  * independently checks classification, value recovery, and the
  * unchanged-row drop.
  */
object Incremental {

  /** Snapshot pair: `prev` drops multiples of 97 (they become `added`),
    * `cur` drops multiples of 89 (`removed`) and bumps the value on
    * multiples of 7 (`changed`); everything else is identical and must
    * NOT appear in the diff. */
  private[graft] def prevSnap(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 97 =!= 0)
      .select(
        concat(lit("/orders/"), (col("o_orderkey") % 50).cast("string"))
          .as("path"),
        col("o_orderkey").cast("string").as("key"),
        col("o_custkey").cast("string").as("value_json"))

  private[graft] def curSnap(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 89 =!= 0)
      .select(
        concat(lit("/orders/"), (col("o_orderkey") % 50).cast("string"))
          .as("path"),
        col("o_orderkey").cast("string").as("key"),
        (col("o_custkey") +
          when(col("o_orderkey") % 7 === 0, 1).otherwise(0))
          .cast("string").as("value_json"))

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_backup_diff",
      "Incremental-backup snapshot diff: full-outer digest compare of " +
        "two backup frames, classifying added/removed/changed and " +
        "recovering both values — the primitive the reference's " +
        "full-re-export loop (BackupProcessor.php:43) lacks.",
      (s, d) => {
        val ord = Tables.orders(s, d)
        Export.diffBackups(prevSnap(ord), curSnap(ord))
          .select(col("path"), col("key"), col("change"),
            coalesce(col("old_value"), lit("")).as("old_value"),
            coalesce(col("new_value"), lit("")).as("new_value"))
          .orderBy("path", "key", "change", "old_value", "new_value")
      },
      Some("""
        |WITH prev AS (
        |  SELECT '/orders/' || CAST(o_orderkey % 50 AS VARCHAR) AS path,
        |         CAST(o_orderkey AS VARCHAR) AS "key",
        |         CAST(o_custkey AS VARCHAR) AS value_json
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |), cur AS (
        |  SELECT '/orders/' || CAST(o_orderkey % 50 AS VARCHAR) AS path,
        |         CAST(o_orderkey AS VARCHAR) AS "key",
        |         CAST(o_custkey + CASE WHEN o_orderkey % 7 = 0 THEN 1
        |                               ELSE 0 END AS VARCHAR) AS value_json
        |  FROM orders WHERE o_orderkey % 89 <> 0
        |)
        |SELECT COALESCE(p.path, c.path) AS path,
        |       COALESCE(p."key", c."key") AS "key",
        |       CASE WHEN p."key" IS NULL THEN 'added'
        |            WHEN c."key" IS NULL THEN 'removed'
        |            ELSE 'changed' END AS change,
        |       COALESCE(p.value_json, '') AS old_value,
        |       COALESCE(c.value_json, '') AS new_value
        |FROM prev p FULL JOIN cur c
        |  ON p.path = c.path AND p."key" = c."key"
        |WHERE p."key" IS NULL OR c."key" IS NULL
        |   OR p.value_json <> c.value_json
        |ORDER BY path, "key", change, old_value, new_value
        |""".stripMargin))
  )
}

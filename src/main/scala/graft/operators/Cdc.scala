package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog compaction: collapse a stream of keyed change rows
  * (re-crawls, upserts, CDC events) to the latest state per key — the
  * snapshot-maintenance primitive behind "keep the newest crawl of every
  * URL" and the at-rest form of the JDBC MERGE upsert in [[graft.sinks]].
  *
  * Latest-wins is ONE aggregate: max over a struct whose leading fields
  * are the version columns — lexicographic struct comparison makes the
  * highest (version…) row win, with any remaining payload fields as a
  * deterministic final tie-break. Callers pass version columns that
  * uniquely order each key's changes (a sequence number, or (ts, event_id))
  * and ties never reach the payload.
  *
  * Scale shape: a hash aggregate with map-side partial combine — each
  * partition contributes AT MOST ONE row per key to the exchange, so the
  * shuffle carries keys, not the changelog (a day of re-crawls collapses
  * before it moves). The `row_number() = 1` window form would sort every
  * key's full history; it survives only as the oracle. Hot keys (one URL
  * re-crawled millions of times) partial-combine away map-side — the skew
  * case this formulation is immune to by construction.
  */
object Cdc {

  /** Latest row per key by lexicographic (versionCols ++ payload) order.
    * Output columns: keyCols, then versionCols, then the remaining columns
    * in input order. */
  def latestPerKey(changes: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    val others = changes.columns.toSeq.filterNot((keyCols ++ versionCols).contains)
    val ordered = versionCols ++ others
    changes.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__r"))
      .select(keyCols.map(col) ++ ordered.map(c => col(s"__r.$c")): _*)
  }

  /** Apply a changelog with delete semantics: keep each key's latest row,
    * then drop keys whose latest operation is `deleteOp` — a key deleted
    * and later re-inserted survives with the newer row. */
  def applyChangelog(changes: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], opCol: String,
      deleteOp: String = "d"): DataFrame =
    latestPerKey(changes, keyCols, versionCols)
      .filter(col(opCol) =!= deleteOp)
}

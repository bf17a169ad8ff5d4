package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream–stream interval join: match each left event with the
  * right-stream events of the same key whose event time falls in
  * [left + lowerSec, left + upperSec] — the enrichment join a live spot
  * pipeline needs ("attach the receiver heartbeat/status seen within N
  * minutes of the spot") that a static-table join can't express when BOTH
  * sides flow.
  *
  * The declarative form IS the production form: Spark's symmetric hash
  * join keeps per-key state on both sides and the two watermarks + the
  * time-bound condition let the engine evict state once no future match is
  * possible (state size ∝ key-rate × window, NOT stream length — the
  * property StreamJoinSpec pins by matching the batch join over the closed
  * input). Both inputs need an event-time timestamp column; `watermarkSec`
  * bounds the disorder either side may show, and rows later than that are
  * dropped by contract (the q07/T7 late-data posture).
  *
  * Output: all left columns (aliased `l_*` keys preserved) joined to the
  * right's (`r_*`), inner semantics. */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      lowerSec: Long, upperSec: Long, watermarkSec: Long): DataFrame = {
    require(lowerSec <= upperSec, "intervalJoin needs lowerSec <= upperSec")
    require(watermarkSec >= 0, "intervalJoin needs a non-negative watermark")
    val l = left.withWatermark(leftTimeCol, s"$watermarkSec seconds").alias("l")
    val r = right.withWatermark(rightTimeCol, s"$watermarkSec seconds").alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTimeCol") >= col(s"l.$leftTimeCol") + expr(s"interval $lowerSec seconds") &&
        col(s"r.$rightTimeCol") <= col(s"l.$leftTimeCol") + expr(s"interval $upperSec seconds"))
  }
}

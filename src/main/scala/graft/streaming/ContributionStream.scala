package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One full edit record on the stream (props/value carry tags/geometry). */
case class ContribEdit(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, props: String, value: Double)

/** Emitted contribution row; an upserting sink keys on
  * (osm_id, osm_version) — the previous latest row is RE-EMITTED with its
  * valid_to closed when a newer version arrives, exactly the reference
  * updater's re-emit contract (ContributionUpdater.java:69-101).
  */
case class ContribUpdate(osm_id: Long, osm_version: Int, valid_from: Long,
    valid_to: Option[Long], contrib_type: String, status: String)

/** O(1) per-entity state: everything needed to continue the version chain
  * without holding history — the streaming equivalent of the updater's
  * "before" element (UpdateStore row), held in Spark's managed,
  * checkpointed, entity-partitioned state instead of RocksDB.
  */
case class ChainState(version: Int, ts_us: Long, event_id: Long,
    props: String, value: Double, visible: Boolean, ctype: String)

/** Structured-Streaming contribution updater: the composed streaming path
  * of `Replication.updateContributions` — each incoming edit closes the
  * previous latest row (re-emit with valid_to + history status) and emits
  * the new classified row.
  */
object ContributionStream {

  def updateChain(id: Long, edits: Iterator[ContribEdit],
      state: GroupState[ChainState]): Iterator[ContribUpdate] = {
    val out = scala.collection.mutable.ArrayBuffer[ContribUpdate]()
    var st = state.getOption.orNull
    // within-batch ordering mirrors the batch chain's (ts, event_id) sort
    edits.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val stale = st != null &&
        (e.ts_us < st.ts_us || (e.ts_us == st.ts_us && e.event_id <= st.event_id))
      if (!stale) {
        val visible = e.event_type != "error"
        val contribType =
          if (!visible) "DELETION"
          else if (st == null || !st.visible) "CREATION"
          else Seq(
            if (e.props != st.props) Some("TAG") else None,
            if (e.value != st.value) Some("GEOMETRY") else None)
            .flatten.mkString("_")
        if (st != null) {
          // re-emit the closed previous row: it stops being `latest`
          out += ContribUpdate(id, st.version, st.ts_us, Some(e.ts_us),
            st.ctype, if (st.visible) "history" else "deleted")
        }
        val version = if (st == null) 1 else st.version + 1
        out += ContribUpdate(id, version, e.ts_us, None, contribType,
          if (visible) "latest" else "deleted")
        st = ChainState(version, e.ts_us, e.event_id, e.props, e.value, visible, contribType)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def apply(edits: Dataset[ContribEdit]): Dataset[ContribUpdate] = {
    import edits.sparkSession.implicits._
    edits.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateChain)
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Graph

/** Round-13 additions (VERDICT r12): the stream-stream LEFT OUTER
  * interval join under the oracle gate (k28, item 1 — the last
  * user-visible streaming sub-surface without a green CORRECTNESS row:
  * null-padded unmatched-left emission at watermark eviction, the
  * attribution/enrichment shape), its FULL OUTER twin (k30 — closes
  * the outer surface; the unmatched-right eviction comparator is
  * STRICT where the left's is inclusive, pinned by Round13Spec),
  * UPDATE-mode streaming aggregation (k29, item 2 — the live-dashboard
  * shape: a key's row re-emitted each batch it changes, certified on
  * the k23 quartile grid), and the changed-registers-only reach
  * propagation (g22, item 4 — HyperBall's "systolic" lever: late hops
  * join only nodes whose register row changed, bit-identical output).
  * Same oracle discipline as [[Extras6]]/[[Extras7]]/[[Extras8]].
  */
object Extras9 {

  private val dec2 = DecimalType(18, 2)

  /** k29 core: the k23 quartile slices (IN ORDER, shared artifact —
    * [[Extras7.k23Slices]]) streamed one file per micro-batch into a
    * plain `groupBy(user_id).agg(count, exact DECIMAL(18,2) sum)` in
    * UPDATE output mode: each batch re-emits exactly the keys touched by
    * that batch's input rows, carrying their post-batch cumulative
    * aggregate — the live-dashboard emission contract, vs append mode's
    * emit-once-final. The file sink can't take update mode (it is
    * append-only), so the run lands through foreachBatch into
    * batchId-keyed parquet directories in overwrite mode — the k22
    * idempotence discipline, which doubles as the batch-id column the
    * oracle needs (mtime-ordered files under maxFilesPerTrigger=1 make
    * batch id == quartile index). In-order arrival means the oracle is
    * the k23 running window with batch_id = the quartile itself.
    *
    * State: one (count, decimal sum) row per user — bounded per key; at
    * 100 TB the KEY dimension is bounded the usual way (window the
    * aggregate and watermark it, or TTL the state) — this query pins the
    * emission semantics, which are orthogonal to that choice.
    *
    * Returns (result, dataBatches, updateBatches) for the spec gates —
    * updateBatches counts batches that wrote at least one row.
    */
  private[graft] def updateAggReplay(s: SparkSession, dir: String)
      : (DataFrame, Long, Long) = {
    val out = Files.createTempDirectory("graft-k29-out")
    val cp = Files.createTempDirectory("graft-k29-cp")
    try {
      val src = Extras7.k23Slices(s, dir)
      val glob = s"$src/e*.parquet"
      val stream = s.readStream.schema(s.read.parquet(glob).schema)
        .option("maxFilesPerTrigger", 1).parquet(glob)
      val agg = stream.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_cum"),
          sum(col("value").cast(dec2)).as("sum_dec"))
      // scale-adaptive state partitioning — see
      // StreamOps.adaptiveStatePartitions
      val q = graft.streaming.StreamOps.withStatePartitions(s,
          graft.streaming.StreamOps.pathBytes(src)) {
        agg.writeStream.outputMode("update")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // no '=' in the dir name: partition inference would otherwise
            // duplicate the explicit batch_id column on read-back
            batch.select(col("user_id"), lit(batchId).as("batch_id"),
                col("n_cum"), col("sum_dec").cast("double").as("sum_cum"))
              .write.mode("overwrite").parquet(s"$out/b$batchId")
          }
          .option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      // recentProgress is safe HERE (unlike the rocksdb-engagement signal
      // ADVICE r12 moved to lastProgress-first): the ring buffer holds
      // spark.sql.streaming.numRecentProgressUpdates entries (default
      // 100), far above this replay's 4-5 batches, and the count is read
      // strictly after awaitTermination() so no event is still in flight.
      val dataBatches = q.recentProgress.count(_.numInputRows > 0).toLong
      import scala.jdk.CollectionConverters._
      val updateBatches = scala.util.Using.resource(Files.list(out)) { st =>
        st.iterator().asScala.count { d =>
          scala.util.Using.resource(Files.list(d)) { fs =>
            fs.iterator().asScala
              .exists(_.getFileName.toString.endsWith(".parquet"))
          }
        }
      }.toLong
      val res = s.read.parquet(s"$out/b*")
        .orderBy(col("user_id"), col("batch_id")).localCheckpoint()
      (res, dataBatches, updateBatches)
    } finally {
      Shared.deleteTree(out); Shared.deleteTree(cp)
    }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stream-stream LEFT OUTER interval join (VERDICT r12 item 1): the
    // k20 replay verbatim but joinType = left_outer — inner matches emit
    // immediately (and must equal k20's rows bit-for-bit, Round13Spec
    // asserts the subset), while a view with no purchase inside
    // [view_ts, view_ts + 48h) emits ONE null-padded row at state
    // eviction, i.e. once the watermark passes view_ts + 48h. Views
    // whose window never closes below the final watermark emit nothing
    // (still live state when the replay ends). The DuckDB oracle extends
    // the k20 per-batch cutoff model with exactly that rule.
    "k28_interval_join_outer" -> { (s, dir) =>
      Extras6.intervalJoinReplay(s, dir, joinType = "left_outer")._1 },

    // Update-mode streaming aggregation (VERDICT r12 item 2): per-user
    // cumulative (count, exact value sum) re-emitted every batch the
    // user appears in.
    "k29_update_mode_agg" -> { (s, dir) => updateAggReplay(s, dir)._1 },

    // Stream-stream LEFT SEMI interval join — the dedup-probe shape
    // ("which views converted?"): a left row is emitted ONCE, at its
    // first surviving match, with no right columns and no duplication
    // however many purchases land in the window. The oracle is an
    // EXISTS over k20's surviving-pair model. Output column note: the
    // semi join emits only left-side columns, so the replay's shared
    // 5-column select is narrowed in the def below.
    "k31_interval_join_semi" -> { (s, dir) =>
      val (res, _, _, _) =
        Extras6.intervalJoinReplay(s, dir, joinType = "left_semi")
      res },

    // Stream-stream FULL OUTER interval join — closes the outer-join
    // surface k28 opened: unmatched LEFT rows null-pad under k28's rule
    // (window closed at-or-below the final watermark, INCLUSIVE), while
    // unmatched RIGHT rows null-pad under the right side's own eviction
    // rule, which is STRICT: a purchase evicts only once the watermark
    // passes STRICTLY above buy_ts (survival is buy_ts >= W — from
    // buy_ts >= view_ts, a right row AT the watermark can still match a
    // future left row arriving exactly at the watermark). Round13Spec
    // pins the asymmetry on exact-ms ties for both sides in one probe.
    "k30_interval_join_full" -> { (s, dir) =>
      Extras6.intervalJoinReplay(s, dir, joinType = "full_outer")._1 },

    // Changed-registers-only reach propagation (VERDICT r12 item 4):
    // g21's INT-packed register grid with the HyperBall systolic
    // optimization — hop d's edge join takes only nodes whose register
    // row changed at hop d−1 (min is idempotent: an unchanged neighbor
    // was already merged into every out-neighbor the hop after it last
    // changed, so skipping it loses nothing). Register values are
    // BIT-IDENTICAL to g21's, so this certifies against g21's oracle
    // verbatim; Round13Spec carries the shrinking-changed-set and
    // hop-input accounting the CORRECTNESS row can't show.
    "g22_reach_sketch_delta" -> { (s, dir) =>
      val e = Shared.orderGraphEdges(s, dir)
      val seeds = e.select(col("src").as("seed")).distinct()
        .filter(col("seed") < 1000000 && col("seed") % 100 === 0)
      Graph.reachSketch(e, seeds, k = 3, m = 64, edgesDeduped = true,
        intRegisters = true, deltaOnly = true)
    })

  /** The unmatched-LEFT null-pad rule shared by k28/k30 (interpolated on
    * top of [[Extras6.k20CutoffCtes]] + [[Extras6.k20WfinCte]]): a left
    * row that (a) passed its own-batch late filter (so it entered
    * state), (b) has NO surviving inner pair (the engine's per-row
    * matched flag is set only when a join output was actually produced),
    * and (c) was EVICTED below the final watermark — view_ts + 48h <=
    * wf, the INCLUSIVE comparator Round13Spec pins on an exact-ms tie;
    * the AvailableNow no-data batch flushes the eviction — emits exactly
    * one null-padded row. Left rows still live at termination emit
    * nothing.
    */
  private[graft] val unmatchedLeftCte: String = """
      unmatched_l AS (SELECT l.user_id, l.view_id, NULL AS buy_id,
          l.view_ts, NULL AS buy_ts
        FROM l JOIN wmk wb ON wb.fidx = l.fidx, wfin
        WHERE (wb.wprev IS NULL OR l.view_ts >= wb.wprev)
          AND l.view_ts + INTERVAL 48 HOUR <= wfin.wf
          AND NOT EXISTS (SELECT 1 FROM surv
                          WHERE surv.view_id = l.view_id))"""

  val oracles: Map[String, String] = Map(

    // The shared k20 cutoff model (Extras6.k20CutoffCtes — one copy,
    // ADVICE r13) extended with the outer rule (unmatchedLeftCte).
    "k28_interval_join_outer" -> s"""
      WITH ${Extras6.k20CutoffCtes},
      ${Extras6.k20WfinCte},
      $unmatchedLeftCte
      SELECT user_id, view_id, buy_id, view_ts, buy_ts FROM surv
      UNION ALL SELECT * FROM unmatched_l
      ORDER BY view_id, buy_id NULLS FIRST""",

    // A left row is semi-emitted iff it has at least one SURVIVING pair
    // under the shared cutoff model — DISTINCT over surv's left columns,
    // each left row at most once.
    "k31_interval_join_semi" -> s"""
      WITH ${Extras6.k20CutoffCtes}
      SELECT DISTINCT user_id, view_id, view_ts FROM surv
      ORDER BY view_id""",

    // k28's model plus the symmetric unmatched-RIGHT rule: a purchase
    // that (a) passed its own-batch late filter, (b) has no surviving
    // inner pair, and (c) was evicted below the final watermark — which
    // for the right side is STRICT (buy_ts < wf; survival buy_ts >= W,
    // the k20 model's condition 3 comparator, pinned by Round13Spec's
    // tie probe) — emits one row with null view columns. The inner and
    // unmatched-left parts are k28's shared CTEs.
    "k30_interval_join_full" -> s"""
      WITH ${Extras6.k20CutoffCtes},
      ${Extras6.k20WfinCte},
      $unmatchedLeftCte,
      unmatched_r AS (SELECT NULL AS user_id, NULL AS view_id, r.buy_id,
          NULL AS view_ts, r.buy_ts
        FROM r JOIN wmk wb ON wb.fidx = r.fidx, wfin
        WHERE (wb.wprev IS NULL OR r.buy_ts >= wb.wprev)
          AND r.buy_ts < wfin.wf
          AND NOT EXISTS (SELECT 1 FROM surv
                          WHERE surv.buy_id = r.buy_id))
      SELECT user_id, view_id, buy_id, view_ts, buy_ts FROM surv
      UNION ALL SELECT * FROM unmatched_l
      UNION ALL SELECT * FROM unmatched_r
      ORDER BY view_id NULLS FIRST, buy_id NULLS FIRST""",

    // The quartile grain IS the micro-batch grain (in-order slicing) and
    // update mode emits a user's cumulative row exactly at the quartiles
    // the user appears in — so the oracle is the k23 running window with
    // batch_id = the quartile index itself (foreachBatch's batchId under
    // maxFilesPerTrigger=1 over mtime-ordered files).
    "k29_update_mode_agg" -> """
      WITH ev AS (SELECT event_id, ts, user_id, value FROM events),
      bnds AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        FROM ev),
      f AS (SELECT ev.*,
          ((epoch_us(ts) - mn) * 4) // (mx - mn + 1) AS fidx
        FROM ev, bnds),
      per AS (SELECT user_id, fidx, count(*) AS n,
          sum(CAST(value AS DECIMAL(18,2))) AS sv
        FROM f GROUP BY 1, 2)
      SELECT user_id, CAST(fidx AS BIGINT) AS batch_id,
        CAST(sum(n) OVER w AS BIGINT) AS n_cum,
        CAST(CAST(sum(sv) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS sum_cum
      FROM per
      WINDOW w AS (PARTITION BY user_id ORDER BY fidx
        ROWS UNBOUNDED PRECEDING)
      ORDER BY user_id, batch_id""",

    // Delta propagation is value-invariant by construction (min is
    // idempotent; every changed row is propagated the very next hop), so
    // g22 must land on the SAME bits as g21 — the oracle is shared by
    // reference, not copy, so the two can never drift.
    "g22_reach_sketch_delta" -> Extras7.oracles("g21_reach_sketch_int"))
}

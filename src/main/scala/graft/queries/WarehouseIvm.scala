package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ArtifactStore
import Tables.prep

/** Incremental maintenance for the WAREHOUSE-side aggregates — the
  * `t_diario_*` tables the reference's own pipeline serves to BI
  * (reference main.py:1500-1578 loads per-fecha; README.md:113 names
  * the BI consumers). The artifact matrix (README) already covers the
  * curation-side indexes; this module gives the relational summaries
  * the same discipline: at 100 TB x 365 days, "refresh the daily
  * summary" must cost one day's slice, not a corpus re-aggregation,
  * and a corrected re-delivery (the reference's DELETE+INSERT re-run,
  * main.py:1533-1537) must propagate to downstream aggregates by
  * retraction algebra, not by rebuild.
  *
  * Two lifecycle arms, each answering to a full-rebuild DuckDB oracle:
  *
  *   - q218 (append): the per-(fecha, event_type) daily rollup is a
  *     published [[graft.io.ArtifactStore]] artifact built WITHOUT
  *     today's fecha; today's load lands and the maintained rollup is
  *     base ∪ agg(today's partition) — the delta scan PARTITION-PRUNES
  *     the warehouse to exactly one fecha directory (spec-pinned),
  *     so the refresh cost is the new day's slice. Disjointness of
  *     the union is by construction: the grain's leading key IS the
  *     partition key.
  *
  *   - q219 (reload): per-user LIFETIME totals — a grain that crosses
  *     partitions, so slice-replace cannot maintain it. A corrected
  *     re-delivery of one fecha (the cleaning re-run drops that day's
  *     'error' rows) is applied as exact-merge group algebra over the
  *     abelian aggregates (count, sum):
  *     totals' = base ⊕ agg(+1 · new slice) ⊖ agg(−1 · old slice),
  *     users whose count reaches zero dropped. Both slice scans prune
  *     to the re-delivered fecha; the merge join is artifact-sized on
  *     one side and slice-sized on the other (AQE broadcasts the
  *     diff). Runs COLD: the base totals are read from the store by
  *     the fresh session ([[ColdRestart.fresh]]) that never built
  *     them — the daily-process hand-off, same contract as q204.
  *
  * Float discipline: the artifacts store RAW double sums; rounding to
  * 4dp happens once at the output boundary, after the merge — the
  * [[TextAnalysis]] q199 exact-merge convention (sum-order drift
  * ~1e-12 never crosses a 4dp boundary on this corpus).
  */
object WarehouseIvm {

  /** The day whose load/re-delivery the arms maintain — the same
    * fecha the warehouse family keys on (q189/q209). */
  private[graft] val Day = "2024-01-05"

  private[graft] val RollupArtifact = "daily_rollup_base"
  private[graft] val TotalsArtifact = "user_totals_base"

  private def whRead(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(Reference.fechaWarehouse(s, dir))

  /** NULL-SAFE day predicate (<=>): a malformed-ts row has NULL fecha,
    * and a null-unsafe `===` drops it from BOTH the base branch
    * (!isDay is NULL) and the slice — while the rebuild oracles
    * (GROUP BY CAST(ts AS DATE)) retain a NULL group. With <=>, NULL
    * fecha is deterministically NOT the day: it lands in the base
    * branch, exactly once, matching the oracle (advisor find, round
    * 11; latent on the harness corpus, which has no malformed ts). */
  private def isDay = col("fecha") <=> lit(Day).cast("date")

  /** Store root with both base artifacts, published exactly once per
    * (application, dir) from the warm session — [[graft.KeyedOnce]]
    * so racing first callers cannot both run the delete+publish
    * against the same deterministic path. */
  private val stores = new graft.KeyedOnce[(String, String), String]

  private[queries] def store(spark: SparkSession, dir: String): String =
    stores((spark.sparkContext.applicationId, dir)) {
      val root = Reference.appScopedScratch(spark, "graft_whstore", dir)
      val wh = whRead(spark, dir)
      // q218's base: yesterday's rollup — the warehouse BEFORE today's
      // fecha landed (one-time artifact build, like baseSigsTable)
      ArtifactStore.publish(grainAgg(wh.filter(!isDay)),
        root, RollupArtifact)
      // q219's base: lifetime totals over the warehouse AS DELIVERED —
      // including the bad rows the corrected re-run will retract
      ArtifactStore.publish(
        wh.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw")),
        root, TotalsArtifact)
      root
    }

  /** q218: the maintained daily rollup after today's load — stored
    * base ∪ one partition-pruned slice aggregate. Oracle = the full
    * re-aggregation over events. */
  def rollupIvmAppend(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val root = store(spark, dir)
    val base = ArtifactStore.read(spark, root, RollupArtifact)
    rollupOut(base.unionByName(grainAgg(whRead(spark, dir).filter(isDay))))
  }

  /** The rollup grain every arm shares — one row per (fecha,
    * event_type) with count + RAW sum: factored for the same
    * no-drift reason as [[rollupOut]] (reviewer find, r11: the grain
    * lived in three copies; a change missing one would silently
    * desynchronize the streamed arm from the batch arms). */
  private def grainAgg(rows: DataFrame): DataFrame =
    rows.groupBy(col("fecha"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw"))

  /** Shared output surface for every rollup arm (q218 batch append,
    * q220 streamed): the maintained grain rows, 4dp-rounded at the
    * boundary, ordered — all answer the same full re-aggregation
    * oracle, so the arms can never drift from each other. */
  private[queries] def rollupOut(df: DataFrame): DataFrame =
    df.select(col("fecha"), col("event_type"), col("n"),
      round(col("sum_raw"), 4).as("sum_value"))
      .orderBy("fecha", "event_type")

  private[graft] val StreamRollupArtifact = "daily_rollup_stream"

  /** The foreachBatch body of the STREAMED rollup arm (q220), exposed
    * for the replay/out-of-order specs: aggregate the arriving slice
    * ALONE (slice-bounded work, never corpus-sized), then FECHA-KEYED
    * REPLACE into the newest committed store version and publish the
    * result as the next manifest-committed version, retention riding
    * along. Replace, not add: a crash-REPLAYED batch recomputes
    * identical grain rows and replaces them with themselves where the
    * q199-style additive merge would double-count, and an out-of-order
    * fecha lands by key, not arrival position. Assumes fecha-atomic
    * arrivals — one report file per day, the reference's own cadence
    * (reference main.py:201-209, one process per day); a fecha split
    * across arrival files would need the additive-merge arm instead
    * (documented limit, spec-pinned for the cadence it serves). */
  private[graft] def applyRollupBatch(spark: SparkSession,
      batch: DataFrame, root: String): Unit = {
    val slice = grainAgg(batch.select(to_date(col("ts")).as("fecha"),
      col("event_type"), col("value")))
    val merged =
      ArtifactStore.latestVersion(spark, root, StreamRollupArtifact) match {
        case None => slice
        case Some(_) =>
          // NULL-SAFE fecha match (<=>): a null-unsafe anti-join would
          // never replace a stored NULL-fecha grain row, so a replayed
          // batch carrying one would duplicate it — breaking the
          // replay-no-op law exactly for the malformed-ts class
          // (reviewer find, r11; latent on the harness corpus)
          val sliceFechas = slice.select(col("fecha").as("sf")).distinct()
          ArtifactStore.read(spark, root, StreamRollupArtifact)
            .join(sliceFechas, col("fecha") <=> col("sf"), "left_anti")
            .unionByName(slice)
      }
    ArtifactStore.publish(merged, root, StreamRollupArtifact)
    ArtifactStore.prune(spark, root, StreamRollupArtifact, keep = 2)
  }

  private[graft] val AdditiveRollupArtifact = "daily_rollup_additive"

  /** The foreachBatch body of the ADDITIVE streamed rollup arm (q222)
    * — the general-cadence cell [[applyRollupBatch]]'s fecha-keyed
    * replace deliberately does not serve: a crawl-scale feed delivers
    * ONE fecha across MANY arrival files, so a batch carries a PARTIAL
    * slice and replacing by key would drop the fecha's earlier
    * contributions. Here the merge is ⊕ — the base grain rows and the
    * batch's slice aggregate re-grouped by (fecha, event_type), which
    * is commutative/associative (any batching, any order) and handles
    * the NULL-fecha grain for free (GROUP BY keeps NULL as a group,
    * matching the oracle). Replay protection therefore cannot be
    * content idempotence (adding twice double-counts); it is a
    * BATCH-ID HIGH-WATER MARK carried in the artifact: foreachBatch
    * re-delivers a crashed batch with its ORIGINAL id, ids are
    * strictly increasing within a checkpoint lineage, so
    * `batchId <= hwm` means this batch's contribution is already in
    * the serving version — skip, exactly-once by construction. The
    * 1-row hwm collect is provably bounded. All laws spec-pinned in
    * WarehouseIvmSpec, including a fecha split across three arrival
    * files equaling the one-batch build.
    *
    * LINEAGE GUARD (round-12 verdict, missing tail): batch ids are
    * strictly increasing only WITHIN one checkpoint lineage. A stream
    * restarted against a NEW checkpoint directory restarts ids at 0 —
    * against an artifact whose hwm is 5, the first six real batches
    * would be SILENTLY SKIPPED as replays. The artifact therefore
    * carries the lineage id (the checkpoint location) beside the hwm,
    * and a batch from a different lineage fails LOUDLY with the
    * remediation (resume the original checkpoint, or start a fresh
    * artifact root) — never a silent skip, and never a silent
    * double-merge of history the old lineage already delivered. */
  private[graft] def applyRollupBatchAdditive(spark: SparkSession,
      batch: DataFrame, batchId: Long, lineage: String,
      root: String): Unit = {
    val slice = grainAgg(batch.select(to_date(col("ts")).as("fecha"),
      col("event_type"), col("value")))
    val merged =
      ArtifactStore.latestVersion(spark, root, AdditiveRollupArtifact) match {
        case None => slice
        case Some(v) =>
          val (base, _) = ArtifactStore.readVersion(
            spark, root, AdditiveRollupArtifact, v)
          // 1-row collect (bounded): hwm and lineage are lit columns,
          // constant across the artifact
          val hl = base.agg(max(col("hwm")), max(col("lineage"))).head
          val hwm = if (hl.isNullAt(0)) -1L else hl.getLong(0)
          val storedLineage = if (hl.isNullAt(1)) null else hl.getString(1)
          if (storedLineage != null && storedLineage != lineage)
            throw new IllegalStateException(
              s"additive rollup at $root was built by checkpoint " +
                s"lineage '$storedLineage'; this batch comes from " +
                s"'$lineage'. Batch-id replay protection is only sound " +
                "within one lineage — resume the ORIGINAL " +
                "checkpointLocation, or start a fresh artifact root for " +
                "the new stream.")
          if (batchId <= hwm) return // replayed batch: already merged
          base.select(col("fecha"), col("event_type"), col("n"),
              col("sum_raw"))
            .unionByName(slice)
            .groupBy(col("fecha"), col("event_type"))
            .agg(sum(col("n")).as("n"), sum(col("sum_raw")).as("sum_raw"))
      }
    ArtifactStore.publish(merged.withColumn("hwm", lit(batchId))
        .withColumn("lineage", lit(lineage)),
      root, AdditiveRollupArtifact)
    ArtifactStore.prune(spark, root, AdditiveRollupArtifact, keep = 2)
  }

  // NULLS FIRST pinned on the oracle side: Spark's orderBy ASC is
  // NULLS FIRST while DuckDB's default is NULLS LAST, so a
  // malformed-ts row (NULL fecha) would hash-mismatch on ROW ORDER
  // despite identical content (advisor find, round 12; latent on the
  // harness corpus, which has no malformed ts).
  val rollupIvmAppendSql: String =
    """SELECT CAST(ts AS DATE) AS fecha, event_type, count(*) AS n,
      |  round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** The ⊕/⊖ merge both q219 surfaces share: apply a ±1-weighted
    * slice diff to stored per-user totals. Factored for the spec's
    * randomized law (chained corrections == one rebuild). */
  private[queries] def applyTotalsDiff(
      base: DataFrame, oldSlice: DataFrame,
      newSlice: DataFrame): DataFrame = {
    val weighted = newSlice
      .select(col("user_id"), lit(1L).as("w"), col("value"))
      .unionByName(oldSlice
        .select(col("user_id"), lit(-1L).as("w"), col("value")))
    val diff = weighted.groupBy(col("user_id"))
      .agg(sum(col("w")).as("dn"),
        sum(col("w") * col("value")).as("dsum"))
    base.join(diff, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n"), lit(0L)) +
          coalesce(col("dn"), lit(0L))).as("n_events"),
        round(coalesce(col("sum_raw"), lit(0.0)) +
          coalesce(col("dsum"), lit(0.0)), 4).as("sum_value"))
      .filter(col("n_events") > 0)
      .orderBy("user_id")
  }

  /** q219: lifetime per-user totals after a corrected re-delivery of
    * [[Day]] (the re-run drops that day's 'error' rows), maintained by
    * retraction algebra from the COLD-read base artifact. In
    * production the new slice is the re-delivered file itself; here it
    * derives from the old slice by the cleaning predicate, so both
    * sides scan one pruned partition. Oracle = full rebuild over the
    * post-reload warehouse state. */
  def userTotalsReload(spark: SparkSession, dir: String): DataFrame = {
    prep(spark)
    val root = store(spark, dir) // published warm, read cold below
    val s = ColdRestart.fresh(spark)
    val oldSlice = whRead(s, dir).filter(isDay)
    val newSlice = oldSlice.filter(col("event_type") =!= "error")
    applyTotalsDiff(
      ArtifactStore.read(s, root, TotalsArtifact), oldSlice, newSlice)
  }

  val userTotalsReloadSql: String =
    """WITH wh AS (
      |  SELECT user_id, value FROM events
      |  WHERE CAST(ts AS DATE) IS DISTINCT FROM DATE '2024-01-05'
      |  UNION ALL
      |  SELECT user_id, value FROM events
      |  WHERE CAST(ts AS DATE) = DATE '2024-01-05'
      |    AND event_type <> 'error')
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM wh GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_rollup_ivm_append" -> rollupIvmAppend,
    "q219_user_totals_reload" -> userTotalsReload
  )

  val oracle: Map[String, String] = Map(
    "q218_rollup_ivm_append" -> rollupIvmAppendSql,
    "q219_user_totals_reload" -> userTotalsReloadSql
  )
}

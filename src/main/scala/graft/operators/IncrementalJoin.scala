package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance (EXTENSION, SURVEY.md §2.K) — the
  * join half of the materialized-view discipline that [[IncrementalAgg]]
  * gives aggregates: keep V = A ⋈ B materialized and fold per-side CDC
  * changesets into it WITHOUT re-joining the base tables. The reference
  * refreshes derived tables by re-running the whole job
  * (`/root/reference/etl_manager/etl.py` re-executes the full query); at
  * 100 TB a fact⋈fact view is exactly the thing you can never afford to
  * recompute, and the delta-join decomposition (Blakeley, Larson &
  * Tompa, "Efficiently Updating Materialized Views", SIGMOD 1986) is the
  * standard answer.
  *
  * Maintenance identity (inner equi-join, update = delete(old) +
  * insert(new), row keys unique per side):
  *
  *   V' =   V  ⟬ a_key ∉ touched(A) ⟭ ⟬ b_key ∉ touched(B) ⟭   (retained)
  *        ∪ ΔA_ins ⋈ B'                                         (new-A pairs)
  *        ∪ (A' − ΔA_ins) ⋈ ΔB_ins                               (new-B pairs)
  *
  * where touched(X) = delete keys ∪ insert keys of side X. The third
  * term excludes ΔA_ins rows because ΔA_ins ⋈ B' already contains every
  * (new-A, new-B) pair — the classic double-count trap the spec plants.
  *
  * Scale shape (the reason this is not just `A'.join(B')`):
  *  - the retained term is two LEFT-ANTI joins of the VIEW against
  *    key-only changeset frames — state-sized builds that broadcast in
  *    the typical CDC case, and exchange-free when the view is bucketed
  *    on a row key ([[graft.catalog.Bucketing]]);
  *  - ΔA_ins ⋈ B' shuffles only the delta plus B-partitions matching the
  *    delta's join keys (AQE broadcasts the delta side);
  *  - the A' probe in the third term is SEMI-JOIN PRUNED by ΔB_ins's
  *    distinct join keys BEFORE the join, so the base-table scan is
  *    proportional to the keys the delta touches — with A' partitioned
  *    or bucketed on the join key this is partition pruning, never a
  *    full scan.
  * Nothing in the plan is ever O(|A|·|B|) or rescans history: total work
  * is O(|V| state pass + |Δ| ⋈ matching-partitions). The physical
  * overwrite strategy for the returned frame is the caller's (staged
  * swap / tombstones — the [[CorpusPipeline]] manifest discipline);
  * applyCdc is the recompute-free logical form.
  *
  * Exactness contract: pure row routing — no arithmetic, no
  * approximation. `applyCdc(joinState(A,B), …) == joinState(A',B')`
  * EXACTLY, row for row, which the spec and the DuckDB oracle
  * (q_cdc_incremental_join replays the full re-join) both pin.
  *
  * Contracts: row keys are unique within each side's snapshot; a row
  * UPDATE (payload or join-key change) arrives as delete(old key) +
  * insert(new row); at most one insert row per row key per batch
  * (compact upstream — [[UrlOps.latestPerUrl]]'s argmax shape). Rows
  * with NULL join keys never pair (inner-join semantics on both the
  * incremental and recompute paths). Column namespaces: the two sides
  * share exactly the join-key columns; everything else must be disjoint.
  */
object IncrementalJoin {

  /** The maintained view plus its row-level delta — `inserted` and
    * `deleted` are FULL view rows (view layout), exactly the retraction +
    * insert changesets a downstream consumer needs: feed them to
    * [[IncrementalAgg.applyCdc]] (with `view` as its snapshot) and an
    * aggregate-ON-a-join materialized view maintains end to end without
    * ever re-joining or rescanning the bases — the cascade
    * (q_cdc_view_cascade) every production MV tree is built from.
    * The three frames are lazy plans, but constructing a fold EAGERLY
    * pins and counts its delta key frames (r11 deltaHint — the
    * profile-then-decide price of keeping the state-side probes
    * broadcast, see [[deltaHint]]); a caller that only wants the plan
    * shape still pays those delta-sized jobs, never a corpus-sized
    * one. */
  final case class ViewDelta(view: DataFrame, inserted: DataFrame, deleted: DataFrame)

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$what missing columns: ${missing.mkString(", ")}")
  }

  /** Broadcast-hint cap for delta-bounded key frames, in MEASURED BYTES
    * (summed per-row widths of the pinned frame's actual values — not a
    * schema estimate: 10 M long keys are a safe broadcast, 10 M 2 KB
    * URL keys are a driver OOM that a `defaultSize`-based estimate
    * waves through at "20 bytes per string"). 64 MB is far past the
    * planner's 10 MB default yet small against executor memory and the
    * driver's 1 GB maxResultSize. Past the cap the hint is withheld and
    * the planner's shuffle plan stands; at that delta size the 100 TB
    * answer is a view/base BUCKETED on the key
    * ([[graft.catalog.Bucketing]]), which makes the anti/semi probes
    * exchange-free without any broadcast. */
  private final val BroadcastBytesCap = 64L * 1024 * 1024

  /** Per-row byte width measured from the DATA: fixed-width fields at
    * their storage width, strings/binary at their actual octet length,
    * nested types via their JSON rendering (an overestimate — safe:
    * it can only withhold a hint, never hint an oversized frame), plus
    * UnsafeRow-ish per-field and per-row overheads. */
  private def measuredRowBytes(df: DataFrame): Column = {
    import org.apache.spark.sql.types._
    val perField: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case StringType | BinaryType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + lit(20L)
        case _: ArrayType | _: MapType | _: StructType =>
          coalesce(octet_length(to_json(struct(col(f.name)))).cast("long"),
            lit(0L)) + lit(20L)
        case dt => lit(dt.defaultSize.toLong + 8L)
      }
    }
    perField.reduce(_ + _) + lit(16L)
  }

  /** Pin a delta-bounded frame and, when its MEASURED size is under
    * [[BroadcastBytesCap]], attach an explicit broadcast hint. The
    * fold's probe frames are all DERIVED (distinct-of-projection,
    * semi-join results), so the planner sees no stats and silently
    * falls back to sort-merge once a file-scanned delta crosses the
    * 10 MB threshold — measured at sf10 (2 % delta): the fold shuffled
    * 636 MB where the from-scratch re-join shuffled 411, inverting the
    * IVM advantage. One aggregate over a delta-sized frame is the
    * profile-then-decide price ([[SkewJoin.decide]] discipline);
    * localCheckpoint pins it so the measurement and every downstream
    * consumer share one computation. */
  private[operators] def deltaHint(frame: DataFrame): DataFrame = {
    // LAZY pin: the byte census is the action that materializes it, so
    // one job (not pin + census) per hint — the fixed per-trigger cost
    // a streaming fold pays on every micro-batch
    val pinned = frame.localCheckpoint(eager = false)
    val bytes = pinned.agg(coalesce(sum(measuredRowBytes(pinned)), lit(0L)))
      .head().getLong(0)
    if (bytes <= BroadcastBytesCap) broadcast(pinned) else pinned
  }

  /** The hinted delta-key frames one fold needs — computed ONCE and
    * shared between [[applyCdcLeft]] and the inner fold it delegates to,
    * and materialized as ONE tagged union: a single localCheckpoint plus
    * a single grouped byte-census replaces five eager pin+measure jobs
    * (the r11 shape — ten driver-visible jobs per fold was the one
    * common-query family that moved the wrong way that round; the
    * cascade paid them twice). Each tag's slice is hinted independently
    * under the measured-bytes cap. */
  private final case class DeltaKeys(aTouched: DataFrame, bTouched: DataFrame,
      aInsJoinKeys: DataFrame, bInsKeys: DataFrame, aInsRowKeys: DataFrame,
      bDelKeys: Option[DataFrame])

  /** @param withBDelKeys the LEFT fold's dead-key scan seeds from the
    *   B-delete row keys alone; folding that sixth frame into the same
    *   tagged union keeps it one pin + one census (inner folds skip it —
    *   no unused distinct rides their census) */
  private def deltaKeysOf(aKey: String, bKey: String, joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      withBDelKeys: Boolean = false): DeltaKeys = {
    // __tag/__bytes are the union's bookkeeping columns — a key named
    // either would collide ambiguously at the slice filter; reject loudly
    val reserved = Set("__tag", "__bytes")
    val clash = (Seq(aKey, bKey) ++ joinKeys).filter(reserved.contains)
    require(clash.isEmpty,
      s"applyCdc: column names ${clash.mkString(", ")} are reserved by " +
        "the delta-key bookkeeping — rename the key column")
    val frames: Seq[(String, DataFrame)] = Seq(
      "aTouched" -> aDeletes.select(col(aKey))
        .unionByName(aInserts.select(col(aKey))).distinct(),
      "bTouched" -> bDeletes.select(col(bKey))
        .unionByName(bInserts.select(col(bKey))).distinct(),
      "aInsJoinKeys" -> aInserts.select(joinKeys.map(col): _*).distinct(),
      "bInsKeys" -> bInserts.select(joinKeys.map(col): _*).distinct(),
      "aInsRowKeys" -> aInserts.select(col(aKey)).distinct()) ++
      (if (withBDelKeys)
        Seq("bDelKeys" -> bDeletes.select(col(bKey)).distinct())
      else Nil)
    // superset schema (a row key may coincide with a join key — dedup):
    // each frame pads the columns it lacks with typed nulls; the byte
    // census is computed on the frame's OWN columns before padding
    val allCols = scala.collection.mutable.LinkedHashMap.empty[
      String, org.apache.spark.sql.types.DataType]
    frames.foreach { case (_, f) =>
      f.schema.fields.foreach(fd =>
        if (!allCols.contains(fd.name)) allCols += fd.name -> fd.dataType)
    }
    val tagged = frames.map { case (tag, f) =>
      val padded = allCols.toSeq.map { case (c, dt) =>
        if (f.columns.contains(c)) col(c) else lit(null).cast(dt).as(c)
      }
      f.withColumn("__bytes", measuredRowBytes(f))
        .select(padded :+ col("__bytes") :+ lit(tag).as("__tag"): _*)
    }
    val pin = tagged.reduce(_ unionByName _).localCheckpoint(eager = false)
    val bytesByTag = pin.groupBy("__tag")
      .agg(sum(col("__bytes")).as("b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def slice(tag: String, cols: Seq[String]): DataFrame = {
      val s = pin.filter(col("__tag") === tag).select(cols.map(col): _*)
      if (bytesByTag.getOrElse(tag, 0L) <= BroadcastBytesCap) broadcast(s)
      else s
    }
    DeltaKeys(
      aTouched = slice("aTouched", Seq(aKey)),
      bTouched = slice("bTouched", Seq(bKey)),
      aInsJoinKeys = slice("aInsJoinKeys", joinKeys),
      bInsKeys = slice("bInsKeys", joinKeys),
      aInsRowKeys = slice("aInsRowKeys", Seq(aKey)),
      bDelKeys = if (withBDelKeys) Some(slice("bDelKeys", Seq(bKey))) else None)
  }

  /** Initial materialization of the view: one inner equi-join. Column
    * order = joinKeys ++ A-rest ++ B-rest (Spark's `join(_, keys)`
    * layout) — [[applyCdc]] emits the same layout, so state files round-
    * trip without reordering. */
  def joinState(a: DataFrame, b: DataFrame, joinKeys: Seq[String]): DataFrame =
    joinStateImpl(a, b, joinKeys, "inner", "joinState")

  /** Fold one CDC batch (per-side inserts + deletes) into the view.
    *
    * @param view      the current materialized state ([[joinState]] layout)
    * @param aKey,bKey unique row-key column of each side (MAY coincide
    *                  with a join key — a dimension keyed by the join
    *                  column — because uniqueness makes key-value routing
    *                  and row routing the same thing)
    * @param aInserts,bInserts full new rows (the side's snapshot schema)
    * @param aDeletes,bDeletes frames carrying at least the row-key column
    *                  (full old rows accepted; only the key is read)
    * @param aSnapshot the POST-change A table — consulted ONLY for pairs
    *                  involving `bInserts`, so a maintenance job with an
    *                  insert-free B side (e.g. the streaming CDC-on-A
    *                  case, [[graft.streaming.JoinMaintenance]]) may pass
    *                  an empty frame with A's schema
    * @param bSnapshot the POST-change B table — joined only against
    *                  `aInserts` (delta-sized probe)
    */
  def applyCdc(view: DataFrame, aKey: String, bKey: String, joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      aSnapshot: DataFrame, bSnapshot: DataFrame): DataFrame =
    applyCdcWithDelta(view, aKey, bKey, joinKeys, aInserts, aDeletes,
      bInserts, bDeletes, aSnapshot, bSnapshot).view

  /** [[applyCdc]] plus the view's own row-level changeset ([[ViewDelta]]):
    * `deleted` = every view row whose A row key or B row key was touched
    * (the complement of the retained term — an update's OLD pairs land
    * here, its NEW pairs in `inserted`), `inserted` = the two delta-join
    * terms. `view ∖ deleted ∪ inserted == view'` by construction, so the
    * delta cascades into any downstream incremental consumer. */
  def applyCdcWithDelta(view: DataFrame, aKey: String, bKey: String,
      joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      aSnapshot: DataFrame, bSnapshot: DataFrame): ViewDelta =
    applyCdcWithDeltaKeys(view, aKey, bKey, joinKeys, aInserts, aDeletes,
      bInserts, bDeletes, aSnapshot, bSnapshot,
      deltaKeysOf(aKey, bKey, joinKeys, aInserts, aDeletes, bInserts, bDeletes))

  private def applyCdcWithDeltaKeys(view: DataFrame, aKey: String, bKey: String,
      joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      aSnapshot: DataFrame, bSnapshot: DataFrame, dk: DeltaKeys): ViewDelta = {
    require(joinKeys.nonEmpty, "applyCdc needs at least one join key")
    // a row key MAY coincide with a join key (a dimension keyed by the
    // join column): the antis then route by join-key value, which names
    // exactly that row's pairs because row keys are unique per side
    requireCols(view, (joinKeys ++ Seq(aKey, bKey)).distinct, "applyCdc view")
    requireCols(aInserts, aSnapshot.columns.toSeq, "applyCdc aInserts")
    requireCols(bInserts, bSnapshot.columns.toSeq, "applyCdc bInserts")
    requireCols(aDeletes, Seq(aKey), "applyCdc aDeletes")
    requireCols(bDeletes, Seq(bKey), "applyCdc bDeletes")

    // touched = delete keys ∪ insert keys: an update re-arrives via the
    // insert term, a pure insert's key matches nothing in the view, so
    // the wider anti is harmless and defends against a caller replacing
    // an existing key without the paired delete
    val aTouched = dk.aTouched
    val bTouched = dk.bTouched
    val notTouchedA = view.join(aTouched, Seq(aKey), "left_anti")
    val retained = notTouchedA.join(bTouched, Seq(bKey), "left_anti")
    // deleted = view ∖ retained, built from the SAME semi/anti shapes (no
    // exceptAll): touched-A rows, plus touched-B rows among the rest —
    // the two legs are disjoint by construction, so no pair lands twice
    val deleted = view.join(aTouched, Seq(aKey), "left_semi")
      .unionByName(notTouchedA.join(bTouched, Seq(bKey), "left_semi"))

    // every pair with a new A row (including new-A × new-B: bSnapshot is
    // POST-change, so it already contains ΔB_ins). B′ is semi-pruned by
    // the delta's distinct join keys FIRST — the broadcast semi is
    // map-side, so the corpus-sized B′ is scanned but never shuffled;
    // the join that follows is delta ⋈ delta-matched
    val newA = joinState(aInserts,
      bSnapshot.join(dk.aInsJoinKeys, joinKeys, "left_semi"), joinKeys)

    // pairs of SURVIVING old A rows with new B rows: prune A' by the
    // delta's join keys first (the partition-pruning move), then drop
    // ΔA_ins rows — those pairs are in `newA` already
    val aSurvivors = aSnapshot
      .join(dk.bInsKeys, joinKeys, "left_semi")
      .join(dk.aInsRowKeys, Seq(aKey), "left_anti")
    val newB = joinState(aSurvivors, bInserts, joinKeys)

    val order = view.columns.map(col).toSeq
    val inserted = newA.select(order: _*).unionByName(newB.select(order: _*))
    ViewDelta(
      view = retained.select(order: _*).unionByName(inserted),
      inserted = inserted,
      deleted = deleted.select(order: _*))
  }

  /** Initial materialization of the LEFT-join view: A rows without a B
    * partner ride along null-extended. Same layout as [[joinState]]. */
  def joinStateLeft(a: DataFrame, b: DataFrame, joinKeys: Seq[String]): DataFrame =
    joinStateImpl(a, b, joinKeys, "left", "joinStateLeft")

  private def joinStateImpl(a: DataFrame, b: DataFrame, joinKeys: Seq[String],
      joinType: String, what: String): DataFrame = {
    require(joinKeys.nonEmpty, s"$what needs at least one join key")
    requireCols(a, joinKeys, s"$what A side")
    requireCols(b, joinKeys, s"$what B side")
    val clash = (a.columns.toSet intersect b.columns.toSet) -- joinKeys.toSet
    require(clash.isEmpty,
      s"$what: non-join-key columns shared by both sides: ${clash.mkString(", ")}")
    a.join(b, joinKeys, joinType)
  }

  /** Fold one CDC batch into a LEFT-join view — the inner fold plus the
    * ZERO-CROSSING transitions that make left-join IVM genuinely harder
    * than inner (Griffin & Libkin, SIGMOD 1995's outer-join caveat):
    *
    *  - a B delete that removes a join key's LAST row must flip that
    *    key's untouched A rows from matched to NULL-EXTENDED (their
    *    pairs all vanish from the inner part — without the flip the A
    *    rows would silently disappear from the view);
    *  - a B insert that gives a previously-B-less key its FIRST row must
    *    flip that key's null-extended rows to matched (the inner fold's
    *    (A′−ΔA)⋈ΔB term already emits the new pairs; the stale
    *    null-extended rows must leave).
    *
    * Mechanics — the unmatched set needs NO extra state table, it IS the
    * view's `bKey IS NULL` slice (B row keys are non-null by contract):
    * the inner slice folds through [[applyCdcWithDelta]]; the unmatched
    * slice retains rows whose A key is untouched AND whose join key
    * gained no B row; inserted A rows probe B′ for a partner (probe
    * semi-pruned by the delta's join keys); and the dead-key scan — join
    * keys that lost their last B row — starts from the VIEW's own rows
    * matching ΔB_del (state-pruned), checks survival against B′ (pruned
    * by the candidate keys), and null-extends the surviving A′ rows of
    * genuinely dead keys. Every base-table probe is delta- or
    * state-pruned; nothing re-joins A′ × B′. A NULL join key never
    * matches (left-join semantics): such rows live in the unmatched
    * slice and survive any B churn.
    *
    * Exactness: `applyCdcLeft(joinStateLeft(A,B), Δ) ==
    * joinStateLeft(A′,B′)` row for row (the q_cdc_incremental_left
    * oracle replays the full LEFT re-join; the spec plants both
    * zero-crossing directions).
    */
  def applyCdcLeft(view: DataFrame, aKey: String, bKey: String,
      joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      aSnapshot: DataFrame, bSnapshot: DataFrame): DataFrame =
    applyCdcLeftWithDelta(view, aKey, bKey, joinKeys, aInserts, aDeletes,
      bInserts, bDeletes, aSnapshot, bSnapshot).view

  /** [[applyCdcLeft]] plus the view's own row-level changeset — the LEFT
    * twin of [[applyCdcWithDelta]], completing the cascade surface for
    * outer views: `deleted` covers both the matched slice's touched
    * pairs AND the unmatched (null-extended) rows that leave it (A key
    * touched, or the join key gained its first B row); `inserted` covers
    * the inner delta terms AND the rows entering null-extended (inserted
    * A rows without a partner, survivors of dead keys). As with the
    * inner form, `view ∖ deleted ∪ inserted == view'` by construction,
    * so a downstream [[IncrementalAgg]] folds a LEFT-join MV tree per
    * micro-batch without re-joining the bases. */
  def applyCdcLeftWithDelta(view: DataFrame, aKey: String, bKey: String,
      joinKeys: Seq[String],
      aInserts: DataFrame, aDeletes: DataFrame,
      bInserts: DataFrame, bDeletes: DataFrame,
      aSnapshot: DataFrame, bSnapshot: DataFrame): ViewDelta = {
    requireCols(view, (joinKeys ++ Seq(aKey, bKey)).distinct, "applyCdcLeft view")
    val jk = joinKeys.map(col)
    val order = view.columns.map(col).toSeq

    // one hinted key-frame set for the WHOLE fold — the inner slice and
    // every left-only probe below share it (each hint is an eager
    // pin + census; computing them twice would double the fixed
    // per-trigger cost of a streaming maintenance job). withBDelKeys
    // folds the dead-key scan's seed into the same single census.
    val dk = deltaKeysOf(aKey, bKey, joinKeys,
      aInserts, aDeletes, bInserts, bDeletes, withBDelKeys = true)

    // inner slice: the matched pairs fold exactly as an inner view
    val innerDelta = applyCdcWithDeltaKeys(view.filter(col(bKey).isNotNull),
      aKey, bKey, joinKeys, aInserts, aDeletes, bInserts, bDeletes,
      aSnapshot, bSnapshot, dk)
    val innerNew = innerDelta.view

    // Every probe below joins a state- or corpus-sized frame against a
    // build side that is DELTA-BOUNDED by construction (key sets of the
    // changesets, or frames semi-pruned by them). Those build sides are
    // derived (distinct-of-projection, join results), so the planner
    // has no stats for them and falls back to sort-merge — shuffling
    // the 30 M-row snapshot/view by join key (measured at sf5: the left
    // fold shuffled 350 MB, MORE than the from-scratch re-join's 198).
    // deltaHint measures each bound and states it to the planner.
    val aTouched = dk.aTouched
    val bInsKeys = dk.bInsKeys

    // unmatched slice, retained: A key untouched, join key gained no B
    // row (an anti on a NULL join key keeps the row — nulls never match,
    // so null-keyed rows stay unmatched through any B churn)
    val unmatchedOld = view.filter(col(bKey).isNull)
    val stillUnmatched = unmatchedOld
      .join(aTouched, Seq(aKey), "left_anti")
      .join(bInsKeys, joinKeys, "left_anti")

    // inserted A rows without a B′ partner land null-extended; the B′
    // key probe is semi-pruned by the delta's join keys first (hinted
    // via dk, so B′ is scanned map-side, never shuffled). The result is
    // delta-BOUNDED and its one consumer joins it against the delta-sized
    // aInserts — a delta ⋈ delta join needs no broadcast census: the
    // hint's eager pin+measure job would cost more than the shuffle it
    // avoids, at bench scale and at 100 TB alike.
    val bKeysNearIns = bSnapshot
      .join(dk.aInsJoinKeys, joinKeys, "left_semi")
      .select(jk: _*).distinct()
    val insUnmatched = aInserts.join(bKeysNearIns, joinKeys, "left_anti")

    // dead keys: lost ≥1 B row (candidates from the VIEW's own matched
    // rows — state-pruned, seeded by dk's bDelKeys slice) and have NO
    // survivor in B′ (probe pruned by the candidates); their untouched
    // A′ rows re-enter null-extended. deadCand and kDead keep their
    // hints — each is the BUILD side of a state/corpus-sized probe
    // (B′ semi, A′ semi) that must never shuffle the big side;
    // stillPresent's one consumer is the delta ⋈ delta anti below, so
    // like bKeysNearIns it carries no census of its own.
    val deadCand = deltaHint(view.filter(col(bKey).isNotNull)
      .join(dk.bDelKeys.get, Seq(bKey), "left_semi")
      .select(jk: _*).distinct())
    val stillPresent = bSnapshot.join(deadCand, joinKeys, "left_semi")
      .select(jk: _*).distinct()
    val kDead = deltaHint(deadCand.join(stillPresent, joinKeys, "left_anti"))
    val deadA = aSnapshot.join(kDead, joinKeys, "left_semi")
      .join(dk.aInsRowKeys, Seq(aKey), "left_anti")

    // null-extend the A-only slices through a left join against an empty
    // B (statically folds to a null-project — no scan)
    val nullExtended = joinStateLeft(
      insUnmatched.unionByName(deadA), bSnapshot.limit(0), joinKeys)

    // unmatched slice's deleted rows = unmatchedOld ∖ stillUnmatched,
    // built from the same disjoint semi/anti legs (A key touched; else
    // join key gained its first B row) — no exceptAll
    val unmatchedDeleted = unmatchedOld.join(aTouched, Seq(aKey), "left_semi")
      .unionByName(unmatchedOld.join(aTouched, Seq(aKey), "left_anti")
        .join(bInsKeys, joinKeys, "left_semi"))

    val inserted = innerDelta.inserted.select(order: _*)
      .unionByName(nullExtended.select(order: _*))
    ViewDelta(
      view = innerNew.select(order: _*)
        .unionByName(stillUnmatched.select(order: _*))
        .unionByName(nullExtended.select(order: _*)),
      inserted = inserted,
      deleted = innerDelta.deleted.select(order: _*)
        .unionByName(unmatchedDeleted.select(order: _*)))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only micro-batch state for MONOTONE UNION state — the companion
  * discipline to [[StateCommit]] (which covers ADDITIVE state). Union
  * state (a shingle index, a verdict table, a survivor set, a pair table)
  * grows with the corpus, so the overwrite-in-place lifecycle the additive
  * streams use is wrong twice over at 100 TB: every micro-batch rewrites
  * O(corpus) parquet to absorb an O(batch) delta, and a crash mid-overwrite
  * leaves the ONLY copy of the state torn. This helper writes each batch as
  * its own immutable delta directory instead:
  *
  *  - layout: `targetDir/delta=<batchId>/…` plus an optional compacted
  *    `targetDir/base=<id>/…` named by the highest batch id folded into it
  *    (a `.base` marker file holds that id — readers take base(marker) ∪
  *    deltas with id > marker);
  *  - publish: the delta lands in a hidden `targetDir/.tmp-<batchId>`
  *    directory first, then a same-filesystem atomic rename flips it to
  *    `delta=<batchId>` — readers can never observe a half-written delta,
  *    and a crash mid-write leaves only a dot-dir that the replay clears;
  *  - replay: an existing `delta=<batchId>` (or batchId ≤ the compaction
  *    marker) makes the append a no-op. The guard is an I/O saving, not a
  *    correctness requirement: union-state merges are idempotent, so even
  *    a doubled delta collapses through the merge-on-read. (As with every
  *    foreachBatch state, batch ids are meaningful only relative to their
  *    checkpoint — state dir and checkpoint dir live and die as a unit.)
  *
  * Readers apply the state's keyed/distinct merge ON READ (each stream owns
  * its merge: distinct for an index, min-struct for survivor sets) — the
  * merge is commutative/associative/idempotent, so reducing the union of
  * deltas equals reducing any arrival order. [[compact]] folds the current
  * deltas into a fresh base under [[StateCommit]]'s marker-flip protocol,
  * bounding read amplification without ever blocking the writer.
  *
  * 100 TB shape: per-batch I/O is O(batch) — the delta is the only write.
  * Merge-on-read touches base + deltas, which periodic compaction keeps at
  * O(corpus + recent); production would run compaction as the same leveled
  * merge an LSM tree uses. */
private[streaming] object AppendState {

  /** Layout-version stamp written into every state dir (`.layout`). A
    * state directory is only meaningful to the code generation that wrote
    * it — a layout refactor (new schema, new commit protocol, a different
    * state class entirely) must fail LOUD on restart, not silently read
    * an empty/garbage state and quietly reset a monitor (the
    * SchemaProfileStream round-15 rewrite hazard). Readers and writers
    * refuse a dir whose stamp mismatches, and refuse a NON-EMPTY dir with
    * no stamp at all (pre-versioning, or written by [[StateCommit]] /
    * something else). Bump the version on any layout-breaking change. */
  private[streaming] val LayoutId = "graft-append-state v1"
  private def layoutMarker(targetDir: String) = new java.io.File(targetDir, ".layout")

  /** Enforce the layout stamp; on a fresh/absent dir with `forWrite`,
    * create the dir and stamp it. */
  private def checkLayout(targetDir: String, forWrite: Boolean = false): Unit = {
    val dir = new java.io.File(targetDir)
    val m = layoutMarker(targetDir)
    if (m.exists()) {
      val got = java.nio.file.Files.readString(m.toPath).trim
      require(got == LayoutId,
        s"AppendState: state dir $targetDir has layout '$got' but this build " +
          s"reads '$LayoutId' — incompatible state layout; rebuild the state " +
          "from a replay (state dir and checkpoint dir live and die as a unit)")
    } else if (Option(dir.listFiles()).exists(_.exists(f =>
        // crash garbage is not state content: a torn stamp (.layout.tmp),
        // a torn marker (.base.tmp) or a torn delta (.tmp-<id>) may be the
        // ONLY leftover of a crash inside the first append's stamp window,
        // and the module's contract is that replays clear such garbage —
        // refusing on it would permanently brick a self-healing dir
        f.getName != ".layout.tmp" && f.getName != ".base.tmp" &&
          !f.getName.startsWith(".tmp-")))) {
      throw new IllegalArgumentException(
        s"AppendState: state dir $targetDir is non-empty but carries no " +
          s"'.layout' stamp — it predates layout versioning or was written " +
          s"by a different state class; refusing to read it as '$LayoutId'. " +
          "Rebuild the state from a replay on a fresh target dir")
    } else if (forWrite) {
      dir.mkdirs()
      val tmp = new java.io.File(targetDir, ".layout.tmp")
      java.nio.file.Files.writeString(tmp.toPath, LayoutId)
      java.nio.file.Files.move(tmp.toPath, m.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deltaDir(targetDir: String, batchId: Long) =
    new java.io.File(targetDir, s"delta=$batchId")
  private def tmpDir(targetDir: String, batchId: Long) =
    new java.io.File(targetDir, s".tmp-$batchId")
  private def baseDir(targetDir: String, upTo: Long) =
    new java.io.File(targetDir, s"base=$upTo")
  private def baseMarker(targetDir: String) = new java.io.File(targetDir, ".base")

  /** Highest batch id folded into the compacted base, or −1 if never
    * compacted. */
  def baseId(targetDir: String): Long = {
    checkLayout(targetDir)
    val m = baseMarker(targetDir)
    if (m.exists()) java.nio.file.Files.readString(m.toPath).trim.toLong else -1L
  }

  /** Committed delta batch ids (ascending), EXCLUDING those folded into the
    * base. */
  def deltaIds(targetDir: String): Seq[Long] = {
    val base = baseId(targetDir)
    Option(new java.io.File(targetDir).listFiles()).map(_.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("delta="))
      .map(_.getName.stripPrefix("delta=").toLong)
      .filter(_ > base).sorted).getOrElse(Nil)
  }

  def exists(targetDir: String): Boolean =
    baseId(targetDir) >= 0 || deltaIds(targetDir).nonEmpty

  /** Publish batch `batchId`'s rows as an immutable delta (write to a
    * dot-dir, atomic rename). No-op if the delta already exists or was
    * already compacted into the base (a replayed batch). A NEGATIVE
    * `batchId` means "out-of-band apply, no checkpoint identity": the
    * delta gets the next free id and the replay guard is skipped —
    * correctness then rests on the merge-on-read being idempotent, which
    * is the union-state contract.
    *
    * `partitionCols` buckets the delta's files by the named columns
    * (Hive-style subdirs inside the delta) so KEYED readers prune delta
    * files instead of scanning the full state — a state dir must use the
    * same partitioning for every append and its compactions (the layout
    * is part of the state contract; state dirs predating a layout change
    * are rebuilt by replay, as with any checkpoint change). */
  def append(delta: DataFrame, targetDir: String, batchId0: Long,
             partitionCols: Seq[String] = Nil): Unit = {
    checkLayout(targetDir, forWrite = true)
    val batchId =
      if (batchId0 >= 0) batchId0
      else (deltaIds(targetDir) :+ baseId(targetDir)).max + 1
    if (batchId <= baseId(targetDir) || deltaDir(targetDir, batchId).exists()) return
    val tmp = tmpDir(targetDir, batchId)
    if (tmp.exists()) deleteQuietly(tmp) // torn write from a previous crash
    val w = delta.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    // A zero-row partitionBy write emits only _SUCCESS — no schema-bearing
    // part file — and one such dir poisons every later per-dir read with
    // UNABLE_TO_INFER_SCHEMA. Skip publishing it: union-state merges are
    // idempotent, so an absent empty delta reads identically to a present
    // one, and a replay of the batch recomputes empty and skips again.
    if (partitionCols.nonEmpty && !hasParquetFile(tmp)) {
      deleteQuietly(tmp)
      return
    }
    java.nio.file.Files.move(tmp.toPath, deltaDir(targetDir, batchId).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Any schema-bearing parquet part file anywhere under `dir`? */
  private def hasParquetFile(dir: java.io.File): Boolean =
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).exists { f =>
      (f.isFile && f.getName.endsWith(".parquet")) ||
        (f.isDirectory && hasParquetFile(f))
    }

  /** The raw union of base + committed deltas. Rows may repeat across
    * deltas (redelivery in later batches) — callers apply their
    * idempotent merge on top. None before the first append. Each dir is
    * read as its OWN partition-discovery root (basePath = the dir), so a
    * bucketed layout's `bucket=K` subdirs surface as a partition column
    * without the `delta=`/`base=` level confusing discovery — and a
    * filter on that column pushes into every union branch's scan as a
    * PartitionFilter (file-level pruning per delta). */
  def raw(spark: SparkSession, targetDir: String): Option[DataFrame] = {
    val base = baseId(targetDir)
    val dirs = (if (base >= 0) Seq(baseDir(targetDir, base).toString) else Nil) ++
      deltaIds(targetDir).map(id => deltaDir(targetDir, id).toString)
    if (dirs.isEmpty) None
    else Some(dirs.map(d => spark.read.option("basePath", d).parquet(d))
      .reduce(_.unionByName(_)))
  }

  /** Fold base + all current deltas into a fresh compacted base via
    * `merge` (the state's own idempotent reduction). Protocol mirrors
    * [[StateCommit]]: the new base lands in a FRESH `base=<upTo>` dir, the
    * `.base` marker flips via atomic rename (the commit point), then the
    * folded deltas and old base are deleted best-effort (leftovers are
    * garbage, never state — readers filter on the marker). */
  def compact(spark: SparkSession, targetDir: String,
              merge: DataFrame => DataFrame,
              partitionCols: Seq[String] = Nil): Unit = {
    val oldBase = baseId(targetDir)
    val folded = deltaIds(targetDir)
    if (folded.isEmpty) return
    val upTo = folded.max
    val all = raw(spark, targetDir).get
    val target = baseDir(targetDir, upTo)
    if (target.exists()) deleteQuietly(target) // orphan from a previous crash
    val merged = merge(all).localCheckpoint(true)
    val w = merged.write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(target.toString)
    // Unlike an empty delta (skippable), an empty base MUST exist — the
    // marker flip below is what retires the folded deltas — so republish a
    // zero-row partitioned base unpartitioned: the schema-only part file
    // keeps the per-dir read well-formed, and unionByName absorbs the
    // column-order difference vs partition-discovered deltas.
    if (partitionCols.nonEmpty && !hasParquetFile(target)) {
      deleteQuietly(target)
      merged.write.parquet(target.toString)
    }
    val tmp = new java.io.File(targetDir, ".base.tmp")
    java.nio.file.Files.writeString(tmp.toPath, upTo.toString)
    java.nio.file.Files.move(tmp.toPath, baseMarker(targetDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    folded.foreach(id => deleteQuietly(deltaDir(targetDir, id)))
    if (oldBase >= 0) deleteQuietly(baseDir(targetDir, oldBase))
  }

  /** Default [[compactIfDue]] trigger, and the default every stream's
    * applyBatch now applies: a long-lived stream otherwise accumulates one
    * delta dir per micro-batch and read amplification grows UNBOUNDED
    * until someone remembers the manual compact call (the round-15 gap).
    * 8 keeps merge-on-read at O(base + 8·batch) while amortizing each
    * O(state) fold over 8 O(batch) appends; pass ≤ 0 to a stream's
    * `compactEvery` to opt back out (e.g. when an external compactor owns
    * the fold schedule). */
  val DefaultCompactEvery = 8

  /** The LSM trigger condition, centralized: true when `every` > 0 and at
    * least that many deltas await folding on `targetDir`. Streams whose
    * fold spans SEVERAL state dirs (their own `compact`) test this on
    * their largest dir and run their fold; single-dir states use
    * [[compactIfDue]] directly. One definition — a future policy change
    * (e.g. byte-based) edits one place, not every applyBatch. */
  def compactionDue(targetDir: String, every: Int): Boolean =
    every > 0 && deltaIds(targetDir).size >= every

  /** The standard leveled-compaction policy: fold whenever `every`
    * committed deltas have accumulated past the base (the LSM trigger,
    * keeping merge-on-read at O(base + every·batch)). Safe to call at any
    * time — compaction publishes atomically and folded ids replay as
    * no-ops — so streams run it inline after their per-batch append;
    * `every` ≤ 0 disables. */
  def compactIfDue(spark: SparkSession, targetDir: String, every: Int)
                  (merge: DataFrame => DataFrame): Unit =
    if (compactionDue(targetDir, every)) compact(spark, targetDir, merge)

  private def deleteQuietly(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteQuietly))
    f.delete(); ()
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Partition-scoped MERGE — upsert + delete a delta into a
  * directory-partitioned parquet snapshot, rewriting ONLY the
  * partitions the delta touches.
  *
  * The 100 TB ingest shape: a day's corrections arrive for a
  * multi-year partitioned table. A naive MERGE rewrites the whole
  * table (100 TB of IO for a GB of changes); a partition-scoped merge
  * reads and rewrites just the touched `part=v` directories — IO
  * ∝ touched-partition bytes, and the scan of the old snapshot slice
  * is directory-pruned (`PartitionFilters`, not a full-table filter).
  * The swap is per-partition directory renames after the full rewrite
  * lands in a temp root, so readers never observe a half-merged
  * partition and untouched partitions are never opened, let alone
  * rewritten (asserted byte-for-byte in the registered query).
  *
  * Semantics (per key, within the snapshot): a delta row with op 'U'
  * replaces the stored row (or inserts if absent); op 'D' removes it.
  * Delta rows must carry the partition value of the stored row they
  * target — the same contract Hive/Delta static-partition MERGE has;
  * a mis-partitioned delta row would silently duplicate the key, so
  * [[mergeIntoPartitioned]] rejects deltas whose key appears in more
  * than one partition.
  */
object Upsert {

  /** What the merge did: partition dirs rewritten vs left untouched,
    * and the row movement (survivors kept, upserts written, deletes
    * dropped are implied by the difference). */
  final case class MergeStats(touchedPartitions: Seq[String],
                              untouchedPartitions: Seq[String],
                              survivorRows: Long, upsertRows: Long,
                              touchedValues: Seq[Any])

  /** Slowly-changing-dimension type-2 history from a change log —
    * Kimball's SCD2: collapse each key's consecutive runs of an
    * unchanged state into one validity range [valid_from, valid_to),
    * the open (valid_to NULL) range being current. The complement to
    * [[diffSnapshots]]: diff derives the change log from two
    * snapshots; this derives the dimension history from the log.
    *
    * The island detection is the gaps-and-islands classic: a change
    * flag per row (null-safe lag comparison, so the first row of a key
    * always opens an island), a running sum of flags numbering the
    * islands, then one aggregation per island and a lead() for the
    * exclusive range end. All windows are partitioned by the dimension
    * key — high-cardinality by construction (one task never sees more
    * than one key's history), no global order anywhere.
    *
    * @param log       one row per observed (key, state) at some order
    *                  position; rows need not be pre-sorted
    * @param keys      dimension identity columns
    * @param orderCols total order within a key (make it unique — add a
    *                  tiebreaker column — or runs that interleave at
    *                  equal order positions split nondeterministically)
    * @param stateCol  the tracked attribute (null-safe compared)
    * @param fromCol   the column reported as each range's valid_from
    *                  (min over the island; typically the event time
    *                  that orderCols leads with)
    * @return (keys…, range_idx, state, valid_from, valid_to,
    *         is_current, n_rows) — range_idx numbers a key's ranges
    *         1..k in order (deterministic given unique orderCols, and
    *         the unambiguous sort key when two ranges share a
    *         valid_from); valid_to = next range's valid_from, NULL on
    *         the current range; n_rows = log rows collapsed in
    */
  def scd2FromChangeLog(log: DataFrame, keys: Seq[String],
                        orderCols: Seq[org.apache.spark.sql.Column],
                        stateCol: String,
                        fromCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(orderCols: _*)
    // the first row of a key is flagged EXPLICITLY: the null-safe lag
    // comparison alone reads NULL <=> NULL as "unchanged" when a key's
    // first state is NULL, which would number that key's islands 0..k−1
    // while every other key counts 1..k
    val flagged = log
      .withColumn("__chg",
        when(row_number().over(w) === 1 ||
            !(lag(col(stateCol), 1).over(w) <=> col(stateCol)), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged
      .groupBy(kc :+ col("__island"): _*)
      .agg(min(col(stateCol)).as("state"), // constant within an island
        min(fromCol).as("valid_from"), count(lit(1)).as("n_rows"))
    val w2 = Window.partitionBy(kc: _*).orderBy(col("__island"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed("__island", "range_idx")
  }

  /** Hive dir name (`part=escapedValue`) for a partition value. */
  private def dirName(partCol: String, value: Any): String =
    s"$partCol=${ExternalCatalogUtils.escapePathName(String.valueOf(value))}"

  /** (fileName, length, mtime) of every data file directly under
    * `root/partDir`, sorted — a byte-level identity signature for the
    * no-rewrite assertion (renames elsewhere must not perturb it). */
  def partitionFileSignature(spark: SparkSession, root: String,
                             partDir: String): Seq[(String, Long, Long)] = {
    val p = new Path(root, partDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
  }

  /** CDC read side — the inverse of [[mergeIntoPartitioned]]: the
    * minimal delta (op 'U'/'D' rows) that transforms snapshot `from`
    * into snapshot `to`. Inserts and updates surface as 'U' carrying
    * `to`'s row; deletes as 'D' carrying `from`'s row (so the delta
    * has the partition value the merge needs to find the victim).
    * Unchanged rows emit nothing — the delta is change-sized, which is
    * the whole point at 100 TB: diff two snapshot generations once,
    * then ship/apply/audit the delta instead of either snapshot.
    *
    * One full-outer equi-join on the keys; row equality compares all
    * non-key columns null-safely. `roundtrip` holds by construction:
    * merging the returned delta into `from` reproduces `to` exactly
    * (asserted in the registered query and UpsertSpec). */
  def diffSnapshots(from: DataFrame, to: DataFrame, keyCols: Seq[String],
                    opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(from.columns.toSeq == to.columns.toSeq,
      s"snapshots must share a schema: ${from.columns.mkString(",")} vs ${to.columns.mkString(",")}")
    val nonKey = from.columns.filterNot(keyCols.contains).toSeq
    // presence markers instead of key-null checks: a null key column must
    // not read as "row absent"
    val lf = from.withColumn("__lp", lit(true)).as("l")
    val rt = to.withColumn("__rp", lit(true)).as("r")
    val cond = keyCols.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = lf.join(rt, cond, "full_outer")
    val differs = !(struct(nonKey.map(c => col(s"l.$c")): _*) <=>
      struct(nonKey.map(c => col(s"r.$c")): _*))
    val upserts = joined
      .filter(col("r.__rp") && (col("l.__lp").isNull || differs))
      .select(from.columns.map(c => col(s"r.$c")).toIndexedSeq: _*)
      .withColumn(opCol, lit("U"))
    val deletes = joined
      .filter(col("l.__lp") && col("r.__rp").isNull)
      .select(from.columns.map(c => col(s"l.$c")).toIndexedSeq: _*)
      .withColumn(opCol, lit("D"))
    upserts.unionByName(deletes)
  }

  /** Incremental report maintenance — refresh a per-partition summary
    * after a merge by recomputing ONLY the touched partitions'
    * summary rows and carrying the rest over from the previous
    * summary. `summarize` must group by `partCol` (one-or-more rows
    * per partition value, each carrying the partition column); a
    * fully-deleted partition naturally drops out (its slice is empty,
    * so `summarize` emits nothing for it, and its old rows are
    * filtered away). At 100 TB this is the difference between
    * re-aggregating the whole table after every merge and
    * re-aggregating the day that changed: cost ∝ touched-partition
    * bytes, with the touched scan directory-pruned like the merge
    * itself. The registered query asserts refreshed-incrementally ==
    * recomputed-from-scratch exactly.
    *
    * `previous` must hold PRE-merge values that survive the merge's
    * directory swap — read it from the stored summary table (the
    * normal case), or materialize it first. A merely-persisted
    * `summarize(read(root))` plan is a trap twice over: lazy
    * re-evaluation would read post-merge files, and the cache manager
    * matches plan-equal fragments, so a later from-scratch recompute
    * with the same shape silently reuses the stale cached rows. */
  def refreshPartitionSummaries(spark: SparkSession, root: String,
                                partCol: String, touchedValues: Seq[Any],
                                previous: DataFrame,
                                summarize: DataFrame => DataFrame): DataFrame = {
    require(previous.columns.contains(partCol),
      s"previous summary must carry $partCol")
    val touchedSlice = spark.read.parquet(root)
      .filter(col(partCol).isInCollection(touchedValues))
    previous.filter(!col(partCol).isInCollection(touchedValues))
      .unionByName(summarize(touchedSlice))
  }

  /** Acquire the root-level merge lock by atomically creating
    * `root/.merge-lock` (create-if-absent — atomic on HDFS and
    * object-store rename-committers; best-effort on the local FS).
    * Waiters poll with exponential backoff up to `waitMs`, then FAIL
    * with the holder's identity rather than breaking the lock — a
    * crashed holder's lock is removed manually (`hdfs dfs -rm
    * <root>/.merge-lock`), never automatically (auto-breaking risks two
    * live holders, the exact lost-update this lock exists to prevent). */
  private def acquireMergeLock(fs: org.apache.hadoop.fs.FileSystem,
                               rootPath: Path, waitMs: Long): Path = {
    val lock = new Path(rootPath, ".merge-lock")
    // jvmstart (the holder JVM's start instant) makes pid liveness checks
    // pid-recycling-proof: a later process that reuses the pid has a
    // different start instant, so lockStatus can tell "holder still
    // running" from "pid recycled by something else"
    val jvmStart = ProcessHandle.current().info().startInstant()
      .map[Long](_.toEpochMilli).orElse(-1L)
    val payload = (s"uuid=${java.util.UUID.randomUUID()} " +
      s"pid=${ProcessHandle.current().pid()} host=$localHostName " +
      s"jvmstart=$jvmStart at=${System.currentTimeMillis()}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val deadline = System.currentTimeMillis() + waitMs
    var delay = 50L
    // file:// goes through NIO createFile — Hadoop's local create with
    // overwrite=false is exists-then-create (TOCTOU race between two
    // local[n] threads); POSIX O_CREAT|O_EXCL is atomic. HDFS and
    // object-store committers make fs.create(…, false) itself atomic.
    val localLock: Option[java.nio.file.Path] =
      if (fs.getScheme == "file") Some(java.nio.file.Paths.get(lock.toUri.getPath))
      else None
    while (true) {
      var created = false
      try {
        localLock match {
          case Some(nio) =>
            java.nio.file.Files.createFile(nio) // atomic O_EXCL
            created = true
            java.nio.file.Files.write(nio, payload)
          case None =>
            val out = fs.create(lock, false) // throws if the lock exists
            created = true
            try out.write(payload) finally out.close()
        }
        return lock
      } catch {
        case e: Throwable if created =>
          // the lock file is OURS but the payload write failed (disk
          // full, pipeline failure — IOException or ANY other throwable):
          // without this cleanup the retry loop (or every future writer)
          // would treat our own half-created lock as a foreign holder and
          // self-deadlock until timeout — and then leak it
          try fs.delete(lock, false) catch { case _: Throwable => () }
          throw e
        case _: java.io.IOException =>
          if (System.currentTimeMillis() >= deadline) {
            val holder = readLockPayload(fs, lock)
            throw new IllegalStateException(
              s"could not acquire merge lock $lock within ${waitMs} ms; " +
                s"held by: $holder — if the holder crashed, remove the lock " +
                "file manually and re-run")
          }
          Thread.sleep(delay); delay = math.min(delay * 2, 1000L)
      }
    }
    lock // unreachable
  }

  /** Read the lock payload, closing the stream (readFullyToByteArray
    * does not) — the diagnostic path must not leak a handle per poll. */
  private def readLockPayload(fs: org.apache.hadoop.fs.FileSystem,
                              lock: Path): String =
    try {
      val in = fs.open(lock)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } catch { case _: Throwable => "<unreadable>" }

  private def localHostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Throwable => "unknown" }

  /** Hostnames that do not identify a machine: containers and minimal
    * images commonly share them (and getLocalHost's failure fallback is
    * "unknown"), so a payload-host match against one of these proves
    * nothing — two different machines can both report it. Liveness
    * checks must stay advisory (`None`) for them. */
  private val nonIdentifyingHosts =
    Set("", "unknown", "localhost", "localhost.localdomain")

  /** Holder identity parsed from a live `.merge-lock`.
    *
    * `pidAlive` is ADVISORY, not definitive: it is answerable only when
    * the payload's host equals this host AND that hostname actually
    * identifies a machine (non-unique container hostnames like
    * `localhost` make the match meaningless — a LIVE remote holder would
    * be checked against the wrong pid table and misreported dead, the
    * exact lost-update the lock prevents, so those report `None`). When
    * it is answerable, the payload's `jvmstart=` makes it
    * pid-recycling-proof: a live process whose start instant differs
    * from the payload's is a NEW process that reused the pid, so the
    * holder itself is dead. A holder on another host always reports
    * `None` — check the pid on its host, per the payload's `host=`. */
  final case class LockStatus(exists: Boolean, payload: String,
                              uuid: Option[String], pid: Option[Long],
                              host: Option[String], ageMs: Option[Long],
                              pidAlive: Option[Boolean])

  /** Inspect `root/.merge-lock` without touching it — the manual-recovery
    * companion to [[mergeIntoPartitioned]]'s never-auto-break contract.
    *
    * Recovery recipe for a crashed holder (the ONLY sanctioned path —
    * the lock is never broken automatically, because auto-breaking risks
    * two live holders and the exact lost update the lock prevents):
    *  1. `Upsert.lockStatus(spark, root)` — read uuid/pid/host/age.
    *  2. Confirm the holder is dead ON ITS OWN HOST (the payload's
    *     `host=`): check the pid there, or confirm the job is gone in
    *     the cluster manager. `pidAlive = Some(false)` from this method
    *     is supporting evidence, not proof — it is only reported when
    *     the payload host matches an identifying local hostname, and
    *     hostname collisions (cloned containers) can still misattribute
    *     it; treat it as advisory unless you know hostnames are unique
    *     in your fleet.
    *  3. Only then remove the file by hand:
    *     `hdfs dfs -rm <root>/.merge-lock` (or `rm` on file://)
    *     and re-run the merge. A merely SLOW holder (pid alive, large
    *     rewrite in flight) must be waited out, not broken.
    */
  def lockStatus(spark: SparkSession, root: String): LockStatus = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new Path(rootPath, ".merge-lock")
    if (!fs.exists(lock))
      return LockStatus(exists = false, "", None, None, None, None, None)
    val payload = readLockPayload(fs, lock)
    def field(k: String): Option[String] =
      payload.split(' ').collectFirst {
        case kv if kv.startsWith(k + "=") => kv.drop(k.length + 1)
      }
    val pid = field("pid").flatMap(_.toLongOption)
    val host = field("host")
    val at = field("at").flatMap(_.toLongOption)
    // liveness is answerable only for a same-host holder whose hostname
    // actually identifies this machine (see the method doc): ProcessHandle
    // sees local pids, so present ⇒ alive-status, absent ⇒ dead on THIS
    // host — which is only the holder's host when hostnames are unique.
    // Non-identifying or remote host ⇒ None (advisory).
    val alive =
      if (!host.contains(localHostName) ||
          host.exists(nonIdentifyingHosts.contains)) None
      else pid.map { p =>
        val h = ProcessHandle.of(p)
        val present = h.isPresent && h.get().isAlive
        // pid-recycling guard: a live process with a start instant that
        // differs from the payload's jvmstart is a NEW process that
        // reused the pid — the holder itself is dead. Missing on either
        // side (old payload / platform without startInstant) ⇒ fall back
        // to plain pid liveness.
        val startOk = field("jvmstart").flatMap(_.toLongOption)
          .filter(_ >= 0L) match {
          case Some(want) if present =>
            val got = h.get().info().startInstant()
            !got.isPresent || math.abs(got.get().toEpochMilli - want) <= 1000L
          case _ => true
        }
        present && startOk
      }
    LockStatus(exists = true, payload, field("uuid"), pid, host,
      at.map(System.currentTimeMillis() - _), alive)
  }

  /** Record a committed merge in `root/.merge-log/` (dot-prefixed, so
    * snapshot readers never see it): one small JSON file per merge —
    * the audit trail half of the FileCommitProtocol idiom. */
  private def logCommit(fs: org.apache.hadoop.fs.FileSystem, rootPath: Path,
                        stats: MergeStats): Unit = {
    val dir = new Path(rootPath, ".merge-log")
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val id = s"${System.currentTimeMillis()}-${java.util.UUID.randomUUID().toString.take(8)}"
    // partition dir names are user data (string partition values pass
    // through dirName verbatim): JSON-escape them or a value containing
    // a quote/backslash/control char corrupts the audit record
    def jstr(v: String): String = "\"" + v.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""
    val body =
      s"""{"id":${jstr(id)},"touched":[${stats.touchedPartitions.map(jstr).mkString(",")}],
         |"survivorRows":${stats.survivorRows},"upsertRows":${stats.upsertRows}}""".stripMargin
    val out = fs.create(new Path(dir, s"$id.json"), false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** MERGE `delta` into the partitioned snapshot at `root`.
    *
    * `delta` must contain the snapshot's columns plus `opCol` with
    * values 'U' (upsert) or 'D' (delete; only key + partition columns
    * are consulted). Returns [[MergeStats]]; the snapshot at `root` is
    * atomically-per-partition replaced.
    *
    * Concurrent-writer safety: the read-rewrite-swap critical section
    * runs under an exclusive root-level lock file (`.merge-lock`,
    * atomic create-if-absent), so two merges into the same root
    * SERIALIZE — without it, merge B could read the pre-A snapshot
    * while A swaps, and whichever swapped last would silently erase the
    * other's rows (lost update; UpsertSpec proves 4 concurrent
    * single-key merges all land). Each committed merge appends an
    * audit record under `.merge-log/`. Concurrent READERS need no
    * lock: the per-partition rename swap keeps every partition fully
    * old or fully new at all times.
    *
    * @param lockWaitMs how long a second writer polls for the lock
    *                   before failing (default 10 min — a big-partition
    *                   rewrite ahead of it is real work, not a hang)
    */
  def mergeIntoPartitioned(spark: SparkSession, root: String, delta: DataFrame,
                           keyCols: Seq[String], partCol: String,
                           opCol: String = "op",
                           lockWaitMs: Long = 600000L): MergeStats = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(rootPath), s"snapshot root $root does not exist")
    // dirName must agree with how Spark's partitioned write names the
    // value's directory; that holds for strings and integral/boolean
    // types, but NOT for null (writes __HIVE_DEFAULT_PARTITION__) or for
    // date/timestamp/decimal formatting — a mismatch would silently
    // strand the rewrite in tmp, so reject rather than lose data
    import org.apache.spark.sql.types._
    delta.schema(partCol).dataType match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType => ()
      case other => throw new IllegalArgumentException(
        s"$partCol has type ${other.catalogString}; partition-scoped merge " +
          "supports string/integral/boolean partition values (path-name-stable)")
    }

    // the delta feeds several collects, the rewrite, and the row
    // accounting — evaluate its upstream plan once
    delta.persist()
    try {
      // ONE guard pass over the delta (was four separate actions: null-
      // partition check, op-value distinct, duplicate-key count, touched-
      // partition collect — plus a later upsert-row count; each a full
      // job per merge call, and the CDC stream sink pays them per
      // micro-batch). Per-key aggregation first, then one global fold.
      // CARDINALITY CONTRACT unchanged: touched partitions (and so the
      // collected sets) are a delta's few corrected slices, never the
      // whole table.
      val g = delta
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          sum(when(col(partCol).isNull, 1L).otherwise(0L)).as("__nulls"),
          // collect_set DROPS nulls: a null op would silently pass the
          // subsetOf check below yet be treated as a delete (anti-joined
          // out, never re-inserted) — count nulls separately and fail
          // loudly, mirroring the partCol null check (ADVICE r14)
          sum(when(col(opCol).isNull, 1L).otherwise(0L)).as("__nullops"),
          collect_set(col(opCol)).as("__ops"),
          sum(when(col(opCol) === "U", 1L).otherwise(0L)).as("__u"),
          collect_set(col(partCol)).as("__parts"))
        .agg(coalesce(sum(when(col("__n") > 1, 1L).otherwise(0L)), lit(0L)).as("dupKeys"),
          coalesce(sum(col("__nulls")), lit(0L)).as("nulls"),
          coalesce(sum(col("__nullops")), lit(0L)).as("nullOps"),
          array_distinct(flatten(collect_set(col("__ops")))).as("ops"),
          coalesce(sum(col("__u")), lit(0L)).as("upsertRows"),
          array_distinct(flatten(collect_set(col("__parts")))).as("parts"))
        .head() // empty delta → one row of zeros/empty arrays (no-op merge)
      require(g.getAs[Long]("nulls") == 0,
        s"delta rows with null $partCol are not mergeable (no stable dir name)")
      require(g.getAs[Long]("nullOps") == 0,
        s"delta rows with null $opCol are not mergeable (op must be U or D)")
      val ops = g.getSeq[String](g.fieldIndex("ops")).toSet
      require(ops.subsetOf(Set("U", "D")),
        s"unknown $opCol values: ${(ops -- Set("U", "D")).mkString(", ")}")
      // one stored row per key → each key may appear ONCE in the delta;
      // two same-key rows (even in one partition) would both survive the
      // anti-join and duplicate the key in the snapshot. Callers with
      // multi-change feeds collapse first (see StreamOps.writeStreamMerge).
      val dup = g.getAs[Long]("dupKeys")
      require(dup == 0, s"$dup delta key(s) appear in more than one row; " +
        "collapse the delta to one row per key before merging")
      val guardUpsertRows = g.getAs[Long]("upsertRows")

      // ---- critical section: read-rewrite-swap under the root lock ----
      val lock = acquireMergeLock(fs, rootPath, lockWaitMs)
      try {
      val touchedValues = g.getSeq[Any](g.fieldIndex("parts")).toArray
      val touchedDirs = touchedValues.map(dirName(partCol, _)).sorted.toSeq
      val existingDirs = fs.listStatus(rootPath)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .map(_.getPath.getName).sorted.toSeq
      val untouchedDirs = existingDirs.filterNot(touchedDirs.contains)

      // directory-pruned read of ONLY the touched slice of the snapshot
      val snap = spark.read.parquet(root)
      val affected = snap.filter(col(partCol).isInCollection(touchedValues.toSeq))
      val deltaKeys = delta.select(keyCols.map(col): _*).distinct()
      val survivors = affected.join(deltaKeys, keyCols, "left_anti")
      val upserts = delta.filter(col(opCol) === "U").drop(opCol)
        .select(snap.columns.map(col).toIndexedSeq: _*) // snapshot column order
      val merged = survivors.unionByName(upserts)

      // land the rewrite in a temp root first: the swap below is pure
      // renames, so a mid-merge failure leaves every partition either
      // fully old or fully new, never mixed
      val tmp = s"$root.merge-tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      merged.write.partitionBy(partCol).mode("overwrite").parquet(tmp)
      // row accounting from the MATERIALIZED rewrite (cheap re-scan of the
      // touched slice only); survivors and upserts are disjoint by the
      // anti-join construction. Explicit schema: a delete-everything merge
      // writes zero files and schema inference would fail on the empty dir.
      val mergedRows = spark.read.schema(snap.schema).parquet(tmp).count()
      val upsertRows = guardUpsertRows // counted in the single guard pass
      val survivorRows = mergedRows - upsertRows

      // Swap, preserving a recovery path at every step: the OLD dir is
      // renamed aside (never deleted) before the new one moves in, so a
      // failed rename can restore it; tmp is only removed after EVERY
      // partition swapped — on failure it stays on disk with both the
      // aside copies and any unswapped rewrites.
      touchedDirs.foreach { d =>
        val oldDir = new Path(rootPath, d)
        val newDir = new Path(tmp, d)
        val aside = new Path(tmp, s".replaced-$d")
        val hadOld = fs.exists(oldDir)
        if (hadOld) require(fs.rename(oldDir, aside),
          s"could not move $oldDir aside (snapshot unchanged)")
        // a fully-deleted partition writes no dir — retiring the old one
        // IS the merge for it
        if (fs.exists(newDir) && !fs.rename(newDir, oldDir)) {
          if (hadOld && !fs.rename(aside, oldDir))
            throw new IllegalStateException(
              s"swap of $d failed AND restore failed; old data preserved at $aside")
          throw new IllegalStateException(
            s"could not move $newDir into place; $d restored, rewrite kept at $tmp")
        }
      }
      fs.delete(new Path(tmp), true) // success: drop asides + empty shell
      val stats = MergeStats(touchedDirs, untouchedDirs, survivorRows, upsertRows,
        touchedValues.toSeq)
      logCommit(fs, rootPath, stats)
      stats
      } finally { fs.delete(lock, false); () }
    } finally { delta.unpersist(); () }
  }
}

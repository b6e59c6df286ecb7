package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned parquet tables — the Iceberg-lite snapshot/time-travel
  * half of storage maintenance ([[Scale.compactParquet]] is the other half;
  * the reference has one immutable layout forever). Every commit writes NEW
  * data files plus an atomically-published manifest listing every file of
  * that snapshot, so:
  *
  *  - a reader pinned to version N plans exactly N's files — later commits
  *    never change its result (snapshot isolation without locks);
  *  - an append commit costs O(new files) — the table is never rewritten;
  *  - a replace commit expresses compaction/delete: the new manifest simply
  *    stops listing the old files, which stay on disk for older versions.
  *
  * At 100 TB the manifest is a file LIST (KBs per thousand files); commit
  * and version resolution are metadata operations on the driver, data moves
  * only through executor parquet writes. The publish is write-temp +
  * atomic-rename — the same contract the streaming drop-dir sources assert
  * for in-progress files. All paths go through the Hadoop FileSystem API so
  * object stores work unchanged.
  */
object Snapshots {
  private def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def manifestDir(dir: String) = s"$dir/_manifests"

  /** Published versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (fs, _) = hfs(spark, dir)
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toInt }
      .sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Int] =
    versions(spark, dir).lastOption

  /** Data-file paths (relative to `dir`) of one snapshot. */
  def files(spark: SparkSession, dir: String, version: Int): Seq[String] = {
    val (fs, _) = hfs(spark, dir)
    val mf = new org.apache.hadoop.fs.Path(s"${manifestDir(dir)}/v$version.list")
    require(fs.exists(mf), s"$dir: snapshot version $version does not exist")
    val in = fs.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  /** Commit `df` as the next snapshot version and return it. `replace =
    * false` appends (new manifest = previous files + new files); `replace =
    * true` makes the new files the whole table (compaction / overwrite) —
    * prior versions keep reading their own files untouched.
    */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      replace: Boolean = false): Int = {
    val (fs, _) = hfs(spark, dir)
    val next = currentVersion(spark, dir).getOrElse(0) + 1
    val dataRel = s"data/c$next"
    df.write.mode("overwrite").parquet(s"$dir/$dataRel")
    val fresh = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$dataRel"))
      .toSeq.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$dataRel/${st.getPath.getName}").sorted
    val carried =
      if (replace || next == 1) Seq.empty else files(spark, dir, next - 1)
    val body = (carried ++ fresh).mkString("", "\n", "\n").getBytes("UTF-8")
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    fs.mkdirs(md)
    // write-temp + atomic rename: a concurrent reader either sees the fully
    // written manifest or none at all (hidden names are never listed)
    val tmp = new org.apache.hadoop.fs.Path(md, s".v$next.list.tmp")
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    val fin = new org.apache.hadoop.fs.Path(md, s"v$next.list")
    require(fs.rename(tmp, fin), s"$dir: manifest publish rename failed for v$next")
    next
  }

  /** Read one snapshot (default: latest). Plans exactly the manifest's
    * files, so the scan count — and therefore the result — is pinned no
    * matter what lands in the table afterwards.
    */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"$dir: no published snapshots"))
    val fs = files(spark, dir, v)
    require(fs.nonEmpty, s"$dir: snapshot v$v lists no files")
    spark.read.parquet(fs.map(f => s"$dir/$f"): _*)
  }

  /** Incremental read: the rows appended between `fromVersion` (exclusive)
    * and `toVersion` (inclusive) — the storage-layer CDC feed a downstream
    * consumer tails instead of re-reading the table. Valid only across
    * append commits: a REPLACE in the range rewrites history, so file-set
    * subtraction would misreport it — that case fails loudly (a real
    * consumer must resync from a full snapshot, exactly like Iceberg's
    * incremental scan over a rewrite).
    */
  def readChanges(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    require(fromVersion < toVersion,
      s"$dir: fromVersion $fromVersion must precede toVersion $toVersion")
    val from = files(spark, dir, fromVersion).toSet
    val to = files(spark, dir, toVersion)
    require(from.subsetOf(to.toSet),
      s"$dir: a replace commit between v$fromVersion and v$toVersion rewrote " +
        "history — incremental read is undefined, resync from a snapshot")
    val fresh = to.filterNot(from)
    require(fresh.nonEmpty, s"$dir: no files appended in (v$fromVersion, v$toVersion]")
    spark.read.parquet(fresh.map(f => s"$dir/$f"): _*)
  }

  /** Expire snapshots older than `keepFrom`: their manifests are removed
    * and every data file no surviving manifest references is deleted — the
    * vacuum that bounds storage growth under replace-heavy workloads.
    * Metadata-only on the driver (file list set-difference); returns the
    * number of data files deleted. Reads pinned to expired versions fail
    * loudly afterwards, surviving versions are untouched.
    */
  def expire(spark: SparkSession, dir: String, keepFrom: Int): Int = {
    val (fs, _) = hfs(spark, dir)
    val all = versions(spark, dir)
    require(all.contains(keepFrom), s"$dir: keepFrom v$keepFrom does not exist")
    val (drop, keep) = all.partition(_ < keepFrom)
    val keepFiles = keep.flatMap(v => files(spark, dir, v)).toSet
    val orphans = drop.flatMap(v => files(spark, dir, v)).distinct
      .filterNot(keepFiles)
    orphans.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$f"), false)
    }
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${manifestDir(dir)}/v$v.list"), false)
    }
    orphans.length
  }
}

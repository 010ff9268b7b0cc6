package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table catalog over a scale-factor directory of parquet files.
  *
  * The reference (dbcut, `/root/reference/dbcut/database.py:166-211`) reflects
  * a live RDBMS via SQLAlchemy automap; graft's analogue is a directory of
  * columnar files plus declarative relationship metadata ([[graft.model.RelGraph]]).
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning.
  */
object Tables {
  /** All driver-provided test tables (TPC-H-ish star schema + pipeline tables). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** The relational (FK-linked) subset used by subset extraction. */
  val relational: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
      // parquet across driver data drops. Spark 4 refuses to map nanos to a
      // timestamp type, so keep the public legacy conf that surfaces nanos
      // as LONG and rebuild a µs TimestampType column from whichever form
      // this directory carries (exact either way — the data is µs-grained).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(sfDir, name))
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-long drop
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // TIMESTAMP_NTZ drop: wall-clock == instant (UTC sessions)
          raw.withColumn("ts", expr("cast(ts as timestamp)"))
      }
    } else spark.read.parquet(path(sfDir, name))

  /** Spread a CPU-heavy per-row derivation across the session's cores when
    * the source's file layout under-splits it. The synthetic tables are
    * single-row-group parquet files, which Spark reads as ONE task — so
    * every regex/array/hash lambda upstream of the first exchange runs on
    * one core of 32. Repartitioning costs one shuffle of the (small) raw
    * rows and unlocks full parallelism for the expensive derivation. The
    * condition makes it a no-op at warehouse scale: real multi-file,
    * multi-row-group layouts already split past the scheduler's slot
    * count, and shuffling 100 TB of raw text to "spread" it would be a
    * bug, not a fix.
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Register every table as a temp view so `spark.sql` works against the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Root directory for every persisted standing index (MinHash/SimHash
    * signatures, winnow postings, CC labels, incremental-dedup index,
    * IVF/PQ tables). These are build-once/probe-many parquet tables, so on
    * a cluster the root MUST be shared storage — a driver-local path means
    * executors write task output to their *own* local disks and the
    * driver-side read sees a torn or empty table. Resolution order:
    *
    *   1. `spark.graft.index.root` Spark conf — explicit, runtime-settable;
    *   2. `GRAFT_INDEX_ROOT` environment variable — deployment-wide;
    *   3. `<corpusDir>/_graft_index` when the corpus URI scheme is a
    *      non-local filesystem (hdfs/s3a/abfs/…): the corpus itself proves
    *      that location is shared storage, and co-locating the index with
    *      the data it derives from is the natural ingestion layout;
    *   4. `java.io.tmpdir` — the single-JVM fallback (local[*] dev/test),
    *      where driver-local IS shared. Never the default on a cluster:
    *      any non-local corpus path takes branch 3.
    *
    * Stamp keys (corpus path + per-file name:length:mtime + params) are
    * part of each index's directory name, not of the root, so overriding
    * the root never changes cache identity — it only moves the storage.
    */
  def indexRoot(spark: SparkSession, corpusDir: String): String = {
    val conf = spark.conf.getOption("spark.graft.index.root").filter(_.nonEmpty)
    val env = sys.env.get("GRAFT_INDEX_ROOT").filter(_.nonEmpty)
    conf.orElse(env).getOrElse {
      val scheme = new org.apache.hadoop.fs.Path(corpusDir).toUri.getScheme
      if (scheme != null && scheme != "file")
        s"${corpusDir.stripSuffix("/")}/_graft_index"
      else System.getProperty("java.io.tmpdir")
    }
  }

  /** Wrap a standing-index WRITE so an unwritable-root failure surfaces
    * as guidance instead of a raw Hadoop stack deep inside an index
    * build. The default root co-locates indexes at
    * `<corpusDir>/_graft_index` (branch 3 of [[indexRoot]]) on the
    * theory that the corpus's own location is shared storage — but
    * curated corpora are commonly READ-ONLY, where every first index
    * write would otherwise die with a bare permission error (or, when
    * the bucket happens to be writable, silently pollute a shared
    * dataset). Unrelated failures (task OOM, bad data) pass through
    * untouched — only permission/IO shapes are rewrapped.
    */
  def indexWrite[T](root: String)(write: => T): T =
    try write catch {
      case e: Exception if {
        val chain = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(16).toSeq
        // permission failures by TYPE anywhere in the cause chain — the
        // reliable signal, immune to message phrasing
        val typed = chain.exists {
          case _: java.nio.file.AccessDeniedException => true
          case _: java.nio.file.ReadOnlyFileSystemException => true
          case _: org.apache.hadoop.security.AccessControlException => true
          case _ => false
        }
        // untyped IO shapes (RawLocalFileSystem throws bare IOExceptions
        // like "Mkdirs failed to create <dir>") only count when the
        // message actually NAMES the index root or one of its ancestors
        // (mkdirs/permission errors commonly report the parent that
        // refused) — an unrelated task failure quoting a bad DATA path
        // that happens to contain one of these phrases must pass through
        // as itself, not as index-root guidance masking the real cause
        // match the root itself, the child names index writes actually
        // create under it ("<root>/graft_…" index dirs, "<root>/.build…"
        // temp dirs), and the root's PARENT only at an EXACT path
        // boundary. Deeper ancestor-prefix matching is deliberately
        // gone: with the default co-located layout the index root is
        // `<destDir>/_graft_index`, so an ancestor substring is also a
        // prefix of sibling DATA paths under the destination ("<dest>/
        // table.parquet/part-0") and matching it would rewrite unrelated
        // data-write failures into index-root guidance. The boundary
        // rule keeps the one legitimate ancestor shape — a mkdirs/
        // permission error quoting exactly the parent that refused
        // ("AccessDenied: <dest>") — while a sibling data path, which
        // continues with "/name", never matches. The bare root is
        // skipped only when it is a DEPTH-1 schemeless generic prefix
        // (the local default: java.io.tmpdir = "/tmp"), which would
        // match any scratch path — the child patterns keep the guidance
        // alive there.
        val rootPath = new org.apache.hadoop.fs.Path(root)
        def specific(p: org.apache.hadoop.fs.Path) = p.depth() >= 2 ||
          (p.depth() >= 1 && p.toUri.getScheme != null)
        val r = root.stripSuffix("/")
        val candidates =
          (if (specific(rootPath)) Seq(r) else Seq.empty) ++
            Seq(s"$r/graft_", s"$r/.build")
        val parentRe = Option(rootPath.getParent).filter(specific).map { p =>
          java.util.regex.Pattern.compile(
            java.util.regex.Pattern.quote(p.toString) + "(?![/\\w.-])")
        }
        val permShapes = Seq("Permission denied", "Access Denied",
          "AccessDenied", "Read-only", "read-only", "Mkdirs failed",
          "not a directory", "Not a directory")
        val scoped = chain.exists { t =>
          val msg = String.valueOf(t.getMessage)
          (candidates.exists(msg.contains) ||
            parentRe.exists(_.matcher(msg).find())) &&
            permShapes.exists(msg.contains)
        }
        typed || scoped
      } =>
        throw new IllegalStateException(
          s"cannot write a standing index under '$root' — the resolved " +
            "index root is not writable (curated corpora are often " +
            "read-only, and the default co-locates indexes at " +
            "<corpusDir>/_graft_index). Point spark.graft.index.root or " +
            "GRAFT_INDEX_ROOT at shared writable storage.", e)
    }

  /** Format-generic read — the catalog face of §2e.45. CSV reads take an
    * explicit schema when given (the only scale-safe option: schema
    * inference is an extra full pass over the files) and fall back to
    * header+inference for ad-hoc use.
    */
  def read(spark: SparkSession, path: String, format: String = "parquet",
           schema: Option[org.apache.spark.sql.types.StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r0 = spark.read.format(format).options(options)
    val r = format match {
      case "csv" => schema match {
        case Some(s) => r0.schema(s).option("header", "true")
        case None => r0.option("header", "true").option("inferSchema", "true")
      }
      case _ => schema.map(r0.schema).getOrElse(r0)
    }
    r.load(path)
  }

  /** Row count from parquet FOOTERS only — driver-side metadata reads, no
    * Spark job, no data scan. The cheap-count primitive behind the CLI's
    * `estimate` (dbcut `--estimate` reads information_schema stats,
    * `database.py:323-345`) and the LSH plane-count sizing.
    */
  def footerRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // RECURSIVE listing: a hive-partitioned table keeps its data files in
    // key=value subdirectories — a top-level-only listing would silently
    // report 0 rows for a populated table
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    if (fs.getFileStatus(p).isDirectory) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) files += it.next()
    } else files += fs.getFileStatus(p)
    files.iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Global [min, max] of a double column read from parquet footer
    * statistics only — no data scan at any table size. None when any row
    * group lacks stats for the column (caller falls back to a scan).
    */
  def footerDoubleBounds(spark: SparkSession, path: String,
                         column: String): Option[(Double, Double)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
       else Seq(fs.getFileStatus(p)))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return None
    var mn = Double.MaxValue
    var mx = Double.MinValue
    for (st <- files) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks
        val it = blocks.iterator()
        while (it.hasNext) {
          val block = it.next()
          val cit = block.getColumns.iterator()
          var found = false
          while (cit.hasNext) {
            val c = cit.next()
            if (c.getPath.toDotString == column) {
              found = true
              val s = c.getStatistics
              if (s == null || !s.hasNonNullValue) return None
              s match {
                case d: org.apache.parquet.column.statistics.DoubleStatistics =>
                  mn = math.min(mn, d.getMin)
                  mx = math.max(mx, d.getMax)
                case _ => return None
              }
            }
          }
          if (!found) return None
        }
      } finally r.close()
    }
    if (mn > mx) None else Some((mn, mx))
  }

  /** Format-generic write (csv emits a header so reads round-trip). */
  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: String = "overwrite",
            options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format(format).mode(mode).options(options)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }
}

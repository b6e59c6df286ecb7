package graft.sources

import java.io.{File, FileNotFoundException, RandomAccessFile}
import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A remote-object-store stand-in: a read-only Hadoop `FileSystem` under the
  * `mock://` scheme, backed by local files but reachable ONLY through the
  * FileSystem API — scheme resolution (`fs.mock.impl`), status/list calls,
  * and seek/positioned-read range reads, the exact seam `s3a://`/`hdfs://`
  * implementations plug into (the reference's headline is NetCDF straight
  * from S3, `README.md:8-20`). This sandbox has no object-store credentials,
  * so exercising the seam with a local-backed scheme is the honest
  * approximation: a deployment swaps the scheme and FS jar, not our code.
  *
  * Instrumented: `opens`/`seeks` count FS-level activity so tests can assert
  * that a parquet scan through `mock://` really performs RANGE reads (footer
  * seek + row-group reads), not whole-file streaming.
  */
class MockFs extends FileSystem {
  private var fsUri: URI = URI.create("mock:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create("mock:///")
    setConf(conf)
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "mock"

  private def local(f: Path): File = new File(f.toUri.getPath)

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val file = local(f)
    if (!file.isFile) throw new FileNotFoundException(f.toString)
    MockFs.opens.incrementAndGet()
    new FSDataInputStream(new MockFs.In(file))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val file = local(f)
    if (!file.exists()) throw new FileNotFoundException(f.toString)
    new FileStatus(file.length, file.isDirectory, 1, 32L * 1024 * 1024,
      file.lastModified, makeQualified(f))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val file = local(f)
    if (!file.exists()) throw new FileNotFoundException(f.toString)
    if (file.isFile) Array(getFileStatus(f))
    else file.listFiles().sortBy(_.getName)
      .map(c => getFileStatus(new Path(f, c.getName)))
  }

  private var wd: Path = new Path("mock:///")
  override def setWorkingDirectory(dir: Path): Unit = wd = dir
  override def getWorkingDirectory: Path = wd

  private def readOnly = new UnsupportedOperationException("mock:// is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = throw readOnly
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = throw readOnly
  override def rename(src: Path, dst: Path): Boolean = throw readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = throw readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = throw readOnly
}

object MockFs {
  val opens = new AtomicLong(0)
  val seeks = new AtomicLong(0)

  /** Seekable + positioned-readable stream over a local file — FSInputStream
    * derives `read(position, ...)` (the range-read entry point) from
    * seek+read, so every ranged access lands in the `seeks` counter.
    */
  private final class In(file: File) extends FSInputStream {
    private val raf = new RandomAccessFile(file, "r")
    override def seek(pos: Long): Unit = { seeks.incrementAndGet(); raf.seek(pos) }
    override def getPos: Long = raf.getFilePointer
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = raf.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int = raf.read(b, off, len)
    override def close(): Unit = raf.close()
  }

  /** Register the scheme on a session (idempotent). */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.sparkContext.hadoopConfiguration.set("fs.mock.impl", classOf[MockFs].getName)
}

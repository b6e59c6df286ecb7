package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GridFile, Hdf5, NetCdf3}
import graft.sources.Hdf5.{F32, F64, I32, WDataset}
import graft.sources.NetCdf3.{NcChar, NcDouble, NcFloat, WAttr, WVar}
import graft.multimodal.{Multimodal, Wav}

/** Adversarial-input hardening for every from-spec binary codec the engine
  * parses: a FULL read of any truncated copy of a valid container must either
  * raise an explicit error or return the complete, byte-identical result
  * (when the cut only removed bytes the format never references) — never
  * hang, never silently hand back a short or garbled payload. Checksummed
  * bit-flip corruption is covered in Hdf5Spec; this sweeps the EOF paths.
  *
  * The reference gets this robustness from mature third-party codecs
  * (NetCDF-Java CDM, `/root/reference/build.sbt:46`); the from-spec
  * replacements here have to prove it.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("codec-fuzz").resolve(name).toString

  /** ~61 evenly spaced cut points plus the final byte — enough to land in
    * every structural region (magic, header, directory, payload, tail) of
    * the KB-scale fixtures without thousands of re-reads.
    */
  private def truncations(len: Long): Seq[Long] = {
    val stride = math.max(1L, len / 61)
    ((0L until len by stride) :+ (len - 1)).distinct.filter(_ >= 0)
  }

  private def truncatedCopy(src: String, keep: Long): String = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(src))
    val dst = tmp(new java.io.File(src).getName + s".cut$keep")
    java.nio.file.Files.write(java.nio.file.Paths.get(dst),
      java.util.Arrays.copyOfRange(bytes, 0, keep.toInt))
    dst
  }

  /** Every truncation either fails loudly or reproduces the full result. */
  private def assertLoud[A](name: String, len: Long, orig: A)(read: Long => A): Unit =
    truncations(len).foreach { cut =>
      scala.util.Try(read(cut)) match {
        case scala.util.Failure(_) => // explicit error — the contract
        case scala.util.Success(got) =>
          assert(got == orig,
            s"$name: truncation to $cut of $len bytes silently returned a " +
              "wrong or partial result")
      }
    }

  // ------------------------------------------------------------ GRF1 / GRF2

  test("GRF1 container: every truncation fails loudly on a full read") {
    val p = tmp("fuzz.grf")
    GridFile.write(p, "temp", tDim = 2, yDim = 3, xDim = 4,
      epochMicros = 0L, stepMicros = 86400000000L,
      lat0 = 40.0, dlat = 0.5, lon0 = -80.0, dlon = 0.5)(
      (t, y, x) => Some(t * 100.0 + y * 10 + x))
    def fullRead(path: String): Vector[Double] = {
      val h = GridFile.readHeader(path)
      require(h.t == 2 && h.y == 3 && h.x == 4, s"$path: header dims changed")
      val r = new GridFile.SectionReader(path, h)
      try (for (t <- 0 until h.t; y <- 0 until h.y)
        yield r.readRow(t, y, 0, h.x - 1).toVector).flatten.toVector
      finally r.close()
    }
    val orig = fullRead(p)
    val len = new java.io.File(p).length()
    assertLoud("GRF1", len, orig)(cut => fullRead(truncatedCopy(p, cut)))
  }

  test("GRF2 tiled container: every truncation fails loudly on a full read") {
    val p = tmp("fuzz-tiled.grf")
    val tiles = for (ty <- 0 until 2; tx <- 0 until 2) yield {
      val cube = Array.tabulate(2 * 2 * 2)(i => ty * 1000.0 + tx * 100.0 + i)
      (ty, tx, cube)
    }
    GridFile.writeTiled(p, "temp", tDim = 2, yDim = 4, xDim = 4,
      tileY = 2, tileX = 2, epochMicros = 0L, stepMicros = 86400000000L,
      lat0 = 40.0, dlat = 0.5, lon0 = -80.0, dlon = 0.5, tiles = tiles)
    def fullRead(path: String): Vector[Double] = {
      val h = GridFile.readTiledHeader(path)
      require(h.tiles.length == 4, s"$path: tile directory changed")
      val r = new GridFile.TiledSectionReader(path, h)
      try h.tiles.toVector.flatMap { e =>
        val (y0, y1, x0, x1) = h.tileBounds(e)
        (for (t <- 0 until h.t; y <- y0 to y1)
          yield r.readRow(e, t, y, x0, x1).toVector).flatten
      } finally r.close()
    }
    val orig = fullRead(p)
    val len = new java.io.File(p).length()
    assertLoud("GRF2", len, orig)(cut => fullRead(truncatedCopy(p, cut)))
  }

  // -------------------------------------------------------------- NetCDF-3

  for (version <- Seq(1, 2, 5)) {
    test(s"NetCDF-3 CDF-$version: every truncation fails loudly on a full read") {
      val p = tmp(s"fuzz-cdf$version.nc")
      val (t, y, x) = (2, 3, 4)
      NetCdf3.write(p,
        dims = Seq("time" -> t, "lat" -> y, "lon" -> x),
        recordDim = Some("time"),
        gatts = Seq(WAttr("title", NcChar, text = "fuzz grid")),
        vars = Seq(
          WVar("time", NcDouble, Seq("time"), Nil, Array.tabulate(t)(_.toDouble)),
          WVar("lat", NcDouble, Seq("lat"), Nil, Array.tabulate(y)(40.0 + _)),
          WVar("lon", NcFloat, Seq("lon"), Nil, Array.tabulate(x)(-80.0 + _)),
          WVar("temp", NcFloat, Seq("time", "lat", "lon"),
            Seq(WAttr("units", NcChar, text = "K")),
            Array.tabulate(t * y * x)(_.toDouble))),
        version = version)
      def fullRead(path: String): Vector[Vector[Double]] = {
        val h = NetCdf3.open(path)
        h.vars.toVector.map(v => NetCdf3.readAll(h, v).toVector)
      }
      val orig = fullRead(p)
      val len = new java.io.File(p).length()
      assertLoud(s"CDF-$version", len, orig)(cut => fullRead(truncatedCopy(p, cut)))
    }
  }

  // ------------------------------------------------------------------ HDF5

  for (latest <- Seq(false, true)) {
    val tag = if (latest) "latest format" else "default format"
    test(s"HDF5 $tag: every truncation fails loudly on a full read") {
      val p = tmp(s"fuzz-${if (latest) "latest" else "v0"}.h5")
      val (t, y, x) = (2, 3, 4)
      Hdf5.write(p, Seq(
        WDataset("time", I32, Seq(t), Array.tabulate(t)(_.toDouble),
          strAttrs = Seq("CLASS" -> "DIMENSION_SCALE")),
        WDataset("lat", F64, Seq(y), Array.tabulate(y)(40.0 + _)),
        WDataset("temp", F32, Seq(t, y, x),
          Array.tabulate(t * y * x)(_.toDouble),
          strAttrs = Seq("long_name" -> "air temperature"))),
        latest = latest)
      def fullRead(path: String): Vector[(String, Vector[Double])] = {
        val h = Hdf5.open(path)
        h.datasets.toVector.map(ds => ds.name -> Hdf5.readAll(path, ds).toVector)
      }
      val orig = fullRead(p)
      val len = new java.io.File(p).length()
      assertLoud(s"HDF5 $tag", len, orig)(cut => fullRead(truncatedCopy(p, cut)))
    }
  }

  test("HDF5 multi-node structures: every truncation fails loudly on a full read") {
    // the r15 shapes in one file: a multi-node v1 chunk b-tree (classic),
    // and — in a latest twin — a split dense name index + a huge spilled
    // attribute; truncations must never misparse into silent wrong data
    val pClassic = tmp("fuzz-multinode.h5")
    val (t, y, x) = (4, 6, 8)
    Hdf5.write(pClassic, Seq(
      WDataset("temp", F32, Seq(t, y, x), Array.tabulate(t * y * x)(_.toDouble),
        chunkDims = Some(Seq(1, 2, 2)), btreeLeafK = Some(5),
        btreeInternalK = Some(3)))) // 48 chunks, 10 leaves, depth-3 tree
    val pDense = tmp("fuzz-dense.h5")
    Hdf5.write(pDense,
      (0 until 12).map(i => WDataset(f"v$i%02d", F64, Seq(2),
        Array(i.toDouble, i + 0.5),
        numAttrs =
          if (i == 0) Seq(("huge", F64, (0 until 900).map(_.toDouble))) else Nil)),
      latest = true, denseRoot = true, denseAttrs = true)
    // a depth-2 dense index twin: tiny v2 nodes force internal-over-internal
    val pDeep = tmp("fuzz-deepdense.h5")
    Hdf5.write(pDeep,
      (0 until 80).map(i => WDataset(f"w$i%02d", F64, Seq(2),
        Array(i.toDouble, i - 0.5))),
      latest = true, denseRoot = true, denseAttrs = false,
      groupInternalK = 16, denseNodeSize = 96)
    // a deep FRACTAL HEAP twin: fixture-scale doubling-table geometry, so
    // links resolve through FHIB root + child indirect blocks + many FHDBs
    val pHeap = tmp("fuzz-deepheap.h5")
    Hdf5.write(pHeap,
      (0 until 70).map(i => WDataset(f"h$i%04d", F64, Seq(2),
        Array(i.toDouble, i + 0.25))),
      latest = true, denseRoot = true, denseAttrs = false,
      groupInternalK = 16, denseNodeSize = 4096, denseIdLen = 0,
      denseHeapGeom = Some((64L, 128L)))
    // paged chunk directories: a 3-page fixed array and an extensible array
    // whose super-block 3/4 data blocks page (bitmap in the EASB) — every
    // cut must hit a signature/checksum require, never a silent fill
    val pFaPaged = tmp("fuzz-fapaged.h5")
    Hdf5.write(pFaPaged, Seq(
      WDataset("temp", F32, Seq(80, 4, 5), Array.tabulate(80 * 4 * 5)(_.toDouble),
        chunkDims = Some(Seq(2, 4, 5)), faPageBits = Some(4),
        sparseChunks = (16 until 32).toSet)), latest = true)
    val pEaPaged = tmp("fuzz-eapaged.h5")
    Hdf5.write(pEaPaged, Seq(
      WDataset("temp", F32, Seq(160, 4, 5), Array.tabulate(160 * 4 * 5)(_.toDouble),
        chunkDims = Some(Seq(2, 4, 5)), eaIndex = true, eaPageBits = Some(3),
        sparseChunks = (72 until 80).toSet,
        maxDims = Some(Seq(-1L, 4L, 5L)))), latest = true)
    for (p <- Seq(pClassic, pDense, pDeep, pHeap, pFaPaged, pEaPaged)) {
      def fullRead(path: String): Vector[(String, Vector[Double], Int)] = {
        val h = Hdf5.open(path)
        h.datasets.toVector.map(ds =>
          (ds.name, Hdf5.readAll(path, ds).toVector, ds.attrs.length))
      }
      val orig = fullRead(p)
      val len = new java.io.File(p).length()
      assertLoud(s"HDF5 multi-node $p", len, orig)(cut => fullRead(truncatedCopy(p, cut)))
    }
  }

  test("HDF5 links + filtered extended-tiny heap: every truncation fails loudly") {
    // the round's new shapes in one file: a FILTERED (deflate level-0)
    // dense root heap with extended tiny IDs (idLen 24), a soft link, and
    // an external link into a sibling file. Truncated copies land NEXT TO
    // the target so the external resolution itself stays valid — cuts must
    // fail in the structure, never silently misread through it.
    val dir = java.nio.file.Files.createTempDirectory("codec-fuzz-links")
    val bp = dir.resolve("target.h5").toString
    Hdf5.write(bp, Seq(
      WDataset("remote", F64, Seq(3), Array(7.0, 8.0, 9.0))), latest = true)
    val p = dir.resolve("fuzz-links.h5").toString
    Hdf5.write(p, (0 until 6).map(i =>
      WDataset(s"v$i", F64, Seq(2), Array(i.toDouble, i + 0.5))),
      latest = true, denseRoot = true, denseAttrs = false,
      groupInternalK = 16, denseNodeSize = 4096, denseIdLen = 24,
      denseHeapGeom = None,
      links = Seq(Hdf5.WSoftLink("alias", "/v3"),
        Hdf5.WExternalLink("far", "target.h5", "/remote")),
      denseHeapFilter = true)
    def fullRead(path: String): Vector[(String, Vector[Double])] = {
      val h = Hdf5.open(path)
      h.datasets.toVector.map(ds => ds.name -> Hdf5.readAll(path, ds).toVector)
    }
    val orig = fullRead(p)
    assert(orig.map(_._1) ==
      Vector("alias", "far", "v0", "v1", "v2", "v3", "v4", "v5"))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    truncations(bytes.length.toLong).foreach { cut =>
      val dst = dir.resolve(s"cut$cut.h5")
      java.nio.file.Files.write(dst,
        java.util.Arrays.copyOfRange(bytes, 0, cut.toInt))
      scala.util.Try(fullRead(dst.toString)) match {
        case scala.util.Failure(_) => // explicit error — the contract
        case scala.util.Success(got) =>
          assert(got == orig, s"links+filtered: truncation to $cut of " +
            s"${bytes.length} bytes silently returned a wrong result")
      }
    }
  }

  test("HDF5 latest format: every superblock byte-flip is caught or harmless") {
    // the latest-format metadata is Jenkins-lookup3 checksummed; flipping
    // any single byte of the superblock (incl. its checksum field) must
    // either fail loudly or — if the byte is genuinely unreferenced —
    // reproduce the full result. No flip may yield a DIFFERENT result.
    val p = tmp("flip.h5")
    Hdf5.write(p, Seq(
      WDataset("temp", F32, Seq(2, 3), Array.tabulate(6)(_.toDouble))),
      latest = true)
    def fullRead(path: String): Vector[Double] = {
      val h = Hdf5.open(path)
      Hdf5.readAll(path, h.datasets.head).toVector
    }
    val orig = fullRead(p)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // superblock v3 = 48 bytes at offset 0 (sig 8 + fields + checksum)
    (0 until 48).foreach { i =>
      val mutated = bytes.clone(); mutated(i) = (mutated(i) ^ 0x5A).toByte
      val mp = tmp(s"flip$i.h5")
      java.nio.file.Files.write(java.nio.file.Paths.get(mp), mutated)
      scala.util.Try(fullRead(mp)) match {
        case scala.util.Failure(_) => // caught — the checksum's job
        case scala.util.Success(got) =>
          assert(got == orig, s"flip at byte $i changed the result silently")
      }
    }
  }

  // --------------------------------------------- in-memory payload codecs

  test("PNG payload: every truncation fails loudly through the real decoder") {
    val px = Array.tabulate(8 * 6)(i => i * 7 % 251)
    val bytes = graft.render.Png.encode(8, 6, px)
    val orig = Multimodal.ImageDecoder.decode(1L, bytes)
    assertLoud("PNG", bytes.length.toLong, orig)(cut =>
      Multimodal.ImageDecoder.decode(1L, java.util.Arrays.copyOfRange(bytes, 0, cut.toInt)))
  }

  test("PNG resize: every truncation fails loudly through the thumbnail path") {
    val px = Array.tabulate(8 * 6)(i => i * 7 % 251)
    val bytes = graft.render.Png.encode(8, 6, px)
    val orig = Multimodal.boxThumb(1L, bytes, 4, 4)
    assert(orig.thumb_csv.split(",").length == 16)
    assertLoud("PNG-resize", bytes.length.toLong, orig)(cut =>
      Multimodal.boxThumb(1L, java.util.Arrays.copyOfRange(bytes, 0, cut.toInt), 4, 4))
  }

  test("WAV payload: every truncation fails loudly through the JDK decoder") {
    val samples = Array.tabulate(300)(i => (math.sin(i * 0.1) * 12000).toShort)
    val bytes = Wav.encode(8000, samples)
    val orig = Multimodal.AudioDecoder.decode(1L, bytes)
    assert(orig.n_samples == 300)
    assertLoud("WAV", bytes.length.toLong, orig)(cut =>
      Multimodal.AudioDecoder.decode(1L, java.util.Arrays.copyOfRange(bytes, 0, cut.toInt)))
  }

  test("GFV1 payload: every truncation fails loudly at index or frame decode") {
    val frames = (0 until 4).map { f =>
      graft.render.Png.encode(6, 4, Array.tabulate(24)(i => (f * 17 + i * 7) % 251))
    }
    val bytes = Multimodal.Gfv.encode(frames)
    def fullRead(b: Array[Byte]): Vector[Multimodal.DecodedImage] =
      Multimodal.Gfv.index(b).toVector.zipWithIndex.map { case ((off, len), fi) =>
        Multimodal.ImageDecoder.decode(fi.toLong,
          java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len))
      }
    val orig = fullRead(bytes)
    assertLoud("GFV1", bytes.length.toLong, orig)(cut =>
      fullRead(java.util.Arrays.copyOfRange(bytes, 0, cut.toInt)))
  }
}

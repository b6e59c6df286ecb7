package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NetCdf3
import graft.sources.NetCdf3._

/** Byte-level codec tests for the pure-JVM NetCDF-3 classic reader/writer:
  * header roundtrip, fixed vs record (unlimited-dim) data layouts, CDF-1 vs
  * CDF-2 offsets, attribute typing, section reads vs whole reads.
  */
class NetCdfSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-nc").resolve(name).toString

  private val T = 3; private val Y = 4; private val X = 5

  private def cube(f: (Int, Int, Int) => Double): Array[Double] =
    Array.tabulate(T * Y * X)(i => f(i / (Y * X), (i / X) % Y, i % X))

  private def writeGrid(path: String, record: Boolean, version: Int = 1): Unit = {
    val data = cube((t, y, x) => if ((t + y + x) % 7 == 0) -999.0 else t * 100.0 + y * 10 + x)
    NetCdf3.write(path,
      dims = Seq("time" -> T, "lat" -> Y, "lon" -> X),
      recordDim = if (record) Some("time") else None,
      gatts = Seq(WAttr("title", NcChar, text = "graft test grid")),
      vars = Seq(
        WVar("time", NcInt, Seq("time"),
          Seq(WAttr("units", NcChar, text = "days since 1990-01-01")),
          Array.tabulate(T)(_.toDouble)),
        WVar("lat", NcDouble, Seq("lat"),
          Seq(WAttr("long_name", NcChar, text = "latitude")),
          Array.tabulate(Y)(44.0 + _ * 0.05)),
        WVar("lon", NcDouble, Seq("lon"), Nil,
          Array.tabulate(X)(-80.0 + _ * 0.05)),
        WVar("temp", NcFloat, Seq("time", "lat", "lon"),
          Seq(WAttr("_FillValue", NcFloat, nums = Seq(-999.0)),
            WAttr("long_name", NcChar, text = "air temperature")),
          data)),
      version = version)
  }

  for (record <- Seq(false, true); version <- Seq(1, 2, 5)) {
    val tag = s"${if (record) "record" else "fixed"} layout, CDF-$version"
    test(s"roundtrip: $tag") {
      val p = tmp(s"grid.nc")
      writeGrid(p, record, version)
      val h = NetCdf3.open(p)
      assert(h.version == version)
      assert(h.dims.map(_.name) == Seq("time", "lat", "lon"))
      if (record) {
        assert(h.dims.head.isRecord && h.numRecs == T)
      } else assert(h.dims.map(_.size) == Seq(T, Y, X))
      assert(h.gatts.exists(a => a.name == "title" && a.valueString == "graft test grid"))
      val temp = h.variable("temp").get
      assert(temp.attr("_FillValue").flatMap(_.firstNum).contains(-999.0))
      assert(temp.attr("long_name").map(_.valueString).contains("air temperature"))
      // coords roundtrip exactly (doubles) / widened (ints)
      assert(NetCdf3.readAll(h, h.variable("lat").get).toSeq ==
        Seq.tabulate(Y)(44.0 + _ * 0.05))
      assert(NetCdf3.readAll(h, h.variable("time").get).toSeq ==
        Seq.tabulate(T)(_.toDouble))
      // whole-cube read matches the closed form (floats hold these exactly)
      val expect = cube((t, y, x) => if ((t + y + x) % 7 == 0) -999.0 else t * 100.0 + y * 10 + x)
      assert(NetCdf3.readAll(h, temp).toSeq == expect.toSeq)
    }

    test(s"section read matches whole read: $tag") {
      val p = tmp("grid.nc")
      writeGrid(p, record, version)
      val h = NetCdf3.open(p)
      val temp = h.variable("temp").get
      val all = NetCdf3.readAll(h, temp)
      val rdr = new NetCdf3.SectionReader(h, temp)
      try {
        for (t <- 0 until T; y <- 0 until Y) {
          val row = rdr.readRow(t, y, 1, X - 2)
          val expect = (1 to X - 2).map(x => all((t * Y + y) * X + x))
          assert(row.toSeq == expect, s"t=$t y=$y")
        }
      } finally rdr.close()
    }
  }

  test("two record variables interleave correctly (time coord + data)") {
    // the record-layout grid above has exactly this shape; additionally check
    // the time coord reads right from interleaved records
    val p = tmp("grid.nc")
    writeGrid(p, record = true)
    val h = NetCdf3.open(p)
    assert(h.isRecordVar(h.variable("time").get))
    assert(h.isRecordVar(h.variable("temp").get))
    assert(h.recSize > 0)
    assert(NetCdf3.readAll(h, h.variable("time").get).toSeq == Seq(0.0, 1.0, 2.0))
  }

  test("non-classic magic is rejected loudly") {
    val p = tmp("bad.nc")
    val out = new java.io.FileOutputStream(p)
    out.write(Array[Byte](0x89.toByte, 'H', 'D', 'F')) // HDF5 (NetCDF-4) magic
    out.write(new Array[Byte](64))
    out.close()
    val e = intercept[IllegalArgumentException](NetCdf3.open(p))
    assert(e.getMessage.contains("magic"))
  }

  test("property: random dims/types/layouts round-trip bit-exactly") {
    import org.scalacheck.Gen
    val genCase = for {
      t <- Gen.choose(1, 5); y <- Gen.choose(1, 7); x <- Gen.choose(1, 9)
      record <- Gen.oneOf(true, false)
      version <- Gen.oneOf(1, 2, 5)
      ncType <- Gen.oneOf(NcByte, NcShort, NcInt, NcFloat, NcDouble,
        NcUByte, NcUShort, NcUInt, NcInt64, NcUInt64)
      seed <- Gen.choose(0L, 1000000L)
    } yield (t, y, x, record, version, ncType, seed)
    (1 to 25).foreach { i =>
      val (t, y, x, record, version, ncType, seed) = genCase.sample.get
      val rnd = new scala.util.Random(seed)
      val unsigned = Set(NcUByte, NcUShort, NcUInt, NcUInt64).contains(ncType)
      // values within every type's exact range (byte: ±127; unsigned: >= 0)
      val data = Array.fill(t * y * x)(
        if (unsigned) rnd.nextInt(200).toDouble else rnd.nextInt(200) - 100.0)
      val p = tmp(s"prop$i.nc")
      NetCdf3.write(p,
        dims = Seq("time" -> t, "yy" -> y, "xx" -> x),
        recordDim = if (record) Some("time") else None,
        gatts = Nil,
        vars = Seq(
          WVar("time", NcInt, Seq("time"),
            Seq(WAttr("units", NcChar, text = "days since 2001-01-01")),
            Array.tabulate(t)(_.toDouble)),
          WVar("v", ncType, Seq("time", "yy", "xx"), Nil, data)),
        version = version)
      val h = NetCdf3.open(p)
      val v = h.variable("v").get
      assert(NetCdf3.readAll(h, v).toSeq == data.toSeq,
        s"case $i: t=$t y=$y x=$x record=$record v$version type=$ncType seed=$seed")
      // a random section row agrees with the whole read
      val rdr = new NetCdf3.SectionReader(h, v)
      try {
        val (st, sy) = (rnd.nextInt(t), rnd.nextInt(y))
        val (x0, x1) = { val a = rnd.nextInt(x); val b = rnd.nextInt(x)
          (math.min(a, b), math.max(a, b)) }
        val row = rdr.readRow(st, sy, x0, x1)
        assert(row.toSeq == (x0 to x1).map(xx => data((st * y + sy) * x + xx)),
          s"case $i section t=$st y=$sy x=[$x0,$x1]")
      } finally rdr.close()
    }
  }

  test("CDF-5 round-trips unsigned/64-bit extremes exactly") {
    val p = tmp("cdf5.nc")
    // every value here is exactly representable as an IEEE double, so the
    // widen-to-double read path must return it bit-exactly
    val cases = Seq(
      ("ub", NcUByte, Array(0.0, 127.0, 255.0)),
      ("us", NcUShort, Array(0.0, 32767.0, 65535.0)),
      ("ui", NcUInt, Array(0.0, 2147483647.0, 4294967295.0)),
      ("i8", NcInt64, Array(-9007199254740992.0, -1.0, 9007199254740992.0)),
      // 2^63 and 10^19 exercise the above-Long.MaxValue unsigned half
      ("u8", NcUInt64, Array(0.0, 9.223372036854776E18, 1.0E19)))
    NetCdf3.write(p,
      dims = Seq("d" -> 3), recordDim = None,
      gatts = Seq(WAttr("big", NcInt64, nums = Seq(1.2345678901234E13))),
      vars = cases.map { case (n, t, d) => WVar(n, t, Seq("d"), Nil, d) },
      version = 5)
    val h = NetCdf3.open(p)
    assert(h.version == 5)
    assert(h.gatts.find(_.name == "big").get.nums == Seq(1.2345678901234E13))
    cases.foreach { case (n, _, d) =>
      assert(NetCdf3.readAll(h, h.variable(n).get).toSeq == d.toSeq, n)
    }
  }

  test("classic versions reject CDF-5-only field widths loudly") {
    // a vsize past 32 bits must fail in CDF-1/2 and succeed as CDF-5 layout
    val e = intercept[IllegalArgumentException] {
      NetCdf3.write(tmp("wide.nc"),
        dims = Seq("d" -> 1), recordDim = None, gatts = Nil,
        vars = Seq(WVar("v", NcInt, Seq("d"), Nil, Array(1.0))), version = 3)
    }
    assert(e.getMessage.contains("unsupported write version"))
  }

  test("short/byte attribute values respect 4-byte padding") {
    val p = tmp("pad.nc")
    NetCdf3.write(p,
      dims = Seq("d" -> 2), recordDim = None,
      gatts = Seq(
        WAttr("s", NcShort, nums = Seq(7.0)), // 2 raw bytes -> padded to 4
        WAttr("b", NcByte, nums = Seq(1.0, 2.0, 3.0))), // 3 -> padded to 4
      vars = Seq(WVar("v", NcInt, Seq("d"), Nil, Array(10.0, 20.0))))
    val h = NetCdf3.open(p)
    assert(h.gatts.find(_.name == "s").get.nums == Seq(7.0))
    assert(h.gatts.find(_.name == "b").get.nums == Seq(1.0, 2.0, 3.0))
    assert(NetCdf3.readAll(h, h.variable("v").get).toSeq == Seq(10.0, 20.0))
  }
}

package graft.sources

/** Container-neutral NetCDF surface: ONE set of header/read primitives over
  * both on-disk containers — the classic format ([[NetCdf3]], `CDF\x0{1,2,5}`
  * magic) and the HDF5-based NetCDF-4 subset ([[Hdf5]], `\x89HDF` magic).
  * `open` sniffs the magic per file, so a directory may mix containers and
  * still form one grid table — which is exactly what long-lived climate
  * archives look like after a format migration (the reference reads both
  * transparently through NetCDF-Java's CDM, `/root/reference/build.sbt:46`).
  *
  * The facade resolves container-specific structure up front (record
  * dimensions to their realized size, HDF5 `DIMENSION_LIST` references to
  * dimension names) so the grid layer above reasons only in terms of named,
  * sized dimensions.
  */
object NcIo {

  final case class NcAttr(name: String, text: String, nums: Seq[Double]) {
    def valueString: String = if (text != null) text else nums.mkString(",")
    def firstNum: Option[Double] = nums.headOption
  }

  /** A variable with RESOLVED dimensions (record dims already sized). */
  final case class NcVar(name: String, dimNames: Seq[String],
      dimSizes: Seq[Int], attrs: Seq[NcAttr]) {
    def attr(n: String): Option[NcAttr] = attrs.find(_.name == n)
  }

  trait RowReader extends AutoCloseable {
    def readRow(t: Int, y: Int, x0: Int, x1: Int): Array[Double]
  }

  trait NcHandle {
    def path: String
    def vars: Seq[NcVar]
    def gatts: Seq[NcAttr]
    def variable(n: String): Option[NcVar] = vars.find(_.name == n)
    def readAll(v: NcVar): Array[Double]
    def rowReader(v: NcVar): RowReader
  }

  def open(path: String): NcHandle =
    if (Hdf5.isHdf5(path)) new H5Handle(path) else new ClassicHandle(path)

  // ------------------------------------------------------------- classic

  private final class ClassicHandle(val path: String) extends NcHandle {
    private val h = NetCdf3.open(path)

    private def toAttr(a: NetCdf3.Attr): NcAttr =
      NcAttr(a.name, if (a.ncType == NetCdf3.NcChar) a.text else null, a.nums)

    val vars: Seq[NcVar] = h.vars.map { v =>
      val dims = h.dimsOf(v)
      NcVar(v.name, dims.map(_.name),
        dims.map(d => if (d.isRecord) h.numRecs else d.size),
        v.attrs.map(toAttr))
    }
    val gatts: Seq[NcAttr] = h.gatts.map(toAttr)

    def readAll(v: NcVar): Array[Double] =
      NetCdf3.readAll(h, h.variable(v.name).get)

    def rowReader(v: NcVar): RowReader = new RowReader {
      private val r = new NetCdf3.SectionReader(h, h.variable(v.name).get)
      def readRow(t: Int, y: Int, x0: Int, x1: Int): Array[Double] =
        r.readRow(t, y, x0, x1)
      def close(): Unit = r.close()
    }
  }

  // ------------------------------------------------------------- netcdf-4

  private final class H5Handle(val path: String) extends NcHandle {
    private val f = Hdf5.open(path)

    private def isDimScale(d: Hdf5.H5Dataset): Boolean =
      d.attr("CLASS").exists(_.value == Hdf5.StrAttr("DIMENSION_SCALE"))

    private def toAttr(a: Hdf5.H5Attr): NcAttr = a.value match {
      case Hdf5.StrAttr(s) => NcAttr(a.name, s, Nil)
      case Hdf5.NumAttr(n) => NcAttr(a.name, null, n)
      case Hdf5.RefListAttr(lists) =>
        NcAttr(a.name, lists.map(_.mkString(",")).mkString(" "), Nil)
    }

    /** NetCDF-4 hides the dimension-machinery attrs; so do we. */
    private def visible(a: Hdf5.H5Attr): Boolean =
      !Set("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
        "_Netcdf4Dimid", "_Netcdf4Coordinates").contains(a.name)

    val vars: Seq[NcVar] = f.datasets.map { d =>
      val dimNames: Seq[String] =
        if (isDimScale(d)) Seq(d.name) // a coordinate variable spans itself
        else d.attr("DIMENSION_LIST").map(_.value) match {
          case Some(Hdf5.RefListAttr(lists)) => lists.map {
            case Seq(one) => one
            case l => throw new IllegalArgumentException(
              s"$path: ${d.name}: multi-reference dimension entry $l unsupported")
          }
          case _ if d.dims.length == 1 => Seq(d.name) // plain 1-D: self-named
          case _ => throw new IllegalArgumentException(
            s"$path: ${d.name}: no DIMENSION_LIST attribute; cannot resolve dimensions")
        }
      NcVar(d.name, dimNames, d.dims.map(_.toInt),
        d.attrs.filter(visible).map(toAttr))
    }
    val gatts: Seq[NcAttr] = f.rootAttrs.filter(visible).map(toAttr)

    def readAll(v: NcVar): Array[Double] =
      Hdf5.readAll(path, f.dataset(v.name).get)

    def rowReader(v: NcVar): RowReader = new RowReader {
      private val r = new Hdf5.SectionReader(path, f.dataset(v.name).get)
      def readRow(t: Int, y: Int, x0: Int, x1: Int): Array[Double] =
        r.readRow(t, y, x0, x1)
      def close(): Unit = r.close()
    }
  }
}

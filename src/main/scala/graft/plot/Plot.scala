package graft.plot

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Base64

import graft.core.Table

/** Plot bridge — the reference's chart surface re-expressed as a
  * dependency-free driver-side SVG renderer.
  *
  * The reference renders through an embedded matplotlib/seaborn
  * (src/Plot/Matplotlib.luna:1-966, native_libs/plotter/Matplotlib/
  * Plot.cpp:1-257): every plot call collects the column(s) to the driver
  * and hands them to a raster backend. This engine keeps exactly that
  * contract — plotting is a PREVIEW operation over a bounded collect
  * (like `toList`/`toText`, Table.luna's 1000-row display cap), never a
  * distributed job — but renders vector SVG with JVM built-ins instead of
  * embedding CPython. Surface parity (Matplotlib.luna):
  *  - `plot s1 s2 style label color alpha` (:18-31) -> [[Plots.plot]] with
  *    matplotlib-style strings ("o", "-", "--", "o-");
  *  - `scatter` (:24) -> [[Plots.scatter]];
  *  - `histogram data bins` (:18) -> [[Plots.histogram]] (default 10 bins,
  *    equal width, like the reference's docs);
  *  - `kdeplot s label` (:33) -> [[Plots.kde]] (gaussian kernel, Scott's
  *    bandwidth — seaborn's default);
  *  - `kdeplot2 s1 s2` (:37) -> [[Plots.kde2]] (2-D grid density);
  *  - `heatmap` (:41) -> [[Plots.heatmap]] (2-D binned counts, optional
  *    count annotations — seaborn-heatmap role);
  *  - `fillBetween s1 s2 s3` (:46) -> [[Plots.fillBetween]];
  *  - `plotDate s1 s2` (:21) -> [[Plots.plotDate]] (date-formatted x axis);
  *  - chart composition `+` (Chart.+, :80-84) -> [[Chart.+]] (series
  *    overlay on shared axes);
  *  - `verticalLayout list` (:68-76) -> [[Chart.verticalLayout]];
  *  - `write w h fname` (:120) -> [[Chart.write]] (SVG; the format this
  *    backend renders — requesting a raster extension throws, mirroring
  *    the reference's unsupported-extension error);
  *  - `toJSON` data-url (:125-130) -> [[Chart.toDataUrl]].
  *
  * 100 TB note: a chart of 10^11 rows is meaningless pixels; the honest
  * scale path is aggregate-then-plot (histogram/heatmap/kde of a
  * `groupBy` or [[graft.operators.Stats.equiDepthBins]] result). The raw
  * scatter/line entry points therefore cap the collect at [[Plots.MaxPoints]]
  * rows and throw past it, pointing at the aggregation path.
  */
sealed trait Layer {
  def xs: Array[Double]
  def ys: Array[Double]
  def label: Option[String]
}
final case class ScatterL(xs: Array[Double], ys: Array[Double],
    label: Option[String] = None, color: Option[String] = None,
    alpha: Double = 1.0) extends Layer
final case class LineL(xs: Array[Double], ys: Array[Double],
    dashed: Boolean = false, markers: Boolean = false,
    label: Option[String] = None, color: Option[String] = None,
    alpha: Double = 1.0) extends Layer
/** Histogram bars: edges has counts.length+1 entries. */
final case class BarsL(edges: Array[Double], counts: Array[Long]) extends Layer {
  def xs: Array[Double] = edges
  def ys: Array[Double] = counts.map(_.toDouble)
  def label: Option[String] = None
}
final case class AreaL(xs: Array[Double], lo: Array[Double], hi: Array[Double],
    label: Option[String] = None, color: Option[String] = None,
    alpha: Double = 0.35) extends Layer {
  def ys: Array[Double] = lo ++ hi
}
/** 2-D binned grid: counts(iy)(ix) over xEdges × yEdges. */
final case class GridL(xEdges: Array[Double], yEdges: Array[Double],
    counts: Array[Array[Double]], annot: Boolean = false) extends Layer {
  def xs: Array[Double] = xEdges
  def ys: Array[Double] = yEdges
  def label: Option[String] = None
}

/** A renderable chart: layers sharing one pair of axes. `+` overlays
  * (reference Chart.+ — each operand adds its series to one figure). */
final case class Chart(layers: Seq[Layer], dateX: Boolean = false,
    xLab: String = "", yLab: String = "") {
  def +(that: Chart): Chart =
    Chart(layers ++ that.layers, dateX || that.dateX,
      if (xLab.nonEmpty) xLab else that.xLab,
      if (yLab.nonEmpty) yLab else that.yLab)

  def renderSvg(w: Int = 640, h: Int = 480): String = {
    require(w > 0 && h > 0, s"plot: width/height must be positive ($w x $h)")
    Svg.figure(Seq(this), w, h)
  }

  /** Reference Chart.write: extension picks the format; this backend
    * renders SVG (vector — scales to any DPI; the reference's list of
    * raster formats is matplotlib's, not a semantic of the charts). */
  def write(w: Int, h: Int, fname: String): Unit = {
    require(fname.endsWith(".svg"),
      s"plot write: unsupported image format '$fname' — this backend renders .svg")
    Files.write(Paths.get(fname), renderSvg(w, h).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Reference `toJSON`'s data-url payload (Matplotlib.luna:125-130). */
  def toDataUrl(w: Int = 640, h: Int = 480): String =
    "data:image/svg+xml;base64," +
      Base64.getEncoder.encodeToString(renderSvg(w, h).getBytes(StandardCharsets.UTF_8))
}

object Chart {
  /** Reference `verticalLayout` (Matplotlib.luna:68-76): subplots stacked
    * vertically in one figure. */
  def verticalLayout(charts: Seq[Chart], w: Int = 640, hEach: Int = 320): String = {
    require(charts.nonEmpty, "verticalLayout: no charts")
    Svg.figure(charts, w, hEach * charts.size)
  }
}

object Plots {
  /** Raw-point cap for scatter/line collects; past this, aggregate first
    * (histogram/heatmap/groupBy) — plotting more points than pixels is
    * wasted work at any scale. */
  val MaxPoints = 100000

  private def numeric(t: Table, c: String): Array[Double] = {
    val rows = t.df.select(c).limit(MaxPoints + 1).collect()
    require(rows.length <= MaxPoints,
      s"plot: column '$c' exceeds $MaxPoints points; aggregate first " +
        "(histogram/heatmap/equiDepthBins), then plot the aggregate")
    rows.iterator.collect {
      case r if !r.isNullAt(0) => r.get(0) match {
        case n: Number => n.doubleValue()
        case ts: java.sql.Timestamp => ts.getTime.toDouble
        case d: java.sql.Date => d.getTime.toDouble
        case other => throw new IllegalArgumentException(
          s"plot: column '$c' is not numeric (${other.getClass.getSimpleName})")
      }
    }.toArray
  }

  /** Paired x/y collect dropping rows where either side is null (the
    * reference's matplotlib call would raise on ragged series). */
  private def pairs(t: Table, x: String, y: String): (Array[Double], Array[Double]) = {
    val rows = t.df.select(x, y).limit(MaxPoints + 1).collect()
    require(rows.length <= MaxPoints,
      s"plot: ($x,$y) exceeds $MaxPoints points; aggregate first")
    val xs = Array.newBuilder[Double]; val ys = Array.newBuilder[Double]
    rows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        def d(i: Int): Double = r.get(i) match {
          case n: Number => n.doubleValue()
          case ts: java.sql.Timestamp => ts.getTime.toDouble
          case dt: java.sql.Date => dt.getTime.toDouble
          case other => throw new IllegalArgumentException(
            s"plot: non-numeric value ($other)")
        }
        xs += d(0); ys += d(1)
      }
    }
    (xs.result(), ys.result())
  }

  /** table.plot x y — default marker style "o" (Table.luna:1683-1686). */
  def plot(t: Table, x: String, y: String, style: String = "o",
      label: Option[String] = None, color: Option[String] = None,
      alpha: Double = 1.0): Chart = {
    val (xs, ys) = pairs(t, x, y)
    val layer = style match {
      case "o" => ScatterL(xs, ys, label, color, alpha)
      case "-" => LineL(xs, ys, dashed = false, markers = false, label, color, alpha)
      case "--" => LineL(xs, ys, dashed = true, markers = false, label, color, alpha)
      case "o-" | "-o" => LineL(xs, ys, dashed = false, markers = true, label, color, alpha)
      case other => throw new IllegalArgumentException(
        s"plot: unsupported style '$other' (supported: o, -, --, o-)")
    }
    Chart(Seq(layer), xLab = x, yLab = y)
  }

  def scatter(t: Table, x: String, y: String): Chart = plot(t, x, y, "o")

  /** Line plot with date-formatted x axis (Matplotlib.luna:21-22). */
  def plotDate(t: Table, x: String, y: String): Chart = {
    val (xs, ys) = pairs(t, x, y)
    Chart(Seq(LineL(xs, ys, markers = true)), dateX = true, xLab = x, yLab = y)
  }

  /** Equal-width histogram, default 10 bins (reference setBins docs). The
    * count pass runs DISTRIBUTED (groupBy on the bin id — the scale path);
    * only `bins` rows reach the driver. */
  def histogram(t: Table, c: String, bins: Int = 10): Chart = {
    require(bins > 0, s"histogram: bins must be positive ($bins)")
    import org.apache.spark.sql.functions._
    val mm = t.df.select(min(col(c).cast("double")).as("lo"),
      max(col(c).cast("double")).as("hi")).collect()(0)
    require(!mm.isNullAt(0), s"histogram: column '$c' has no values")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    val counts = t.df.select(col(c).cast("double").as("v")).where(col("v").isNotNull)
      .select(least(floor((col("v") - lit(lo)) / lit(width)), lit(bins - 1)).cast("int").as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val edges = Array.tabulate(bins + 1)(i => lo + i * width)
    Chart(Seq(BarsL(edges, Array.tabulate(bins)(i => counts.getOrElse(i, 0L)))),
      xLab = c, yLab = "count")
  }

  /** Gaussian KDE over a 200-point grid, Scott's-rule bandwidth (seaborn
    * kdeplot default). Collects the column (preview-capped). */
  def kde(t: Table, c: String, label: Option[String] = None): Chart = {
    val v = numeric(t, c)
    require(v.length >= 2, s"kde: need >=2 values in '$c'")
    val n = v.length
    val mean = v.sum / n
    val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / n)
    val bw = math.max(1e-12, 1.06 * sd * math.pow(n.toDouble, -0.2))
    val lo = v.min - 3 * bw; val hi = v.max + 3 * bw
    val grid = Array.tabulate(200)(i => lo + (hi - lo) * i / 199.0)
    val dens = grid.map { g =>
      v.map { x => val u = (g - x) / bw; math.exp(-0.5 * u * u) }.sum /
        (n * bw * math.sqrt(2 * math.Pi))
    }
    Chart(Seq(LineL(grid, dens, label = label)), xLab = c, yLab = "density")
  }

  /** 2-D KDE rendered as a binned density grid (kdeplot2's contour role on
    * a raster grid; the count pass is distributed like histogram's). */
  def kde2(t: Table, x: String, y: String, bins: Int = 40): Chart =
    grid2d(t, x, y, bins, annot = false, xLab = x, yLab = y)

  /** seaborn-heatmap role: 2-D binned counts, optional annotations. */
  def heatmap(t: Table, x: String, y: String, bins: Int = 20,
      annot: Boolean = false): Chart =
    grid2d(t, x, y, bins, annot, xLab = x, yLab = y)

  private def grid2d(t: Table, x: String, y: String, bins: Int,
      annot: Boolean, xLab: String, yLab: String): Chart = {
    require(bins > 0 && bins <= 200, s"grid: bins out of range ($bins)")
    import org.apache.spark.sql.functions._
    val mm = t.df.select(
      min(col(x).cast("double")), max(col(x).cast("double")),
      min(col(y).cast("double")), max(col(y).cast("double"))).collect()(0)
    require(!mm.isNullAt(0) && !mm.isNullAt(2), s"heatmap: no values in ($x,$y)")
    val (xlo, xhi, ylo, yhi) = (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val xw = if (xhi > xlo) (xhi - xlo) / bins else 1.0
    val yw = if (yhi > ylo) (yhi - ylo) / bins else 1.0
    val cells = t.df
      .select(col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .select(
        least(floor((col("x") - lit(xlo)) / lit(xw)), lit(bins - 1)).cast("int").as("bx"),
        least(floor((col("y") - lit(ylo)) / lit(yw)), lit(bins - 1)).cast("int").as("by"))
      .groupBy("bx", "by").count().collect()
    val g = Array.fill(bins, bins)(0.0)
    cells.foreach(r => g(r.getInt(1))(r.getInt(0)) = r.getLong(2).toDouble)
    Chart(Seq(GridL(Array.tabulate(bins + 1)(xlo + _ * xw),
      Array.tabulate(bins + 1)(ylo + _ * yw), g, annot)), xLab = xLab, yLab = yLab)
  }

  /** fillBetween x lo hi (Matplotlib.luna:46-49). */
  def fillBetween(t: Table, x: String, lo: String, hi: String,
      label: Option[String] = None, color: Option[String] = None,
      alpha: Double = 0.35): Chart = {
    import org.apache.spark.sql.functions.col
    val rows = t.df.select(col(x).cast("double"), col(lo).cast("double"),
      col(hi).cast("double")).limit(MaxPoints + 1).collect()
    require(rows.length <= MaxPoints, s"fillBetween: exceeds $MaxPoints points")
    val keep = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .sortBy(_.getDouble(0))
    Chart(Seq(AreaL(keep.map(_.getDouble(0)), keep.map(_.getDouble(1)),
      keep.map(_.getDouble(2)), label, color, alpha)), xLab = x)
  }
}

/** Minimal deterministic SVG backend: margins, 1-2-5 "nice" ticks, the
  * matplotlib C0..C9 default color cycle, a legend when labels exist. */
private[plot] object Svg {
  private val Cycle = Array("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
    "#9467bd", "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

  /** Labels come from column names / user strings — a bare '&' or '<'
    * makes the SVG ill-formed XML (and the data-url form injectable). */
  private def escXml(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case c => c.toString
  }

  private def fmt(v: Double): String = {
    val s =
      if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
      else {
        // Locale.ROOT (a comma decimal point corrupts SVG path data), and
        // strip trailing zeros from the MANTISSA only — a blanket reverse
        // dropWhile would eat the zeros of "2.5e-10"'s exponent
        val g = String.format(java.util.Locale.ROOT, "%.6g", Double.box(v))
        val (mant, expPart) = g.indexOf('e') match {
          case -1 => (g, "")
          case i  => (g.substring(0, i), g.substring(i))
        }
        val trimmed =
          if (mant.contains('.'))
            mant.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
          else mant
        trimmed + expPart
      }
    if (s == "-0") "0" else s
  }

  /** 1-2-5 nice tick positions covering [lo, hi], ~n of them. */
  def ticks(lo: Double, hi: Double, n: Int = 5): Seq[Double] = {
    if (!(hi > lo)) return Seq(lo)
    val raw = (hi - lo) / n
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r <= 1 => mag
      case r if r <= 2 => 2 * mag
      case r if r <= 5 => 5 * mag
      case _           => 10 * mag
    }
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
  }

  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  def figure(panels: Seq[Chart], w: Int, h: Int): String = {
    val ph = h / panels.size
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">"""
    sb ++= s"""<rect width="$w" height="$h" fill="white"/>"""
    panels.zipWithIndex.foreach { case (c, i) => panel(sb, c, 0, i * ph, w, ph) }
    sb ++= "</svg>"
    sb.toString
  }

  private def extent(c: Chart): (Double, Double, Double, Double) = {
    val xs = c.layers.flatMap(l => if (l.xs.isEmpty) Nil else Seq(l.xs.min, l.xs.max))
    val ys = c.layers.flatMap {
      case b: BarsL => if (b.ys.isEmpty) Nil else Seq(0.0, b.ys.max)
      case a: AreaL => if (a.lo.isEmpty) Nil else Seq(a.lo.min, a.hi.max)
      case g: GridL => if (g.yEdges.isEmpty) Nil else Seq(g.yEdges.min, g.yEdges.max)
      case l => if (l.ys.isEmpty) Nil else Seq(l.ys.min, l.ys.max)
    }
    // all-empty layers (every point null / empty table): a clear error
    // beats empty.min's UnsupportedOperationException mid-render
    require(xs.nonEmpty && ys.nonEmpty,
      "plot: no data points to render (all layers empty or all-null)")
    val (x0, x1) = (xs.min, xs.max); val (y0, y1) = (ys.min, ys.max)
    val xp = math.max((x1 - x0) * 0.05, 1e-9); val yp = math.max((y1 - y0) * 0.05, 1e-9)
    (x0 - xp, x1 + xp, y0 - yp, y1 + yp)
  }

  private def panel(sb: StringBuilder, c: Chart, ox: Int, oy: Int, w: Int, h: Int): Unit = {
    require(c.layers.nonEmpty, "plot: empty chart")
    val (mL, mR, mT, mB) = (56, 16, 14, 40)
    val pw = w - mL - mR; val ph = h - mT - mB
    val (x0, x1, y0, y1) = extent(c)
    def sx(v: Double): Double = ox + mL + (v - x0) / (x1 - x0) * pw
    def sy(v: Double): Double = oy + mT + ph - (v - y0) / (y1 - y0) * ph
    def f(v: Double): String = // Locale.ROOT: "12,34" breaks SVG numbers
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // frame + ticks
    sb ++= s"""<rect x="${ox + mL}" y="${oy + mT}" width="$pw" height="$ph" fill="none" stroke="#333" stroke-width="1"/>"""
    ticks(x0, x1).foreach { t =>
      val px = sx(t)
      sb ++= s"""<line x1="${f(px)}" y1="${oy + mT + ph}" x2="${f(px)}" y2="${oy + mT + ph + 4}" stroke="#333"/>"""
      val labelTxt = if (c.dateX) DateFmt.format(Instant.ofEpochMilli(t.toLong)) else fmt(t)
      sb ++= s"""<text x="${f(px)}" y="${oy + mT + ph + 16}" font-size="10" text-anchor="middle" fill="#333">$labelTxt</text>"""
    }
    ticks(y0, y1).foreach { t =>
      val py = sy(t)
      sb ++= s"""<line x1="${ox + mL - 4}" y1="${f(py)}" x2="${ox + mL}" y2="${f(py)}" stroke="#333"/>"""
      sb ++= s"""<text x="${ox + mL - 7}" y="${f(py + 3)}" font-size="10" text-anchor="end" fill="#333">${fmt(t)}</text>"""
    }
    if (c.xLab.nonEmpty)
      sb ++= s"""<text x="${ox + mL + pw / 2}" y="${oy + mT + ph + 32}" font-size="11" text-anchor="middle" fill="#111">${escXml(c.xLab)}</text>"""
    if (c.yLab.nonEmpty)
      sb ++= s"""<text x="${ox + 14}" y="${oy + mT + ph / 2}" font-size="11" text-anchor="middle" fill="#111" transform="rotate(-90 ${ox + 14} ${oy + mT + ph / 2})">${escXml(c.yLab)}</text>"""

    // layers (default color cycle; explicit colors override)
    var legendY = oy + mT + 14
    c.layers.zipWithIndex.foreach { case (layer, i) =>
      val colr = layer match {
        case s: ScatterL => s.color.getOrElse(Cycle(i % 10))
        case l: LineL    => l.color.getOrElse(Cycle(i % 10))
        case a: AreaL    => a.color.getOrElse(Cycle(i % 10))
        case _           => Cycle(i % 10)
      }
      layer match {
        case ScatterL(xs, ys, _, _, alpha) =>
          xs.indices.foreach { j =>
            sb ++= s"""<circle cx="${f(sx(xs(j)))}" cy="${f(sy(ys(j)))}" r="2.5" fill="$colr" fill-opacity="$alpha"/>"""
          }
        case LineL(xs, ys, dashed, markers, _, _, alpha) =>
          val order = xs.indices.sortBy(xs(_))
          val pts = order.map(j => s"${f(sx(xs(j)))},${f(sy(ys(j)))}").mkString(" ")
          val dash = if (dashed) """ stroke-dasharray="6,4"""" else ""
          sb ++= s"""<polyline points="$pts" fill="none" stroke="$colr" stroke-width="1.5" stroke-opacity="$alpha"$dash/>"""
          if (markers) order.foreach { j =>
            sb ++= s"""<circle cx="${f(sx(xs(j)))}" cy="${f(sy(ys(j)))}" r="2.5" fill="$colr"/>"""
          }
        case BarsL(edges, counts) =>
          counts.indices.foreach { j =>
            val xA = sx(edges(j)); val xB = sx(edges(j + 1)); val yT = sy(counts(j).toDouble)
            sb ++= s"""<rect x="${f(xA)}" y="${f(yT)}" width="${f(math.max(xB - xA - 1, 1))}" height="${f(sy(0.0) - yT)}" fill="${Cycle(i % 10)}" stroke="white" stroke-width="0.5"/>"""
          }
        case AreaL(xs, loA, hiA, _, _, alpha) =>
          val fwd = xs.indices.map(j => s"${f(sx(xs(j)))},${f(sy(hiA(j)))}")
          val back = xs.indices.reverse.map(j => s"${f(sx(xs(j)))},${f(sy(loA(j)))}")
          sb ++= s"""<polygon points="${(fwd ++ back).mkString(" ")}" fill="$colr" fill-opacity="$alpha" stroke="$colr" stroke-width="1"/>"""
        case GridL(xE, yE, counts, annot) =>
          val mx = math.max(counts.map(_.max).max, 1e-12)
          counts.indices.foreach { iy =>
            counts(iy).indices.foreach { ix =>
              val v = counts(iy)(ix) / mx
              val xA = sx(xE(ix)); val yT = sy(yE(iy + 1))
              // white -> C0 ramp on intensity
              val r = (255 - (255 - 31) * v).toInt
              val gC = (255 - (255 - 119) * v).toInt
              val b = (255 - (255 - 180) * v).toInt
              sb ++= s"""<rect x="${f(xA)}" y="${f(yT)}" width="${f(sx(xE(ix + 1)) - xA)}" height="${f(sy(yE(iy)) - yT)}" fill="rgb($r,$gC,$b)"/>"""
              if (annot && counts(iy)(ix) > 0)
                sb ++= s"""<text x="${f((xA + sx(xE(ix + 1))) / 2)}" y="${f((yT + sy(yE(iy))) / 2 + 3)}" font-size="8" text-anchor="middle" fill="#333">${fmt(counts(iy)(ix))}</text>"""
            }
          }
      }
      layer.label.foreach { lab =>
        sb ++= s"""<rect x="${ox + mL + pw - 110}" y="${legendY - 8}" width="10" height="10" fill="$colr"/>"""
        sb ++= s"""<text x="${ox + mL + pw - 96}" y="${legendY + 1}" font-size="10" fill="#111">${escXml(lab)}</text>"""
        legendY += 14
      }
    }
  }
}

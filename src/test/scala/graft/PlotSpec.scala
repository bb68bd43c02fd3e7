package graft

import java.nio.file.Files

import graft.core.Table
import graft.plot.{Chart, Plots, ScatterL}

/** Plot bridge: deterministic SVG structure from known data (the
  * reference's plot surface — Matplotlib.luna — rendered driver-side). */
class PlotSpec extends SparkSpec {
  import spark.implicits._

  private def tbl = Table.of(
    Seq((1L, 11.0), (2L, 12.0), (3L, 13.0), (4L, 14.0), (5L, 15.0))
      .toDF("col1", "col2"))

  test("scatter renders one circle per point with axes and labels") {
    val svg = Plots.scatter(tbl, "col1", "col2").renderSvg(640, 480)
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert("<circle ".r.findAllIn(svg).size === 5)
    assert(svg.contains(">col1</text>") && svg.contains(">col2</text>"))
    // deterministic: same input -> identical bytes
    assert(svg === Plots.scatter(tbl, "col1", "col2").renderSvg(640, 480))
  }

  test("plot styles: line, dashed, line+markers; unknown style throws") {
    assert(Plots.plot(tbl, "col1", "col2", "-").renderSvg().contains("<polyline"))
    assert(Plots.plot(tbl, "col1", "col2", "--").renderSvg().contains("stroke-dasharray"))
    val om = Plots.plot(tbl, "col1", "col2", "o-").renderSvg()
    assert(om.contains("<polyline") && om.contains("<circle"))
    intercept[IllegalArgumentException](Plots.plot(tbl, "col1", "col2", "x"))
  }

  test("histogram bins counts like the reference default (distributed count pass)") {
    val t = Table.of(Seq(1.0, 1.1, 1.2, 5.0, 9.9, 9.8, 9.7, 9.6).toDF("v"))
    val chart = Plots.histogram(t, "v", bins = 3)
    val bars = chart.layers.head.asInstanceOf[graft.plot.BarsL]
    assert(bars.counts.toSeq === Seq(3L, 1L, 4L)) // [1,3.97) [3.97,6.93) [6.93,9.9]
    assert(chart.renderSvg().contains("<rect"))
  }

  test("kde integrates to ~1 over its grid") {
    val t = Table.of(Seq(1.0, 2.0, 2.5, 3.0, 4.0, 2.2, 1.8).toDF("v"))
    val line = Plots.kde(t, "v").layers.head.asInstanceOf[graft.plot.LineL]
    val dx = line.xs(1) - line.xs(0)
    val mass = line.ys.map(_ * dx).sum
    assert(math.abs(mass - 1.0) < 0.02)
  }

  test("heatmap grid counts and annotations") {
    val t = Table.of(Seq((0.0, 0.0), (0.1, 0.1), (9.9, 9.9)).toDF("x", "y"))
    val chart = Plots.heatmap(t, "x", "y", bins = 2, annot = true)
    val g = chart.layers.head.asInstanceOf[graft.plot.GridL]
    assert(g.counts(0)(0) === 2.0 && g.counts(1)(1) === 1.0 && g.counts(0)(1) === 0.0)
    assert(chart.renderSvg().contains(">2</text>")) // annotation of the 2-count cell
  }

  test("fillBetween renders a polygon band") {
    val t = Table.of(Seq((1.0, 0.0, 2.0), (2.0, 1.0, 3.0), (3.0, 0.5, 2.5))
      .toDF("x", "lo", "hi"))
    assert(Plots.fillBetween(t, "x", "lo", "hi").renderSvg().contains("<polygon"))
  }

  test("chart composition + overlays series; verticalLayout stacks panels") {
    val overlay = Plots.scatter(tbl, "col1", "col2") +
      Plots.plot(tbl, "col1", "col2", "-")
    assert(overlay.layers.size === 2)
    val svg = overlay.renderSvg()
    assert(svg.contains("<circle") && svg.contains("<polyline"))

    val stacked = Chart.verticalLayout(
      Seq(Plots.scatter(tbl, "col1", "col2"), Plots.histogram(tbl, "col2")))
    // two panel frames at distinct y offsets
    assert("""<rect x="56" y="\d+" width""".r.findAllIn(stacked).size === 2)
  }

  test("plotDate formats x ticks as dates") {
    val ms = java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli.toDouble
    val day = 86400000.0
    val t = Table.of(
      (0 until 30).map(i => (ms + i * day, i.toDouble)).toDF("ts", "v"))
    assert(Plots.plotDate(t, "ts", "v").renderSvg().contains("2024-03-"))
  }

  test("write emits an svg file; raster extensions and huge collects throw") {
    val f = Files.createTempDirectory("plots").resolve("c.svg")
    Plots.scatter(tbl, "col1", "col2").write(320, 240, f.toString)
    assert(Files.readString(f).contains("</svg>"))
    intercept[IllegalArgumentException](
      Plots.scatter(tbl, "col1", "col2").write(320, 240, "/tmp/x.png"))
    assert(Plots.scatter(tbl, "col1", "col2").toDataUrl()
      .startsWith("data:image/svg+xml;base64,"))
  }

  test("layer color override and legend labels") {
    val c = Chart(Seq(ScatterL(Array(1.0, 2.0), Array(1.0, 2.0),
      label = Some("series-a"), color = Some("#ff0000"))))
    val svg = c.renderSvg()
    assert(svg.contains("#ff0000") && svg.contains(">series-a</text>"))
  }
}

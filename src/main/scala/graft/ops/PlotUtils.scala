package graft.ops

import graft.core.ImagePlane

/** F8/F9 QC helpers (utils/plot_utils.py:35-179): burn dotted crop
  * boundaries into an image for inspection, and map channels onto
  * caliban's fixed color slots.
  */
object PlotUtils {

  /** F8 `overlay_grid_lines`: dotted lines at crop starts (every other
    * pixel set to the image max so they are visible).
    */
  def overlayGridLines(p: ImagePlane, rowStarts: Seq[Int], colStarts: Seq[Int]): ImagePlane = {
    val out = p.pixels.clone()
    val planeSize = p.nRows * p.nCols
    val mx = if (p.pixels.isEmpty) 1f else math.max(p.pixels.max, 1f)
    var ch = 0
    while (ch < p.channels.length) {
      rowStarts.filter(r => r > 0 && r < p.nRows).foreach { r =>
        var c = 0
        while (c < p.nCols) { out(ch * planeSize + r * p.nCols + c) = mx; c += 2 }
      }
      colStarts.filter(c => c > 0 && c < p.nCols).foreach { c =>
        var r = 0
        while (r < p.nRows) { out(ch * planeSize + r * p.nCols + c) = mx; r += 2 }
      }
      ch += 1
    }
    p.copy(pixels = out)
  }

  /** F9 `set_channel_colors`: caliban's fixed color slot order;
    * reorder channels into the requested color assignment, blanks for
    * unassigned slots (delegates to ImageFunctions.reorderChannels).
    */
  val ColorSlots: Seq[String] = Seq("red", "green", "blue", "cyan", "magenta", "yellow")

  def setChannelColors(p: ImagePlane, assignment: Map[String, String]): ImagePlane = {
    require(assignment.values.forall(ColorSlots.contains), s"colors must be in $ColorSlots")
    require(assignment.values.toSeq.distinct.length == assignment.size, "duplicate colors")
    val slotToChannel = assignment.map(_.swap)
    val order = ColorSlots.takeWhile(s => ColorSlots.indexOf(s) <=
      assignment.values.map(ColorSlots.indexOf).maxOption.getOrElse(-1))
      .map(slot => slotToChannel.getOrElse(slot, s"blank_$slot"))
    ImageFunctions.reorderChannels(p, order)
  }
}

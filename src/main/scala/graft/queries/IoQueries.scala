package graft.queries

import graft.core.ImagePlane
import graft.sources.{Npz, Tiff}
import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** File-format IO queries — driver-checkable CORRECTNESS rows for the
  * TIFF source (S6/S7, reference `misc_utils.get_image` /
  * `data_loader.load_imagedata`, data_loader.py:396-445) and the NPZ
  * sink/source family (S10/S12, `utils/io_utils.py:37-239`). The
  * format decoders themselves are spec-gated against real reference
  * files; these queries expose the same decode paths as RELATIONAL
  * digests so the driver's DuckDB gate sees them every round:
  *
  *  - q_src_tiff_digest decodes the six committed reference TIFF
  *    fixtures (512x512 int16 MIBI planes, copied verbatim from the
  *    reference's `data/raw_data` tree into fixtures/tiff) and emits a
  *    per-plane census. The oracle pins values computed by an
  *    INDEPENDENT decoder (a raw little-endian IFD walk over the strip
  *    offsets — tools/tiff_digest.py), so engine and oracle share no
  *    code path: a JDK ImageIO regression (wrong sample type, row
  *    order, frame count) breaks nnz/sum/checksum and fails the hash.
  *  - q_npz_roundtrip drives the S10 sink (one NPZ per (fov, crop,
  *    slice) work unit, blank-label routing to `separate/`) into the
  *    S12 grid-completed source and verifies per-plane digest equality
  *    plus the two routing laws: the blank unit zero-fills in the main
  *    grid read (its file is NOT there) and round-trips bit-exactly
  *    from `separate/`.
  */
object IoQueries {

  /** Same fixture-root resolution as the ANN oracles: override with
    * `-Dgraft.fixtures.dir`, default `fixtures/` under the working
    * directory (the repo root for Verify/Bench and the driver).
    */
  private def fixturesRoot: String =
    sys.props.getOrElse("graft.fixtures.dir",
      new java.io.File("fixtures").getAbsolutePath)

  /** Census of one decoded plane: nonzero count, integer pixel sum,
    * max, and a position-weighted checksum (sum of (i+1)*v mod
    * 1e9+7 — order-sensitive, so a row-major/column-major or
    * byte-order slip changes it even when the value multiset
    * doesn't). Pixels are integral (int16 TIFF samples / small-int
    * synthetic floats), so the Long cast is exact.
    */
  private def census(pixels: Array[Float]): (Long, Long, Long, Long) = {
    val P = 1000000007L
    var nnz = 0L; var sum = 0L; var mx = Long.MinValue; var chk = 0L
    var i = 0
    while (i < pixels.length) {
      val v = math.rint(pixels(i)).toLong
      if (v != 0) nnz += 1
      sum += v
      if (v > mx) mx = v
      chk = (chk + (((i + 1).toLong * v) % P + P) % P) % P
      i += 1
    }
    (nnz, sum, if (pixels.isEmpty) 0L else mx, chk)
  }

  /** S6/S7 digest: distributed binaryFile scan + ImageIO decode of the
    * committed reference TIFFs, one census row per (file, frame).
    */
  private def qSrcTiffDigest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tiff.readTiffDir(s, s"$fixturesRoot/tiff", glob = "*.tif")
      .map { p =>
        val (nnz, sum, mx, chk) = census(p.pixels)
        (p.fov, p.stack, p.nRows, p.nCols, nnz, sum, mx, chk)
      }
      .toDF("fov", "stack", "n_rows", "n_cols", "nnz", "px_sum", "px_max",
        "checksum")
      .orderBy("fov", "stack")
  }

  private val RtN = 20 // roundtrip plane edge

  /** Deterministic pixel law for the roundtrip fixture — small ints,
    * exact through the float32 NPY encode.
    */
  private def rtPixel(fi: Int, crop: Int, slc: Int, st: Int, i: Int): Float =
    ((i + st * 7 + crop * 13 + slc * 17 + fi * 19) % 101).toFloat

  private def rtLabel(crop: Int, slc: Int, st: Int, i: Int): Int =
    if ((i + st + crop + slc) % 3 == 0) 1 + (i % 5) else 0

  private def rtPlanes: Seq[ImagePlane] =
    for {
      (fov, fi) <- Seq("fovA", "fovB").zipWithIndex
      crop <- 0 until 2; slc <- 0 until 2; st <- 0 until 2
    } yield {
      val blank = fov == "fovB" && crop == 1 && slc == 1
      ImagePlane(fov, st, crop, slc, RtN, RtN, Seq("channel0"),
        Array.tabulate(RtN * RtN)(rtPixel(fi, crop, slc, st, _)),
        if (blank) new Array[Int](RtN * RtN)
        else Array.tabulate(RtN * RtN)(rtLabel(crop, slc, st, _)))
    }

  /** S10 -> S12 roundtrip: write the 8-unit fixture with
    * blankLabels="separate", grid-read ALL units back (the blank one
    * zero-fills), then read `separate/` and check it holds exactly the
    * blank unit's original planes. Verdict columns compare pixel AND
    * label censuses against the a-priori fixture law — computed here
    * from the SAME pure functions, never from the written files.
    */
  private def qNpzRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planes = rtPlanes
    val tmp = java.nio.file.Files.createTempDirectory("npz_rt")
      .toFile.getAbsolutePath
    Npz.saveNpzsForCaliban(ImagePlane.toDataset(s, planes), tmp,
      blankLabels = "separate")
    val expected: Map[(String, Int, Int, Int), (Long, Long)] = planes.map { p =>
      (p.fov, p.crop, p.slice, p.stack) ->
        (census(p.pixels)._4, census(p.labels.map(_.toFloat))._4)
    }.toMap
    val zeroChk = 0L
    def rows(ds: org.apache.spark.sql.Dataset[ImagePlane], mode: String,
             wantZero: Boolean): DataFrame =
      ds.map { p =>
        val pxChk = census(p.pixels)._4
        val lbChk = census(p.labels.map(_.toFloat))._4
        val (wantPx, wantLb) =
          if (wantZero) (zeroChk, zeroChk)
          else expected((p.fov, p.crop, p.slice, p.stack))
        (p.fov, p.crop, p.slice, p.stack, p.nRows, p.nCols, mode,
          pxChk == wantPx && lbChk == wantLb)
      }.toDF("fov", "crop", "slice", "stack", "n_rows", "n_cols", "mode",
        "digest_ok")
    val grid = for {
      fov <- Seq("fovA", "fovB"); crop <- 0 until 2; slc <- 0 until 2
    } yield (fov, crop, slc, 2)
    val all = Npz.loadNpzsWithGrid(s, tmp, grid, RtN, RtN)
    val isBlankUnit = (p: ImagePlane) =>
      p.fov == "fovB" && p.crop == 1 && p.slice == 1
    val main = rows(all.filter(p => !isBlankUnit(p)), "roundtrip",
        wantZero = false)
      .union(rows(all.filter(isBlankUnit), "zero_filled", wantZero = true))
    val sep = rows(Npz.loadNpzsWithGrid(s, s"$tmp/separate",
      Seq(("fovB", 1, 1, 2)), RtN, RtN), "separate", wantZero = false)
    main.union(sep).orderBy("mode", "fov", "crop", "slice", "stack")
  }

  val defs: Map[String, QueryFn] = Map(
    "q_src_tiff_digest" -> qSrcTiffDigest _,
    "q_npz_roundtrip" -> qNpzRoundtrip _,
  )

  /** The TIFF oracle rows are INDEPENDENTLY derived: a raw IFD walk
    * (byte-order header, strip offsets/counts, int16 samples) over the
    * committed fixtures, sharing zero code with the JDK ImageIO path
    * the engine uses — see tools/tiff_digest.py for the derivation.
    * The NPZ oracle pins the a-priori roundtrip relation: every census
    * verdict TRUE, 16 grid rows (14 roundtrip + 2 zero-filled for the
    * routed-away blank unit) + 2 separate/ rows.
    */
  val oracles: Map[String, String] = Map(
    "q_src_tiff_digest" ->
      """SELECT * FROM (VALUES
        |  ('20200116_DCIS_Point2304_crop_0', 0, 512, 512, 79868, 335851, 42, 394077718),
        |  ('20200116_DCIS_Point2304_crop_1', 0, 512, 512, 67827, 263656, 37, 201889072),
        |  ('20200116_DCIS_Point2304_crop_2', 0, 512, 512, 76208, 274331, 35, 320600289),
        |  ('Point2304_crop_0', 0, 512, 512, 74850, 176083, 29, 507033224),
        |  ('Point2304_crop_1', 0, 512, 512, 26425, 48332, 25, 106918797),
        |  ('Point2304_crop_2', 0, 512, 512, 49899, 93409, 42, 395140953)
        |) AS t(fov, stack, n_rows, n_cols, nnz, px_sum, px_max, checksum)
        |ORDER BY fov, stack""".stripMargin,
    "q_npz_roundtrip" ->
      """WITH grid AS (
        |  SELECT fov, crop, slc AS slice, stack,
        |    CASE WHEN fov = 'fovB' AND crop = 1 AND slc = 1
        |         THEN 'zero_filled' ELSE 'roundtrip' END AS mode
        |  FROM (VALUES ('fovA'), ('fovB')) f(fov),
        |       generate_series(0, 1) c(crop),
        |       generate_series(0, 1) sl(slc),
        |       generate_series(0, 1) st(stack)),
        |sep AS (
        |  SELECT 'fovB' AS fov, 1 AS crop, 1 AS slice, stack,
        |         'separate' AS mode
        |  FROM generate_series(0, 1) st(stack)),
        |rows_all AS (SELECT * FROM grid UNION ALL SELECT * FROM sep)
        |SELECT fov, crop, slice, stack, 20 AS n_rows, 20 AS n_cols,
        |       mode, TRUE AS digest_ok
        |FROM rows_all
        |ORDER BY mode, fov, crop, slice, stack""".stripMargin,
  )
}

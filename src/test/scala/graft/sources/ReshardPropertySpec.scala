package graft.sources

import graft.SparkSpec

/** Property gate for [[TarShards.reshardBySize]]: random sample frames
  * checked against an INDEPENDENT plain-Scala replay of the
  * boundary-by-start-offset law (group the samples, sort keys, running
  * footprint sum, floor-divide the start offset) — the
  * ExactSubstrPropertySpec discipline. The footprint formula (one
  * 512-byte header + 512-padded payload per entry) is restated here
  * from the documented contract, not imported from the operator.
  */
class ReshardPropertySpec extends SparkSpec {

  private def footprint(entries: Map[String, Array[Byte]]): Long =
    entries.valuesIterator.map(d => 512L + ((d.length + 511L) / 512L) * 512L).sum

  private def expected(rows: Seq[(String, String, Map[String, Array[Byte]])],
                       target: Long): Map[String, String] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      var off = 0L
      rs.sortBy(_._2).map { case (_, k, m) =>
        val bin = off / target
        off += footprint(m)
        k -> f"$g-$bin%05d.tar"
      }
    }

  test("random frames: assignment equals the plain-Scala law replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      val target = Seq(1024L, 2048L, 4096L)(trial % 3)
      val rows = (0 until 40 + rnd.nextInt(40)).map { i =>
        val g = s"g${rnd.nextInt(3)}"
        val k = f"k$i%04d"
        val nEntries = 1 + rnd.nextInt(3)
        val m = (0 until nEntries).map { e =>
          s"ext$e" -> Array.fill[Byte](rnd.nextInt(1500))(1)
        }.toMap
        (g, k, m)
      }
      val df = rows.map { case (g, k, m) => (g, k, m.keys.toSeq, m) }
        .toDF("group", "key", "exts", "entries")
      val got = TarShards.reshardBySize(df, target)
        .select("key", "shard").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == expected(rows, target), s"trial $trial target $target")
    }
  }

  test("overshoot is bounded by one sample; nothing is lost through the sink") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 60).map { i =>
      ("g", f"k$i%04d", Map("b" -> Array.fill[Byte](rnd.nextInt(2000))(1)))
    }
    val target = 4096L
    val byShard = expected(rows, target).groupBy(_._2).map { case (s, ks) =>
      s -> ks.keys.toSeq.sorted.map(k =>
        footprint(rows.find(_._2 == k).get._3))
    }
    // boundary-by-start-offset contract: a shard's LAST sample may
    // overshoot the target (its start lies inside the bin), so
    // bytes-before-last < target for EVERY shard. (Under-filled bins
    // are legal — a large predecessor can overshoot past a bin's worth
    // of offsets — which is exactly why the docstring calls targeting
    // approximate.)
    byShard.foreach { case (s, fps) =>
      assert(fps.init.sum < target,
        s"$s carries ${fps.init.sum} bytes before its last sample — " +
          "a boundary was missed")
    }
    val df = rows.map { case (g, k, m) => (g, k, m.keys.toSeq, m) }
      .toDF("group", "key", "exts", "entries")
    val got = TarShards.reshardBySize(df, target)
      .groupBy("shard").count().collect()
    assert(got.map(_.getLong(1)).sum == 60)
  }
}

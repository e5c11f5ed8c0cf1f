package graft

import graft.operators.{DataSelection, GraphOps}
import org.apache.spark.sql.functions._

/** Greedy sequence packing (q184) and min-hop taint propagation (q185). */
class PackingTaintSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side replay of the greedy no-split rule — the independent
    * reference the distributed scan must match doc-for-doc.
    */
  private def replay(rows: Seq[(Long, Long)], budget: Long,
                     nShards: Int): Map[Long, Long] = {
    val keyed = rows.map { case (id, nTok) =>
      val h = md5hex(id.toString)
      (Integer.parseInt(h.substring(0, 4), 16) % nShards, h, id, nTok)
    }
    keyed.groupBy(_._1).flatMap { case (_, docs) =>
      var bin = -1L; var fill = 0L
      docs.sortBy(d => (d._2, d._3)).map { case (_, _, id, nTok) =>
        if (nTok > budget) id -> -1L
        else {
          if (bin < 0L || fill + nTok > budget) { bin += 1L; fill = 0L }
          fill += nTok
          id -> bin
        }
      }
    }
  }

  private def docsOf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.map { case (id, nTok) => (id, Seq.fill(nTok.toInt)("w").mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("packSequences matches a driver-side greedy replay across shards") {
    val rows = (1L to 200L).map(i => i -> (i % 37 + 1)) // token counts 1..37
    val got = DataSelection
      .packSequences(docsOf(rows), "doc_id", "text", budget = 50L, nShards = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(got == replay(rows, 50L, 4))
  }

  test("packSequences: no window exceeds the budget and fit implies same bin") {
    val rows = (1L to 300L).map(i => i -> (i * 7 % 61 + 1))
    val out = DataSelection
      .packSequences(docsOf(rows), "doc_id", "text", budget = 64L, nShards = 8)
    val binSums = out.filter(col("bin") >= 0)
      .groupBy("shard", "bin").agg(sum("nTok").as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(binSums.nonEmpty && binSums.forall(_ <= 64L))
  }

  test("packSequences: oversize docs get bin -1 and do not break the window") {
    val rows = Seq(10L -> 3L, 11L -> 999L, 12L -> 4L, 13L -> 999L, 14L -> 2L)
    val got = DataSelection
      .packSequences(docsOf(rows), "doc_id", "text", budget = 10L, nShards = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(got == replay(rows, 10L, 1))
    assert(got(11L) == -1L && got(13L) == -1L)
    // the three small docs (3+4+2 = 9 <= 10) share one window: the
    // oversize docs in between must not have reset the fill state
    assert(Set(got(10L), got(12L), got(14L)).size == 1)
  }

  test("packingStats: bins, padding and fill are exact on a replayed corpus") {
    val rows = (1L to 120L).map(i => i -> (i % 23 + 1))
    val stats = DataSelection
      .packingStats(docsOf(rows), "doc_id", "text", budget = 40L, nShards = 2)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val ref = replay(rows, 40L, 2)
    val byShard = rows.groupBy { case (id, _) =>
      Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 2L
    }
    byShard.foreach { case (shard, docs) =>
      val r = stats(shard)
      val packed = docs.filter { case (id, _) => ref(id) >= 0L }
      val nBins = if (packed.isEmpty) 0L
        else packed.map { case (id, _) => ref(id) }.max + 1L
      val packedTok = packed.map(_._2).sum
      assert(r.getAs[Long]("n_docs") == docs.size.toLong)
      assert(r.getAs[Long]("n_oversize") == (docs.size - packed.size).toLong)
      assert(r.getAs[Long]("n_bins") == nBins)
      assert(r.getAs[Long]("packed_tokens") == packedTok)
      assert(r.getAs[Long]("padding_tokens") == nBins * 40L - packedTok)
      assert(r.getAs[Long]("fill_x1e4") ==
        (if (nBins == 0L) 0L
         else math.floor(packedTok * 10000.0 / (nBins * 40L) + 0.5).toLong))
    }
  }

  test("packingStats: all-oversize shard reports zero bins and zero fill") {
    val rows = Seq(1L -> 99L, 2L -> 99L, 3L -> 99L)
    val stats = DataSelection
      .packingStats(docsOf(rows), "doc_id", "text", budget = 10L, nShards = 1)
      .collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_bins") == 0L && r.getAs[Long]("fill_x1e4") == 0L
      && r.getAs[Long]("n_oversize") == 3L
      && r.getAs[Long]("padding_tokens") == 0L)
  }

  test("packWithChunking: split docs pack fully, tokens conserved per shard") {
    val rows = (1L to 120L).map(i => i -> (i * 13 % 150 + 1)) // up to 150 toks
    val budget = 40L
    val stats = DataSelection
      .packWithChunking(docsOf(rows), "doc_id", "text", budget, nShards = 4)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val byShard = rows.groupBy { case (id, _) =>
      Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 4L
    }
    assert(stats.keySet == byShard.keySet)
    byShard.foreach { case (shard, ds) =>
      val r = stats(shard)
      // chunking leaves nothing behind: every token of every doc packs
      assert(r.getAs[Long]("packed_tokens") == ds.map(_._2).sum)
      val pieces = ds.map { case (_, n) => (n + budget - 1) / budget }.sum
      assert(r.getAs[Long]("n_pieces") == pieces)
      assert(r.getAs[Long]("n_split_docs") ==
        ds.count { case (_, n) => n > budget }.toLong)
      // replaying the greedy rule over the piece sequence gives the bins
      var bin = -1L; var fill = 0L
      ds.sortBy { case (id, _) => (md5hex(id.toString), id) }
        .foreach { case (_, n) =>
          (0L until (n + budget - 1) / budget).foreach { i =>
            val pt = math.min(budget, n - i * budget)
            if (bin < 0L || fill + pt > budget) { bin += 1L; fill = 0L }
            fill += pt
          }
        }
      assert(r.getAs[Long]("n_bins") == bin + 1L)
    }
  }

  test("packingSweep: one scan equals per-budget packingStats, budget by budget") {
    val rows = (1L to 150L).map(i => i -> (i * 11 % 80 + 1))
    val docs = docsOf(rows)
    val sweep = DataSelection
      .packingSweep(docs, "doc_id", "text", Seq(24L, 48L, 72L), nShards = 4)
      .collect().map(r => r.getAs[Long]("budget") -> r).toMap
    Seq(24L, 48L, 72L).foreach { b =>
      val solo = DataSelection.packingStats(docs, "doc_id", "text", b, 4)
        .agg(sum("n_bins"), sum("n_oversize"), sum("packed_tokens"),
          sum("padding_tokens"))
        .head()
      val r = sweep(b)
      assert(r.getAs[Long]("n_bins") == solo.getLong(0), s"bins at $b")
      assert(r.getAs[Long]("n_oversize") == solo.getLong(1))
      assert(r.getAs[Long]("packed_tokens") == solo.getLong(2))
      assert(r.getAs[Long]("padding_tokens") == solo.getLong(3))
    }
  }

  test("concatPackStats matches a driver-side concat-and-cut replay") {
    val rows = (1L to 150L).map(i => i -> (i % 29 + 1))
    val budget = 40L
    val got = DataSelection
      .concatPackStats(docsOf(rows), "doc_id", "text", budget, nShards = 4)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val byShard = rows.groupBy { case (id, _) =>
      Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 4L
    }
    assert(got.keySet == byShard.keySet)
    byShard.foreach { case (shard, ds) =>
      val ordered = ds.sortBy { case (id, _) => (md5hex(id.toString), id) }
      var cum = 0L; var boundary = 0L
      ordered.foreach { case (_, nTok) =>
        val start = cum / budget
        cum += nTok
        if (nTok > 0 && (cum - 1) / budget != start) boundary += 1
      }
      val r = got(shard)
      assert(r.getAs[Long]("n_docs") == ds.size.toLong)
      assert(r.getAs[Long]("total_tokens") == cum)
      assert(r.getAs[Long]("n_boundary_docs") == boundary)
      assert(r.getAs[Long]("n_bins") == (cum + budget - 1) / budget)
      assert(r.getAs[Long]("tail_padding") ==
        (cum + budget - 1) / budget * budget - cum)
    }
  }

  private def selectTop(rows: Seq[(Long, Double)], num: Int, den: Int) = {
    import spark.implicits._
    DataSelection
      .topFractionByScore(rows.toDF("doc_id", "score"), "doc_id", num, den)
      .collect().map(_.getAs[Long]("doc_id")).toSet
  }

  /** Reference: global (score desc, md5, id) order, first k. */
  private def refTop(rows: Seq[(Long, Double)], num: Int, den: Int) = {
    val k = (rows.size.toLong * num / den).toInt
    rows.sortBy { case (id, s) =>
      (-math.floor(s * 1000000.0 + 0.5).toLong, md5hex(id.toString), id)
    }.take(k).map(_._1).toSet
  }

  test("topFractionByScore equals the global-sort reference under heavy ties") {
    val rows = (1L to 200L).map(i => i -> (i % 5) / 10.0) // 5 score values
    Seq((1, 4), (1, 3), (2, 3), (9, 10)).foreach { case (num, den) =>
      val got = selectTop(rows, num, den)
      assert(got == refTop(rows, num, den), s"fraction $num/$den")
      assert(got.size == rows.size * num / den)
    }
  }

  test("topFractionByScore: all-tied corpus picks exactly k in md5 order") {
    val rows = (1L to 90L).map(_ -> 0.5)
    val got = selectTop(rows, 1, 3)
    assert(got == refTop(rows, 1, 3) && got.size == 30)
  }

  test("topFractionByScore: zero fraction is empty, full fraction is everything") {
    val rows = (1L to 40L).map(i => i -> i / 100.0)
    assert(selectTop(rows, 0, 4).isEmpty)
    assert(selectTop(rows, 1, 1) == rows.map(_._1).toSet)
  }

  test("stratifiedInterleave: per-shard source counts within 1 of Ns/shards") {
    import spark.implicits._
    val docs = ((1L to 97L).map(_ -> "a") ++ (200L to 229L).map(_ -> "b") ++
      (300L to 303L).map(_ -> "c")).toDF("doc_id", "source")
    val out = DataSelection
      .stratifiedInterleave(docs, "doc_id", "source", nShards = 8)
      .collect()
    assert(out.length == 97 + 30 + 4)
    val bySrc = Map("a" -> 97.0, "b" -> 30.0, "c" -> 4.0)
    out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[String]("source")))
      .foreach { case ((shard, src), rows) =>
        assert(shard >= 0 && shard < 8)
        val ideal = bySrc(src) / 8.0
        assert(math.abs(rows.length - ideal) <= 1.0,
          s"shard $shard source $src: ${rows.length} vs ideal $ideal")
      }
    // stride property: ascending virtual time within a source follows its
    // epoch-salted md5 rank order exactly
    val aOrder = out.filter(_.getAs[String]("source") == "a")
      .sortBy(_.getAs[Double]("vt")).map(_.getAs[Long]("doc_id")).toSeq
    val aRef = (1L to 97L).sortBy(id => (md5hex(s"1#$id"), id))
    assert(aOrder == aRef)
    // epoch reshuffle: a different epoch yields a different (still
    // uniform) order of the same docs
    val e2 = DataSelection
      .stratifiedInterleave(docs, "doc_id", "source", nShards = 8, epoch = 2L)
      .collect()
    val aOrder2 = e2.filter(_.getAs[String]("source") == "a")
      .sortBy(_.getAs[Double]("vt")).map(_.getAs[Long]("doc_id")).toSeq
    assert(aOrder2 == (1L to 97L).sortBy(id => (md5hex(s"2#$id"), id)))
    assert(aOrder2 != aOrder)
  }

  private def hops(seeds: Seq[Long], edges: Seq[(Long, Long)],
                   maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.minHopFrom(seeds.toDF("id"), edges.toDF("a", "b"), "a", "b",
        maxHops)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("hop")).toMap
  }

  test("minHopFrom: chain distances are exact and bounded by maxHops") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(hops(Seq(1L), chain, 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 is 4 hops out
  }

  test("minHopFrom: min wins when two seeds reach the same node") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(hops(Seq(1L, 4L), chain, 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("minHopFrom: cycles terminate and a seed stays at hop 0") {
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    assert(hops(Seq(1L), tri, 3) == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("minHopFrom: maxHops 0 returns only the seed set") {
    assert(hops(Seq(7L), Seq(7L -> 8L, 8L -> 9L), 0) == Map(7L -> 0L))
  }

  test("minHopFrom: exhausted frontier exits before maxHops") {
    // component of 2 nodes, maxHops 20 — must not loop 20 rounds of work;
    // correctness proxy: result is exactly the component
    assert(hops(Seq(1L), Seq(1L -> 2L, 5L -> 6L), 20) ==
      Map(1L -> 0L, 2L -> 1L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.text.Packing

/** Sequence packing: the block map is a per-shard prefix sum over the
  * deterministic hash order — contiguous, separator-aware, replayable.
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  // 40 docs, token counts 0..12 (id 0 and id 7 are empty/null texts)
  private lazy val docs = spark.range(40)
    .select($"id".as("doc_id"),
      when($"id" === 0, lit(null).cast("string"))
        .when($"id" === 7, lit("   "))
        .otherwise(concat_ws(" ",
          transform(sequence(lit(1), (pmod($"id", lit(12)) + 1).cast("int")),
            i => concat(lit("w"), i)))).as("text"))

  private def pack(df: org.apache.spark.sql.DataFrame, blockLen: Int,
      nShards: Int) =
    Packing.packSequences(df, "doc_id",
      graft.text.TextFunctions.tokenCount(col("text")), blockLen, nShards)

  test("per-shard stream is contiguous: each offset = previous offset + tokens + separator") {
    val rows = pack(docs, blockLen = 10, nShards = 3)
      .select($"shard", $"offset", $"n_tokens", $"doc_id")
      .as[(Int, Long, Long, Long)].collect()
      .groupBy(_._1).values
    rows.foreach { shard =>
      val inOrder = shard.sortBy(_._2)
      assert(inOrder.head._2 === 0L, "every shard stream starts at 0")
      inOrder.sliding(2).foreach {
        case Array((_, o1, t1, _), (_, o2, _, _)) =>
          assert(o2 === o1 + t1 + 1L, s"gap at offset $o1")
        case _ =>
      }
    }
  }

  test("block spans: arithmetic from offset, boundary-crossing docs span multiple blocks, empty docs land in one") {
    val got = pack(docs, blockLen = 10, nShards = 1)
      .select($"doc_id", $"n_tokens", $"offset", $"first_block", $"last_block")
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (id, n, off, fb, lb) =>
      assert(fb === off / 10, s"doc $id")
      if (n > 0) assert(lb === (off + n - 1) / 10, s"doc $id")
      else assert(lb === fb, s"empty doc $id lands in its separator's block")
      // a doc spans extra blocks iff its span crosses a multiple of 10
      assert(lb - fb === (if (n > 0) (off + n - 1) / 10 - off / 10 else 0L))
    }
    // empty/blank docs really are empty, and somebody crosses a boundary
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(0L) === 0L && byId(7L) === 0L)
    assert(got.exists { case (_, n, _, fb, lb) => n > 0 && lb > fb })
    // the packed stream wastes nothing: total length = sum(tokens + 1)
    val total = got.map(r => r._2 + 1).sum
    assert(got.map(r => r._3).max < total)
  }

  test("blockSlices: per-doc slices cover exactly the doc's tokens, contiguous per block, empty docs emit one zero-slice") {
    val packed = pack(docs, blockLen = 10, nShards = 2)
    val slices = graft.text.Packing.blockSlices(packed, blockLen = 10)
      .select($"doc_id", $"shard", $"block", $"tok_start", $"tok_len",
        $"n_tokens", $"offset")
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
    // coverage: a doc's slice lengths sum to its token count, slices
    // are contiguous in token space starting at 0
    slices.groupBy(_._1).foreach { case (id, ss) =>
      val inOrder = ss.sortBy(_._3)
      assert(inOrder.map(_._5).sum === inOrder.head._6, s"doc $id")
      var nxt = 0L
      inOrder.foreach { case (_, _, _, st, ln, _, _) =>
        assert(st === nxt, s"doc $id slice gap"); nxt = st + ln
      }
    }
    // no block receives more than blockLen tokens across all its docs
    slices.groupBy(s => (s._2, s._3)).foreach { case (blk, ss) =>
      assert(ss.map(_._5).sum <= 10L, blk.toString)
    }
    // empty docs: exactly one slice row, zero length
    Seq(0L, 7L).foreach { id =>
      val ss = slices.filter(_._1 == id)
      assert(ss.length === 1 && ss.head._5 === 0L, s"doc $id")
    }
  }

  test("blockTokens: full blocks except each shard's last, eos per doc, stream agrees with the offset map") {
    val packed = pack(docs, blockLen = 10, nShards = 2)
    val blocks = graft.text.Packing.blockTokens(packed, "text", 10)
      .select($"shard", $"block", $"n_filled", $"block_text")
      .as[(Int, Long, Long, String)].collect()
    // total stream length = Σ (n_tokens + 1)
    val streamLen = packed.agg(sum($"n_tokens" + 1L)).head.getLong(0)
    assert(blocks.map(_._3).sum === streamLen)
    // every block except each shard's last is exactly full
    blocks.groupBy(_._1).foreach { case (shard, bs) =>
      val lastBlock = bs.map(_._2).max
      bs.foreach { case (_, b, n, txt) =>
        if (b < lastBlock) assert(n === 10L, s"shard $shard block $b")
        assert(txt.split(" ").length.toLong === n)
      }
    }
    // one eos per document, split between the shards
    assert(blocks.map(_._4.split(" ").count(_ == "<eos>")).sum ===
      docs.count())
    // a doc's tokens appear verbatim in stream order: reconstruct each
    // shard's stream and check every doc's span equals its text tokens
    val streams = blocks.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).flatMap(_._4.split(" ")).toSeq).toMap
    packed.select($"shard", $"offset", $"n_tokens", $"text")
      .as[(Int, Long, Long, Option[String])].collect()
      .foreach { case (shard, off, n, txt) =>
        val want = txt.map(_.trim).filter(_.nonEmpty)
          .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
        val got = streams(shard).slice(off.toInt, (off + n).toInt)
        assert(got === want, s"shard $shard offset $off")
        assert(streams(shard)((off + n).toInt) === "<eos>")
      }
  }

  test("docWindows: strided starts, last window reaches the final token, short docs one window, empty none, no shuffle") {
    import graft.text.{Packing, TextFunctions => TF}
    val wins = Packing.docWindows(docs, "doc_id",
        TF.tokenCount($"text"), windowLen = 5, stride = 3)
      .select($"doc_id", $"win", $"tok_start", $"tok_len",
        TF.tokenCount($"text").as("n"))
      .as[(Long, Long, Long, Long, Long)].collect()
    // empty docs (0 and 7 in this fixture) emit nothing
    assert(!wins.exists(w => w._1 == 0L || w._1 == 7L))
    wins.groupBy(_._1).foreach { case (id, ws) =>
      val inOrder = ws.sortBy(_._2)
      val n = inOrder.head._5
      // starts every stride; every window non-empty and in range
      inOrder.foreach { case (_, w, st, ln, _) =>
        assert(st === w * 3 && ln >= 1 && st + ln <= n, s"doc $id win $w")
        assert(ln === math.min(5L, n - st))
      }
      // the last window covers the final token; window count formula
      val (_, lastW, lastSt, lastLn, _) = inOrder.last
      assert(lastSt + lastLn === n, s"doc $id")
      assert(lastW === (math.max(n - 5, 0) + 2) / 3, s"doc $id")
      // short docs: exactly one window
      if (n <= 5) assert(inOrder.length === 1, s"doc $id")
    }
    // chunking is shuffle-free: composes with any existing partitioning
    val plan = Packing.docWindows(docs, "doc_id",
        TF.tokenCount($"text"), 5, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("docWindows properties on randomized (n, windowLen, stride): tiling, count formula, coverage") {
    import graft.text.Packing
    val rng = new scala.util.Random(777)
    (1 to 5).foreach { trial =>
      val w = 1 + rng.nextInt(20)
      val s = 1 + rng.nextInt(w)
      val df = (1 to 300).map(i => (i.toLong, rng.nextInt(60).toLong))
        .toDF("doc_id", "n")
      val got = Packing.docWindows(df, "doc_id", $"n", w, s)
        .select($"doc_id", $"n", $"win", $"tok_start", $"tok_len")
        .as[(Long, Long, Long, Long, Long)].collect()
      val ns = df.as[(Long, Long)].collect().toMap
      // docs with zero tokens absent; all others fully covered
      got.groupBy(_._1).foreach { case (id, ws) =>
        val n = ns(id)
        val inOrder = ws.sortBy(_._3)
        assert(inOrder.length ===
          (math.max(n - w, 0) + s - 1) / s + 1, s"t$trial doc $id count")
        // every token position is inside at least one window, windows
        // never overrun, the last one ends exactly at n
        inOrder.foreach { case (_, _, win, st, ln) =>
          assert(st === win * s && ln >= 1 && st + ln <= n, s"t$trial $id")
        }
        val covered = inOrder.flatMap(x => x._4 until (x._4 + x._5)).toSet
        assert(covered === (0L until n).toSet, s"t$trial doc $id cover")
        assert(inOrder.last._4 + inOrder.last._5 === n, s"t$trial $id end")
      }
      assert(ns.filter(_._2 == 0L).keySet
        .intersect(got.map(_._1).toSet).isEmpty, s"t$trial empties")
    }
  }

  test("block map is partitioning-invariant and replayable") {
    def run(df: org.apache.spark.sql.DataFrame) =
      pack(df, blockLen = 7, nShards = 4)
        .select($"doc_id", $"shard", $"offset", $"first_block", $"last_block")
        .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(docs.coalesce(1))
    val b = run(docs.repartition(11))
    assert(a === b)
  }
}

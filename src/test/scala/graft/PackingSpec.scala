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

package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackBoundariesSpec extends AnyFunSuite with SparkSpec {

  test("cu_seqlens: strictly increasing offsets, contiguous ends, budget overhang visible") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, (1 to 7).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text") // 7 tokens per doc, budget 16 → overhanging docs
    val packed = Corpus.packSequences(docs, "doc_id", "text", budget = 16, nShards = 4)
    val out = Corpus.packBoundaries(packed).orderBy("seq_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cuts = r.getString(2).split(",").map(_.toLong)
      assert(cuts.length == r.getLong(1) + 1) // n_docs offsets + final end
      assert(cuts.sliding(2).forall(p => p(0) < p(1)), "strictly increasing")
      // contiguity: every interior boundary is both an end and a start
      // (7-token docs at budget 16 ⇒ offsets step by exactly 7 within a seq
      // until the overhang wraps)
      assert(cuts.last > cuts.dropRight(1).last)
    }
    // total tokens conserved: Σ (end − first offset) over seqs == Σ n_tokens
    val total = out.map { r =>
      val cuts = r.getString(2).split(",").map(_.toLong); cuts.last - cuts.head
    }.sum
    assert(total == packed.agg(sum("n_tokens")).collect().head.getLong(0))
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.pipeline.MergeOps
import graft.ext.Dedup
import graft.functions.TransformLib

/** Property tests for the semantics-critical operators (SURVEY §5 plan):
  * each Spark operator is compared against a direct Scala model on randomized
  * data (single seeded dataset per property to keep Spark job counts sane).
  */
class PropertySpec extends SparkSpec {

  /** sample a generator deterministically n times (offline cache has no
    * scalatest-scalacheck bridge; plain Gen sampling serves the same end) */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("BoundedTopK equals the sort-take model and the window idiom on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy score ties (small score range) to stress the payload tiebreak
    val rows = (1 to 400).map { i =>
      (s"g${rnd.nextInt(8)}", rnd.nextInt(6).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(7)
    for (k <- Seq(1, 3, 17)) {
      val got = graft.ext.Corpus.topKPerGroupAgg(df, "g", "score", "id", k)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val model = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
          .map { case ((_, s, id), i) => (g, i + 1, id, s) }
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == model, s"k=$k")
      val win = graft.ext.Corpus.topKPerGroup(df, "g", "score", "id", k)
        .select(col("g"), col("rank").cast("int"), col("id"), col("score"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(got.toSeq == win.toSeq, s"window parity k=$k")
    }
  }

  test("bpeMergeOnce equals the greedy left-scan model on random symbol runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("a", "b", "ab")
    val words = (1 to 120).map { _ =>
      (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(3)))
    }
    def model(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
        else out += s
      }
      out.toList
    }
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("ab", "a"))) {
      val got = words.map(Tuple1(_)).toDF("syms")
        .select(graft.ext.Corpus.bpeMergeOnce(col("syms"), a, b).as("m"))
        .collect().map(_.getSeq[String](0))
      assert(got.toSeq == words.map(w => model(w, a, b)), s"pair ($a,$b)")
    }
  }

  test("mergeDocBasis equals the last-non-null-wins model on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (s"k${rnd.nextInt(20)}", i.toLong,
        if (rnd.nextBoolean()) Some(s"a$i") else None,
        if (rnd.nextBoolean()) Some(rnd.nextInt(100)) else None)
    }
    val df = rows.toDF("id", "ord", "x", "y")
    val got = MergeOps.mergeDocBasis(df, Seq("id"), "ord").collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    // model: per key, fold in ord order, later present fields overwrite
    val model = rows.groupBy(_._1).map { case (k, rs) =>
      val sorted = rs.sortBy(_._2)
      k -> (sorted.flatMap(_._3).lastOption, sorted.flatMap(_._4).lastOption)
    }
    assert(got == model)
  }

  test("attachKeyless equals forward-fill model") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { i =>
      (rnd.nextInt(10).toLong, i.toLong,
        if (rnd.nextInt(3) == 0) Some(s"k${rnd.nextInt(5)}") else None, s"v$i")
    }
    val df = rows.toDF("doc", "ord", "key", "v")
    val got = MergeOps.attachKeyless(df, Seq("key"), "doc", "ord")
      .collect().map(r => r.getString(3) -> Option(r.getString(2))).toMap
    val model = rows.groupBy(_._1).flatMap { case (_, rs) =>
      var last: Option[String] = None
      rs.sortBy(_._2).map { r =>
        if (r._3.isDefined) last = r._3
        r._4 -> last
      }
    }
    assert(got == model)
  }

  test("shingles equal the sliding-window model for arbitrary token counts") {
    import spark.implicits._
    samples(Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(1, 4)), 6).foreach { case (nTokens, n) =>
      val text = (1 to nTokens).map(i => s"w${i % 3}").mkString(" ")
      val got = Seq(text).toDF("t")
        .select(Dedup.shingles(col("t"), n).as("s"))
        .collect().head.getSeq[String](0).toList
      val toks = text.split(" ").filter(_.nonEmpty).toList
      val model = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList.distinct
      assert(got == model)
    }
  }

  test("jaccardPairs equals brute-force set jaccard on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 12L).map { i =>
      i -> (1 to (5 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, "doc_id", "text", n = 2, minSim = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def sh(t: String) = t.split(" ").toList.sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")).toSet
    val model = (for {
      (i, ti) <- docs; (j, tj) <- docs if i < j
      si = sh(ti); sj = sh(tj)
      inter = (si & sj).size if inter > 0
      jac = inter.toDouble / (si | sj).size if jac >= 0.1
    } yield (i, j) -> (math.rint(jac * 10000) / 10000)).toMap
    assert(got == model)
  }

  test("hash digest is deterministic and collision-free on distinct tuples") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"n$i", s"c${i % 37}")).distinct
    val df = rows.toDF("name", "code")
    val ids = df.select(graft.expr.IdentityDigest.hashDigest(Seq("name", "code")))
      .collect().map(_.getString(0))
    assert(ids.distinct.length == rows.size)
    val ids2 = df.select(graft.expr.IdentityDigest.hashDigest(Seq("name", "code")))
      .collect().map(_.getString(0))
    assert(ids.toSeq == ids2.toSeq)
  }

  test("FilterExpr.compile agrees with a three-valued-logic Scala model on random trees") {
    import graft.expr.FilterExpr
    import FilterExpr._
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(5)
    val rows: Seq[(Long, Option[Long], Option[String])] = (0 until 60).map { i =>
      (i.toLong,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(10).toLong),
        if (rnd.nextInt(4) == 0) None else Some(s"s${rnd.nextInt(4)}"))
    }
    val df = rows.toDF("id", "x", "s")

    def genLeaf(): FilterExpr = rnd.nextInt(6) match {
      case 0 => FilterExpr.eq("x", rnd.nextInt(10).toLong)
      case 1 => gt("x", rnd.nextInt(10).toLong)
      case 2 => lte("x", rnd.nextInt(10).toLong)
      case 3 => in("s", Seq(s"s${rnd.nextInt(4)}", s"s${rnd.nextInt(4)}"))
      case 4 => isNull("s")
      case 5 => neq("s", s"s${rnd.nextInt(4)}")
    }
    def gen(depth: Int): FilterExpr =
      if (depth == 0) genLeaf()
      else rnd.nextInt(4) match {
        case 0 => And(Seq(gen(depth - 1), gen(depth - 1)))
        case 1 => Or(Seq(gen(depth - 1), gen(depth - 1)))
        case 2 => Not(gen(depth - 1))
        case 3 => IfThen(gen(depth - 1), gen(depth - 1))
      }

    // SQL three-valued logic model: None = unknown
    def evalM(e: FilterExpr, x: Option[Long], s: Option[String]): Option[Boolean] = e match {
      case Cmp("x", CmpOp.Eq, v)  => x.map(_ == v.asInstanceOf[Long])
      case Cmp("x", CmpOp.Gt, v)  => x.map(_ > v.asInstanceOf[Long])
      case Cmp("x", CmpOp.Lte, v) => x.map(_ <= v.asInstanceOf[Long])
      case Cmp("s", CmpOp.In, vs) => s.map(sv => vs.asInstanceOf[Seq[Any]].contains(sv))
      case Cmp("s", CmpOp.IsNull, _)  => Some(s.isEmpty)
      case Cmp("s", CmpOp.Neq, v) => s.map(_ != v.asInstanceOf[String])
      case And(es) =>
        val vs = es.map(evalM(_, x, s))
        if (vs.contains(Some(false))) Some(false)
        else if (vs.forall(_.contains(true))) Some(true) else None
      case Or(es) =>
        val vs = es.map(evalM(_, x, s))
        if (vs.contains(Some(true))) Some(true)
        else if (vs.forall(_.contains(false))) Some(false) else None
      case Not(a) => evalM(a, x, s).map(!_)
      case IfThen(a, b) => evalM(Or(Seq(Not(a), b)), x, s)
      case other => fail(s"unexpected $other")
    }

    (1 to 25).foreach { _ =>
      val e = gen(2 + rnd.nextInt(2))
      val got = df.where(FilterExpr.compile(e)).select("id").collect()
        .map(_.getLong(0)).toSet
      val want = rows.filter { case (_, x, s) => evalM(e, x, s).contains(true) }
        .map(_._1).toSet
      assert(got == want, s"tree: $e")
    }
  }

  test("name functions round-trip: snake→camel→snake is identity on clean names") {
    samples(Gen.nonEmptyListOf(Gen.oneOf("foo", "bar", "baz", "qux")), 20).foreach { parts =>
      val snake = parts.mkString("_")
      val there = TransformLib.snakeToCamelName(snake)
      val back = TransformLib.camelToSnakeName(there)
      assert(back == snake)
    }
  }

  test("dupNgramCharFrac equals the multiset model on random repetitive docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // small vocab forces plenty of duplicate bigrams
    val docs = (1 to 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(5)}").mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select(col("id"), graft.ext.TextAnalysis.dupNgramCharFrac(col("text"), 2).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val model = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val bigs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val norm = toks.mkString(" ")
      val dupChars = bigs.groupBy(identity).collect {
        case (g, occ) if occ.size > 1 => occ.size.toLong * g.length
      }.sum
      val f =
        if (norm.isEmpty) 0.0
        else BigDecimal(math.min(dupChars.toDouble / norm.length, 1.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> f
    }.toMap
    assert(got == model)
  }

  test("packSequences equals the global prefix-sum model on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(9))).map(j => s"w$j").mkString(" "))
    }
    val budget = 17
    val got = graft.ext.Corpus
      .packSequences(docs.toDF("id", "text"), "id", "text", budget, nShards = 5)
      .select("id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // model: lay docs out by (md5 shard draw, md5 order draw), then chunk
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = docs.sortBy { case (id, _) =>
      val shard = java.lang.Long.parseLong(md5hex(s"s:$id").take(8), 16) % 5
      (shard, md5hex(s"o:$id"), id)
    }
    var cum = 0L
    val model = ordered.map { case (id, text) =>
      val n = text.split("\\s+").count(_.nonEmpty).toLong
      val start = cum; cum += n
      id -> (start / budget, start % budget)
    }.toMap
    assert(got == model)
  }
}

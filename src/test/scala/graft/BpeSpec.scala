package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.sources.Tables

/** P1 gates: the merge trainer reproduces the published algorithm on
  * a hand-computed corpus, encode lengths follow the greedy
  * rank-order apply, the native scoring pass equals a plain-Scala
  * recompute under the frozen model, and scoring is narrow (no
  * explode/join/shuffle). */
class BpeSpec extends SparkSpec {

  test("merge trainer matches the hand-computed published example") {
    // the classic BPE walkthrough corpus (HF course / Sennrich fig.):
    // pair counts round 1: (u,g)=20, (p,u)=17, (u,n)=16, (h,u)=15 ...
    val wf = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L,
      "hugs" -> 5L)
    val merges = Bpe.trainMerges(wf, numMerges = 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")),
      s"got $merges")
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeLen("hug", ranks) == 1)   // h u g -> h ug -> hug
    assert(Bpe.encodeLen("hugs", ranks) == 2)  // -> hug s
    assert(Bpe.encodeLen("pun", ranks) == 2)   // -> p un
    assert(Bpe.encodeLen("bug", ranks) == 2)   // -> b ug
    assert(Bpe.encodeLen("mud", ranks) == 3)   // no merge applies
  }

  test("merge ties break on the lexicographically smallest pair; rare pairs never merge") {
    // "ab" and "cd" both occur twice; (a,b) < (c,d) must win round 1.
    val merges = Bpe.trainMerges(Seq("ab" -> 2L, "cd" -> 2L, "xy" -> 1L),
      numMerges = 10)
    assert(merges == Seq(("a", "b"), ("c", "d")), s"got $merges")
  }

  test("native scoring equals a plain-Scala recompute of the frozen contract") {
    val m = Bpe.model(spark, sfDir)
    assert(m.vocab.nonEmpty && m.coverage > 0.5,
      s"vocab ${m.vocab.size}, coverage ${m.coverage} — top-V should cover most mass")
    val counts = m.vocab.toMap
    val got = Bpe.tokenCountsBpe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.length == texts.size)
    got.foreach { case (id, nWords, nBpe) =>
      val words = texts(id).split(" ", -1)
      assert(nWords == words.length, s"doc $id word count")
      val expect = words.map(w =>
        counts.getOrElse(w, w.codePointCount(0, w.length).toLong)).sum
      assert(nBpe == expect, s"doc $id: got $nBpe want $expect")
    }
    // the learned count must differ from the whitespace heuristic
    // somewhere, or the "tokenizer" learned nothing
    assert(got.exists { case (_, nW, nB) => nB != nW },
      "BPE counts identical to word counts everywhere")
  }

  test("token-budget packing under the learned counter matches a driver-side recompute") {
    val m = Bpe.model(spark, sfDir)
    val counts = m.vocab.toMap
    val budget = 1000L
    val got = graft.operators.Sampling.tokenBudgetBpe(spark, sfDir, budget)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // recompute: per source, docs in (md5(doc_id:budget), doc_id)
    // order, running BPE-token sum cut at the budget
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"),
        md5(concat(col("doc_id").cast("string"), lit(":budget"))).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def bpeTokens(text: String): Long =
      text.split(" ", -1).map(w =>
        counts.getOrElse(w, w.codePointCount(0, w.length).toLong)).sum
    val expect = docs.groupBy(_._2).values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, _, text, _) =>
        cum += bpeTokens(text)
        if (cum <= budget) Some((id, bpeTokens(text), cum)) else None
      }
    }.toSet
    assert(got.toSet == expect,
      s"BPE-budget cut diverged: ${got.length} vs ${expect.size} rows")
    assert(got.nonEmpty, "budget emitted nothing — fixture too tight")
  }

  test("OOV drift monitor: in-vocab corpus reads 0, a drifted source trips the stale bar") {
    import spark.implicits._
    val m = Bpe.model(spark, sfDir)
    val base = Bpe.oovDriftFrom(spark, Tables.documents(spark, sfDir), m)
      .collect()
    assert(base.nonEmpty)
    // the corpus the vocab was trained on covers itself
    base.foreach(r => assert(r.getLong(2) == 0L && !r.getBoolean(4),
      s"source ${r.getString(0)} has phantom OOV mass"))
    // a drifted source: half its tokens are novel -> frac 0.5 > bar
    val drifted = Seq(
      (1L, "the quick zzqj wwxk the vvnm ppqr of", "drifted"),
      (2L, "a zzqj wwxk and vvnm ppqr to here", "drifted"))
      .toDF("doc_id", "text", "source")
    val got = Bpe.oovDriftFrom(spark, drifted, m).collect().head
    assert(got.getLong(2) > 0 && got.getBoolean(4),
      s"drifted source not flagged: oov=${got.getLong(2)} frac=${got.getDouble(3)}")
  }

  test("scoring is one narrow pass: no explode, no join, no aggregate before the sort") {
    val m = Bpe.model(spark, sfDir)
    val plan = finalPlan(Bpe.tokenCountsBpeFrom(spark,
      Tables.documents(spark, sfDir), m))
    assert(!plan.contains("Join") && !plan.contains("Generate") &&
      !plan.contains("HashAggregate"),
      s"BPE scoring must be a narrow projection:\n$plan")
  }

  test("fertility monitor: hand-computed ratios on a fixture; corpus rows well-formed") {
    import spark.implicits._
    val m = Bpe.model(spark, sfDir)
    val vm = m.vocab.toMap
    def tok(w: String) = vm.getOrElse(w, w.length.toLong)
    val docs = Seq(
      (1L, "the quick zzqj", "s1"),
      (2L, "of the", "s1"),
      (3L, "zzqjq wwxkx", "s2")).toDF("doc_id", "text", "source")
    val got = Bpe.fertilityFrom(spark, docs, m).collect()
    val exp = Map(
      "s1" -> (("the quick zzqj".length + "of the".length.toLong, 5L,
        Seq("the", "quick", "zzqj", "of", "the").map(tok).sum)),
      "s2" -> (("zzqjq wwxkx".length.toLong, 2L,
        Seq("zzqjq", "wwxkx").map(tok).sum)))
    assert(got.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    got.foreach { r =>
      val (nc, nw, nt) = exp(r.getString(0))
      assert(r.getLong(1) == nc && r.getLong(2) == nw && r.getLong(3) == nt,
        s"sums diverged for ${r.getString(0)}: $r vs ($nc,$nw,$nt)")
      assert(math.abs(r.getDouble(4) - nt.toDouble / nw) < 1e-6)
      assert(math.abs(r.getDouble(5) - nc.toDouble / nt) < 1e-6)
    }
    val corpus = Bpe.fertility(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
      // the training corpus is covered by its own vocab, so every
      // whitespace word costs >= 1 BPE token
      assert(r.getDouble(4) >= 1.0 - 1e-9,
        s"fertility < 1 for ${r.getString(0)}")
    }
  }

  test("truncation-loss report: hand-computed per-window sums on a fixture; monotone on the corpus") {
    import spark.implicits._
    val m = Bpe.model(spark, sfDir)
    val vm = m.vocab.toMap
    def bpe(text: String) =
      text.split(" ").map(w => vm.getOrElse(w, w.length.toLong)).sum
    // doc token counts straddle the 512 bar via an OOV word fallback
    // (chars = tokens), so the fixture prices a real truncation
    val big = "z" * 600                       // OOV -> 600 tokens
    val docs = Seq(
      (1L, "the quick", "s"), (2L, big, "s"), (3L, "of", "s"))
      .toDF("doc_id", "text", "source")
    val counts = Seq(bpe("the quick"), bpe(big), bpe("of"))
    val got = Bpe.truncationLossFrom(spark, docs, m).collect()
    assert(got.map(_.getLong(0)).toSeq ==
      Bpe.CtxWindows.map(_.toLong))
    got.foreach { r =>
      val w = r.getLong(0)
      assert(r.getLong(1) == 3L)
      assert(r.getLong(2) == counts.count(_ > w))
      assert(r.getLong(3) == counts.sum)
      assert(r.getLong(4) == counts.map(math.min(_, w)).sum)
      assert(math.abs(r.getDouble(5) -
        (1.0 - counts.map(math.min(_, w)).sum.toDouble / counts.sum)) < 1e-6)
    }
    assert(got.head.getLong(2) == 1L, "600-token doc must truncate at 512")
    // corpus: kept tokens monotone non-decreasing, loss non-increasing
    val corpus = Bpe.truncationLoss(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(4) <= b.getLong(4))
        assert(a.getDouble(5) >= b.getDouble(5) - 1e-9)
      case _ =>
    }
  }

  test("tokenize export: piece streams reconstruct text, agree with the count pass, and OOV falls back per char") {
    import spark.implicits._
    val m = Bpe.model(spark, sfDir)
    val pm = Bpe.pieceModel(m)
    // every vocab word's run has the length encodeLen promised
    val ranks = m.merges.zipWithIndex.toMap
    m.vocab.zipWithIndex.foreach { case ((w, n), i) =>
      assert(pm.wordIds(i).length == n,
        s"piece run of '$w' is ${pm.wordIds(i).length}, counts said $n")
      // and the run decodes back to the word
      assert(pm.wordIds(i).map(pm.pieces).mkString == w)
      assert(Bpe.encodePieces(w, ranks).mkString == w)
    }
    // fixture: one in-vocab word, one OOV word with a char outside
    // every learned piece ('é' if absent) -> catch-all id
    val inv = m.vocab.head._1
    val docs = Seq((1L, s"$inv zqé", "s")).toDF("doc_id", "text", "source")
    val rows = Bpe.tokenizeExportFrom(spark, docs, m).collect()
    val expInv = pm.wordIds.head.map(_.toLong)
    assert(rows.take(expInv.length).map(_.getLong(2)).toSeq == expInv,
      "in-vocab word must emit its precomputed run")
    val oov = rows.drop(expInv.length).map(_.getLong(2))
    assert(oov.length == 3, s"OOV 'zqé' must emit 3 char ids, got ${oov.length}")
    def charId(c: Char): Long = {
      val i = pm.pieces.indexOf(c.toString)
      if (i >= 0) i.toLong else pm.pieces.length.toLong + c.toInt
    }
    assert(oov.toSeq == Seq(charId('z'), charId('q'), charId('é')))
    assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
    // corpus consistency theorem: per doc, |export| == n_bpe_tokens
    val exportLens = Bpe.tokenizeExport(spark, sfDir)
      .groupBy("doc_id").count()
    val counts = Bpe.tokenCountsBpe(spark, sfDir)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val diff = exportLens.join(counts, Seq("doc_id"), "full")
      .where(coalesce(col("count"), lit(0L)) =!=
        coalesce(col("n_bpe_tokens"), lit(0L)))
      .count()
    assert(diff == 0L, s"$diff docs where export length != counted tokens")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }
}

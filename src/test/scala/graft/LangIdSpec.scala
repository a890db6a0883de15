package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.{LangId, TextAnalysis}

/** Trained langid (hashed char-trigram Naive Bayes) vs the E1
  * stopword heuristic, on a PLANTED real-multilingual fixture — the
  * sf corpora can't host this comparison because their text is the
  * same token soup under every declared tag (N2's finding), so the
  * accuracy claim is gated here: held-out sentences, NB must clear
  * 90% and strictly beat E1. */
class LangIdSpec extends SparkSpec {

  private val trainDocs = Seq(
    // en
    "the weather is lovely today and the garden is full of flowers",
    "she walked to the market and bought a basket of fresh bread",
    "this book is one of the best stories i have ever read",
    "the children are playing in the park near the old bridge",
    "we should meet for coffee and talk about the new project",
    "a quiet morning by the sea is all that he ever wanted",
    // es
    "el tiempo es muy agradable hoy y el jardín está lleno de flores",
    "ella caminó al mercado y compró una cesta de pan fresco",
    "este libro es una de las mejores historias que he leído",
    "los niños están jugando en el parque cerca del puente viejo",
    "deberíamos quedar para tomar café y hablar del nuevo proyecto",
    "una mañana tranquila junto al mar es todo lo que él quería",
    // fr
    "le temps est très agréable aujourd'hui et le jardin est plein de fleurs",
    "elle est allée au marché et a acheté un panier de pain frais",
    "ce livre est une des meilleures histoires que j'ai jamais lues",
    "les enfants jouent dans le parc près du vieux pont",
    "nous devrions prendre un café et parler du nouveau projet",
    "un matin calme au bord de la mer est tout ce qu'il voulait",
    // de
    "das wetter ist heute sehr schön und der garten ist voller blumen",
    "sie ging zum markt und kaufte einen korb mit frischem brot",
    "dieses buch ist eine der besten geschichten die ich je gelesen habe",
    "die kinder spielen im park in der nähe der alten brücke",
    "wir sollten uns auf einen kaffee treffen und über das neue projekt sprechen",
    "ein ruhiger morgen am meer war alles was er sich je wünschte",
    // zh
    "今天天气非常好花园里开满了鲜花",
    "她走到市场买了一篮新鲜的面包",
    "这本书是我读过的最好的故事之一",
    "孩子们在老桥附近的公园里玩耍",
    "我们应该一起喝咖啡聊聊新项目",
    "海边宁静的早晨是他一直想要的")
  private val trainLangs =
    Seq.fill(6)("en") ++ Seq.fill(6)("es") ++ Seq.fill(6)("fr") ++
      Seq.fill(6)("de") ++ Seq.fill(6)("zh")

  private val testDocs = Seq(
    "the train arrived late but the journey was pleasant and warm",
    "my sister lives in a small house near the river with her dog",
    "el tren llegó tarde pero el viaje fue agradable y cálido",
    "mi hermana vive en una casa pequeña cerca del río con su perro",
    "le train est arrivé en retard mais le voyage était agréable",
    "ma sœur habite une petite maison près de la rivière avec son chien",
    "der zug kam spät an aber die reise war angenehm und warm",
    "meine schwester wohnt in einem kleinen haus am fluss mit ihrem hund",
    "火车虽然晚点了但是旅途很愉快",
    "我的妹妹和她的狗住在河边的一所小房子里")
  private val testLangs =
    Seq("en", "en", "es", "es", "fr", "fr", "de", "de", "zh", "zh")

  private def frame(texts: Seq[String], langs: Seq[String]) = {
    import spark.implicits._
    texts.zip(langs).zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
  }

  /** E1's argmax, reconstructed from its published pieces (the guess
    * column itself is inlined in TextAnalysis.langId). */
  private def e1Guess = {
    val p = Portable.padded(col("text"))
    val Seq(en, es, fr, de) = TextAnalysis.stopwords.map { case (_, ws) =>
      Portable.stopwordHits(p, ws)
    }
    when(en + es + fr + de === 0, "und")
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  test("trained trigram NB beats the E1 stopword heuristic on held-out multilingual text") {
    val m = LangId.train(spark, frame(trainDocs, trainLangs))
    assert(m.langs == IndexedSeq("de", "en", "es", "fr", "zh"))
    val test = frame(testDocs, testLangs)
    val pred = LangId.langidTrainedFrom(test, m)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbAcc = testLangs.indices.count(i =>
      pred(i.toLong) == testLangs(i)).toDouble / testLangs.size
    val e1 = test.select(col("doc_id"), e1Guess.as("g")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e1Acc = testLangs.indices.count(i =>
      e1(i.toLong) == testLangs(i)).toDouble / testLangs.size
    assert(nbAcc >= 0.9, s"NB held-out accuracy $nbAcc < 0.9 (pred: $pred)")
    assert(nbAcc > e1Acc,
      s"trained langid ($nbAcc) does not beat the E1 heuristic ($e1Acc)")
  }

  test("native gram buckets match the spelled-out built-in chain bit-for-bit") {
    // the DuckDB twin mirrors the portable chain term for term, so
    // native == portable pins the oracle equivalence — incl. zh
    // multi-byte code points, diacritics, and the empty/NULL text
    // degenerate (one-space-pair grams)
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val texts = (trainDocs ++ testDocs ++ Seq("", "É ü ß 中文", null))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val nat = call_function("graft_gram_buckets",
      coalesce(col("text"), lit("")), lit("lid"), lit(LangId.LDim))
    val mismatches = df.select(
      nat.as("a"), LangId.gramsOfPortable(col("text")).as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(mismatches == 0)
  }

  test("native NB score kernel matches the spelled-out per-class folds bit-for-bit") {
    // the DuckDB twin is prior + list_sum(list_transform(...)) per
    // class — the portable fold mirrors it term for term, so native ==
    // portable pins the oracle equivalence of the fused kernel (one
    // pass, K lockstep accumulators) incl. zh multi-byte text and the
    // empty/NULL degenerates (where scores are the priors plus the
    // one-space-pair grams' contributions)
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val m = LangId.train(spark, frame(trainDocs, trainLangs))
    val df = (trainDocs ++ testDocs ++ Seq("", "É ü ß 中文", null))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val gs = LangId.gramsOfPortable(col("text"))
    val nat = LangId.nbScoresNative(spark, gs, m)
    val mismatches = df.select(
      array(m.langs.indices.map(i => round(element_at(nat, i + 1), 9)): _*)
        .as("a"),
      array(m.langs.indices.map(i =>
        LangId.scoreOfPortable(gs, m.logPrior(i), m.logProb(i))): _*)
        .as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(mismatches == 0)
  }

  test("NB training is bit-deterministic (integer counts -> frozen logs)") {
    // unlike the k-means trainers, NB's artifact derives from EXACT
    // integer counts (order-independent aggregation) — retrains must
    // agree to the bit at any parallelism
    val a = LangId.train(spark, frame(trainDocs, trainLangs))
    val b = LangId.train(spark,
      frame(trainDocs, trainLangs).repartition(7))
    assert(a == b)
  }

  test("scoring tie-break is the ascending-lang order") {
    // a doc whose trigrams hit NO trained bucket... is impossible to
    // plant reliably; instead pin the structural tie: two classes with
    // IDENTICAL training text must tie on every doc and resolve to the
    // lexicographically smaller tag
    import spark.implicits._
    val twin = Seq(
      (0L, "aaa bbb ccc", "xa"), (1L, "aaa bbb ccc", "xb"))
      .toDF("doc_id", "text", "lang")
    val m = LangId.train(spark, twin)
    val out = LangId.langidTrainedFrom(
      Seq((9L, "aaa bbb")).toDF("doc_id", "text"), m).collect()
    assert(out.head.getString(2) == "xa")
  }
}

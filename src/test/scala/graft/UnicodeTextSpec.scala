package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** r12 Unicode token-contract spec (SURVEY §4): (1) the Unicode tokenizer,
  * BPE-ish segmenter, and punctuation class are EXACTLY the historical
  * ASCII forms on ASCII text — the property that keeps every existing
  * oracle hash-stable on the ASCII testdata; (2) CJK / Cyrillic / Greek
  * documents produce NON-degenerate tokens, shingles, and BM25 postings —
  * the capability gap the r11 verdict ranked first; (3) the extended
  * language-ID rule (7 stopword + 5 script languages) identifies sample
  * docs; (4) the LM/BPE char alphabet stays the documented ASCII band.
  */
class UnicodeTextSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(20260816L)
  private def randPrintable(n: Int): String =
    (0 until n).map { _ =>
      val r = rng.nextInt(99)
      if (r < 95) (32 + r).toChar
      else Seq('\t', '\n', '\f', '\r')(r - 95)
    }.mkString

  test("Unicode tokenizer ≡ [a-z0-9]+ on ASCII text (500-string property)") {
    val docs = (0 until 500).map(i => (i.toLong, randPrintable(80))).toDF("doc_id", "text")
    val cmp = docs.select(
      TextOps.toks(col("text")).as("uni"),
      regexp_extract_all(lower(coalesce(col("text"), lit(""))),
        lit("[a-z0-9]+"), lit(0)).as("ascii"))
    assert(cmp.filter(col("uni") =!= col("ascii")).count() == 0)
  }

  test("Unicode BPE-ish segmenter ≡ [a-z]+|[0-9]+|[^a-z0-9\\s] on ASCII") {
    val docs = (0 until 500).map(i => (i.toLong, randPrintable(80))).toDF("doc_id", "text")
    val cmp = docs.select(
      regexp_extract_all(lower(col("text")), lit(TextOps.BpeTokRe), lit(0)).as("uni"),
      regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)).as("ascii"))
    assert(cmp.filter(col("uni") =!= col("ascii")).count() == 0)
  }

  test("Unicode punctuation class ≡ [a-z0-9\\s] complement on ASCII") {
    val docs = (0 until 500).map(i => (i.toLong, randPrintable(80))).toDF("doc_id", "text")
    val cmp = docs.select(
      length(regexp_replace(lower(col("text")), TextOps.AlnumWs, "")).as("uni"),
      length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", "")).as("ascii"))
    assert(cmp.filter(col("uni") =!= col("ascii")).count() == 0)
  }

  test("native tokenizer kernels ≡ the regex spellings on mixed-script input") {
    // the codegen'd kernels (functions/TextTokens) ARE the token contract's
    // hot-path implementation; this property pins them to the regex forms
    // over random strings drawn from ASCII + Latin-1 + Greek + Cyrillic +
    // CJK + punctuation ranges, plus the nasty corners (U+3007 is
    // script-Han AND \p{N} — it must JOIN runs, not split as a unigram;
    // surrogate-pair codepoints; empty; uppercase)
    val ranges = Seq((32, 126), (0xC0, 0xFF), (0x391, 0x3C9), (0x410, 0x44F),
      (0x4E00, 0x4E80), (0x3040, 0x30FF), (0xAC00, 0xAC7F), (0x2000, 0x206F))
    def randMixed(n: Int): String = (0 until n).map { _ =>
      val (lo, hi) = ranges(rng.nextInt(ranges.length))
      (lo + rng.nextInt(hi - lo + 1)).toChar
    }.mkString
    val docs = ((0 until 300).map(i => (i.toLong, randMixed(50))) ++ Seq(
      (900L, "mixed漢abc 12"), (901L, "café ñandú 7"), (902L, "привет mir"),
      (903L, "〇三漢12abc〇"), (904L, ""), (905L, "ONLY UPPER ASCII 99"),
      (906L, new String(Character.toChars(0x1F600)) + " emoji 𝔘𝔫𝔦")))
      .toDF("doc_id", "text")
    val lowered = lower(coalesce(col("text"), lit("")))
    val cmp = docs.select(
      TextOps.toks(col("text")).as("native"),
      regexp_extract_all(lowered, lit(TextOps.TokRe), lit(0)).as("re"))
    assert(cmp.filter(col("native") =!= col("re")).count() == 0)
    val cmp2 = docs.select(
      TextOps.bpeSegs(lowered).as("native"),
      regexp_extract_all(lowered, lit(TextOps.BpeTokRe), lit(0)).as("re"))
    assert(cmp2.filter(col("native") =!= col("re")).count() == 0)
    val cmp3 = docs.select(
      TextOps.punctCount(lowered).as("native"),
      length(regexp_replace(lowered, TextOps.AlnumWs, "")).as("re"))
    assert(cmp3.filter(col("native") =!= col("re")).count() == 0)
  }

  test("CJK docs tokenize to codepoint unigrams; mixed script splits correctly") {
    val t = Seq((1L, "漢字テスト"), (2L, "mixed漢abc 12"), (3L, "한국어 텍스트"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.toks(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(t(1L) == Seq("漢", "字", "テ", "ス", "ト"))
    assert(t(2L) == Seq("mixed", "漢", "abc", "12"))
    assert(t(3L) == Seq("한", "국", "어", "텍", "스", "트"))
  }

  test("Cyrillic/Greek tokens are whole words; shingles are non-degenerate") {
    val docs = Seq(
      (1L, "привет мир как дела сегодня"),
      (2L, "καλημέρα κόσμε τι κάνεις σήμερα"),
      (3L, "深層学習の訓練データを重複排除する処理系")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      size(TextOps.toks(col("text"))).as("nt"),
      size(TextOps.shingles(TextOps.toks(col("text")))).as("ns")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((5, 3)))  // 5 words -> 3 word-3-grams
    assert(out(2L) == ((5, 3)))
    // the CJK doc tokenizes per codepoint, so shingles become codepoint
    // 3-grams — the Lucene-CJK indexing unit, emphatically non-degenerate
    assert(out(3L)._1 > 15 && out(3L)._2 == out(3L)._1 - 2)
  }

  test("BM25 postings and retrieval are non-degenerate on a CJK corpus") {
    // doc 0/1 share most codepoints; doc 2+ are distinct — lexicalTopkOf
    // (queries = first 10 doc ids) must retrieve 1 for 0 and 0 for 1
    val docs = Seq(
      (0L, "深層学習の訓練データ重複排除"),
      (1L, "深層学習の訓練データ品質評価"),
      (2L, "まったく別の話題について書く"),
      (3L, "совсем другая тема здесь"),
      (4L, "совсем другая тема письма")).toDF("doc_id", "text")
    val topk = graft.llm.Lexical.lexicalTopkOf(docs)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nb_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(topk(0L) == 1L && topk(1L) == 0L)
    assert(topk(3L) == 4L && topk(4L) == 3L)
  }

  test("extended langid identifies script-tier and stopword-tier samples") {
    val docs = Seq(
      (1L, "the quick brown fox is on the hill with a dog", "en"),
      (2L, "der hund ist auf den berg mit der katze und ein vogel", "de"),
      (3L, "le chat est dans la maison pour le dîner et les amis", "fr"),
      (4L, "el perro es para la casa con los gatos y una luz", "es"),
      (5L, "il gatto è per la casa con un cane e del pane", "it"),
      (6L, "o cão é para a casa com um gato e do pão que corre", "pt"),
      (7L, "de hond is in het huis met een kat en van de vogel op dat dak", "nl"),
      (8L, "привет мир как дела сегодня вечером", "ru"),
      (9L, "καλημέρα κόσμε τι κάνεις σήμερα το βράδυ", "el"),
      (10L, "深度学习训练数据的大规模去重处理系统", "zh"),
      (11L, "深層学習のデータをきれいにする処理", "ja"),
      (12L, "대규모 학습 데이터 중복 제거 시스템", "ko")).toDF("doc_id", "text", "want")
    val pred = graft.llm.TextOps.langidOf(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("lang_pred"))
      .join(docs.select(col("doc_id"), col("want")), Seq("doc_id"))
    val wrong = pred.filter(col("lang_pred") =!= col("want")).collect()
    assert(wrong.isEmpty, s"mispredicted: ${wrong.mkString(", ")}")
  }

  test("script profile counts and dominant script") {
    val docs = Seq(
      (1L, "abc привет 漢字 12!"),
      (2L, "hello world"),
      (3L, "12345 !!!")).toDF("doc_id", "text")
    val p = graft.llm.TextOps.textScriptProfileOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = p(1L)
    assert(r1.getAs[Int]("n_latin") == 3 && r1.getAs[Int]("n_cyr") == 6 &&
      r1.getAs[Int]("n_han") == 2 && r1.getAs[Int]("n_digit") == 2 &&
      r1.getAs[Int]("n_other") == 1)
    assert(r1.getAs[String]("main_script") == "cyr")
    assert(p(2L).getAs[String]("main_script") == "latin")
    assert(p(3L).getAs[String]("main_script") == "none")
  }

  test("LM/BPE char stream keeps the ASCII band and skips out-of-band tokens") {
    val docs = Seq((1L, "alpha Привет beta 42"), (2L, "漢字 only")).toDF("doc_id", "text")
    val s = docs.select(col("doc_id"), graft.llm.TextOps.lmNorm(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(1L) == "alpha beta 00")
    assert(s(2L) == "only")
  }

  test("capex token contract (TextMatch) is untouched by the Unicode lift") {
    val toks = graft.functions.TextMatch.Ref.tokens("Don't re-use CCTV 漢字")
    assert(toks == Vector("don't", "re", "use", "cctv"))
  }
}

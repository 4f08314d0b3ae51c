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

  test("RE2 oracle spellings ≡ native kernels under leftmost-first alternation") {
    // r13 (r12 ADVICE, high): RE2 — like java.util.regex — takes the
    // FIRST matching alternative, and a handful of codepoints are
    // CJK-script AND \p{N} (U+3007, U+3021-3029, U+3038-303A). The SQL
    // spellings must therefore list the run alternative first, or the
    // DuckDB oracle splits those codepoints as unigrams while the Spark
    // kernel joins them into runs. This property compiles the RE2
    // spellings IN java.util.regex (same leftmost-first semantics; only
    // the script-name spelling differs: \p{Han} → \p{IsHan}) and pins
    // them to the native kernels over mixed-script strings salted with
    // the Han-numeric corners in run-initial/medial/final positions.
    def j(re2: String): java.util.regex.Pattern =
      java.util.regex.Pattern.compile(
        re2.replaceAll("""\\(p|P)\{([A-Z][a-z]+)\}""", """\\$1{Is$2}"""))
    def findAll(p: java.util.regex.Pattern, s: String): Seq[String] = {
      val m = p.matcher(s); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(); b.result()
    }
    val tokP = j(TextOps.TokReSql)
    val bpeP = j(TextOps.BpeTokReSql)
    val hanNums = "〇" + new String((0x3021 to 0x3029).map(_.toChar).toArray) +
      new String((0x3038 to 0x303A).map(_.toChar).toArray)
    val ranges = Seq((32, 126), (0x391, 0x3C9), (0x410, 0x44F),
      (0x4E00, 0x4E20), (0x3040, 0x30FF), (0xE00, 0xE5B), (0xE80, 0xEDF),
      (0x1780, 0x17DD), (0x1000, 0x109F))
    def randMixed(n: Int): String = (0 until n).map { _ =>
      if (rng.nextInt(5) == 0) hanNums(rng.nextInt(hanNums.length))
      else {
        val (lo, hi) = ranges(rng.nextInt(ranges.length))
        (lo + rng.nextInt(hi - lo + 1)).toChar
      }
    }.mkString
    val corners = Seq("二〇〇八年", "〇", "〇〇", "a〇b", "〇三漢12abc〇",
      "๕๕ไทย", "໑ລາວ", "၁၂မြန်မာ", "year〇", "〇year", "漢〇漢")
    val inputs = (0 until 400).map(_ => randMixed(60)) ++ corners
    import org.apache.spark.unsafe.types.UTF8String
    for (s0 <- inputs) {
      val s = s0.toLowerCase
      val nat = graft.functions.TextLang.tokens(UTF8String.fromString(s))
        .toArray[AnyRef](org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
      assert(nat == findAll(tokP, s), s"TokReSql diverges on: $s")
      val natB = graft.functions.TextLang.bpeSegs(UTF8String.fromString(s))
        .toArray[AnyRef](org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
      assert(natB == findAll(bpeP, s), s"BpeTokReSql diverges on: $s")
    }
  }

  test("Thai/Lao/Khmer/Myanmar tokenize as codepoint unigrams; digits join runs") {
    val t = Seq(
      (1L, "สวัสดีไทย"), (2L, "ເມືອງລາວ"), (3L, "ខ្មែរ"), (4L, "မြန်မာ"),
      (5L, "ไทย abc ๔๕"), (6L, "พ.ศ. ๒๕๖๗"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.toks(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(t(1L) == "สวัสดีไทย".map(_.toString))
    assert(t(2L) == "ເມືອງລາວ".map(_.toString))
    assert(t(3L) == "ខ្មែរ".map(_.toString))
    assert(t(4L) == "မြန်မာ".map(_.toString))
    // Thai digits are \p{N} AND script-Thai — the run alternative wins
    // (leftmost-first), so ๔๕ is ONE token in both engines
    assert(t(5L) == Seq("ไ", "ท", "ย", "abc", "๔๕"))
    assert(t(6L).contains("๒๕๖๗"))
    // shingles over the unigrams are codepoint 3-grams — non-degenerate
    val ns = Seq((1L, "ตัวอย่างข้อความภาษาไทยที่ยาวพอ")).toDF("doc_id", "text")
      .select(size(TextOps.shingles(TextOps.toks(col("text")))).as("ns"))
      .head().getInt(0)
    assert(ns > 10)
  }

  test("BM25 retrieval is non-degenerate on Thai and Arabic corpora") {
    val docs = Seq(
      (0L, "ข้อมูลการฝึกอบรมขนาดใหญ่"),
      (1L, "ข้อมูลการฝึกอบรมคุณภาพสูง"),
      (2L, "เรื่องอื่นที่แตกต่างกันมาก"),
      (3L, "بيانات التدريب واسعة النطاق هنا"),
      (4L, "بيانات التدريب عالية الجودة هنا")).toDF("doc_id", "text")
    val topk = graft.llm.Lexical.lexicalTopkOf(docs)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nb_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(topk(0L) == 1L && topk(1L) == 0L)
    assert(topk(3L) == 4L && topk(4L) == 3L)
  }

  test("widened langid identifies ar/he/hi/th script-tier samples") {
    val docs = Seq(
      (1L, "مرحبا بالعالم كيف حالك اليوم", "ar"),
      (2L, "שלום עולם מה שלומך היום", "he"),
      (3L, "नमस्ते दुनिया आप कैसे हैं", "hi"),
      (4L, "สวัสดีชาวโลกวันนี้เป็นอย่างไร", "th"),
      // regression: the original five script langs still win their docs
      (5L, "привет мир как дела сегодня вечером", "ru"),
      (6L, "深度学习训练数据的大规模去重处理系统", "zh")).toDF("doc_id", "text", "want")
    val pred = graft.llm.TextOps.langidOf(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("lang_pred"))
      .join(docs.select(col("doc_id"), col("want")), Seq("doc_id"))
    val wrong = pred.filter(col("lang_pred") =!= col("want")).collect()
    assert(wrong.isEmpty, s"mispredicted: ${wrong.mkString(", ")}")
  }

  test("script profile buckets are disjoint and partition the text length") {
    // r13 (r12 ADVICE): U+3007 is Han+Nl, Ⅷ is Latin+Nl — they belong to
    // the DIGIT bucket only; n_other must never go negative, and the
    // buckets must sum to length(text)
    val docs = Seq(
      (1L, "〇"), (2L, "Ⅷ漢〇"), (3L, "abcⅧ๕"), (4L, "مرحبا שלום नमस्ते ไทย"))
      .toDF("doc_id", "text")
    val p = graft.llm.TextOps.textScriptProfileOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getAs[Int]("n_digit") == 1 && p(1L).getAs[Int]("n_han") == 0 &&
      p(1L).getAs[Int]("n_other") == 0)
    assert(p(2L).getAs[Int]("n_digit") == 2 && p(2L).getAs[Int]("n_han") == 1 &&
      p(2L).getAs[Int]("n_latin") == 0 && p(2L).getAs[Int]("n_other") == 0)
    assert(p(3L).getAs[Int]("n_latin") == 3 && p(3L).getAs[Int]("n_digit") == 2)
    val r4 = p(4L)
    assert(r4.getAs[Int]("n_arab") == 5 && r4.getAs[Int]("n_heb") == 4 &&
      r4.getAs[Int]("n_deva") == 6 && r4.getAs[Int]("n_thai") == 3 &&
      r4.getAs[String]("main_script") == "deva")
    for ((id, r) <- p) {
      val sum = Seq("n_latin", "n_cyr", "n_greek", "n_han", "n_kana",
        "n_hangul", "n_arab", "n_heb", "n_deva", "n_thai", "n_digit",
        "n_space", "n_other").map(r.getAs[Int](_)).sum
      val len = Seq((1L, 1), (2L, 3), (3L, 5), (4L, 21)).toMap.apply(id)
      assert(sum == len, s"doc $id buckets sum $sum != len $len")
    }
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

package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** r11: the BPE merge-cap lift (VERDICT r10 item 2). Three independent
  * witnesses that the integer-code-array encoder is the same algorithm at
  * every width:
  *  - at the legacy width (≤26) it reproduces the historical single-char
  *    string fold bit-for-bit;
  *  - at width 200 it reproduces an in-JVM replay of the ORACLE's
  *    algorithm (fixed-width case-alternating token encoding + Java
  *    String.replace, which is leftmost-first non-overlapping — the same
  *    semantics DuckDB's replace applies), over an independently
  *    re-implemented normalizer;
  *  - widening the vocabulary strictly improves compression (fewer
  *    tokens), i.e. the extra merges genuinely apply.
  */
class BpeWidthSpec extends SparkSpecBase {

  private def encTok(t: Int): String =
    "" + (65 + t / 26).toChar + (97 + t % 26).toChar

  /** Independent normalizer (the bpe_merges brute-force test's recipe):
    * tokens [a-z0-9]+ of the lowercased text, joined by single spaces,
    * digits collapsed to '0', then chars to codes a-z→0-25, '0'→26, ' '→27.
    */
  private def codesOf(text: String): Array[Int] = {
    val s = "[a-z0-9]+".r.findAllIn(Option(text).getOrElse("").toLowerCase)
      .mkString(" ").replaceAll("[0-9]", "0")
    s.map(c => if (c == ' ') 27 else if (c == '0') 26 else c - 'a').toArray
  }

  private def encodeRows(): Set[(Long, Long, String)] =
    TextOps.textBpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("integer-array encoder reproduces the legacy string fold at width <= 26") {
    val arr = encodeRows()
    val legacy = TextOps.stringFoldEncodeIds(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    Checkpoints.releaseAll()
    assert(arr === legacy && arr.nonEmpty,
      "the width-lifted encoder changed semantics at the legacy width")
  }

  test("width 200: engine encode equals the oracle algorithm replayed in-JVM") {
    GraftConfig.withInt("graft.bpe.topMerges", 200) {
      val merges = TextOps.bpeMerges(spark, sfDir).collect()
        .map(_.getAs[Long]("slot").toInt)
      Checkpoints.releaseAll()
      assert(merges.length > 26,
        s"corpus must mine past the legacy A-Z band, got ${merges.length}")
      val engine = TextOps.textBpeEncode(spark, sfDir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      Checkpoints.releaseAll()
      val texts = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(engine.keySet === texts.keySet)
      texts.foreach { case (id, text) =>
        var s = codesOf(text).map(encTok).mkString
        merges.zipWithIndex.foreach { case (slot, i) =>
          s = s.replace(encTok(slot / 28) + encTok(slot % 28), encTok(28 + i))
        }
        val ids = s.grouped(2).map(p => (p(0) - 65) * 26 + (p(1) - 97)).toArray
        assert(engine(id) === ((ids.length.toLong, ids.mkString(","))),
          s"doc $id diverged from the fixed-width replace replay")
      }
    }
  }

  test("widening the merge table strictly improves compression") {
    val narrow = TextOps.textBpeEncode(spark, sfDir)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    Checkpoints.releaseAll()
    val wide = GraftConfig.withInt("graft.bpe.topMerges", 200) {
      TextOps.textBpeEncode(spark, sfDir).agg(sum(col("n_tokens"))).head().getLong(0)
    }
    Checkpoints.releaseAll()
    assert(wide < narrow,
      s"200 merges must out-compress 20: $wide !< $narrow")
    // and every merged id stays inside the minted band
    val maxId = GraftConfig.withInt("graft.bpe.topMerges", 200) {
      TextOps.textBpeEncode(spark, sfDir)
        .select(explode(split(col("token_csv"), ",")).as("t"))
        .filter(col("t") =!= "")
        .agg(max(col("t").cast("int"))).head().getInt(0)
    }
    Checkpoints.releaseAll()
    assert(maxId < 28 + 200, s"token id $maxId escaped the minted band")
  }
}

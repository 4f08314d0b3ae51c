package graft

import org.apache.spark.sql.functions._
import graft.llm.{Ann, Corpus, Dedup, Packing, Sampling}

/** The four r8 catalog additions: D65 ivf_recall_curve, D66
  * mixture_realized, D67 shard_manifest, D68 dedup_minhash_verified.
  * Each is oracle-gated like everything else; these tests pin the
  * SEMANTIC contracts the hash compare can't state (curve endpoints and
  * monotonicity, audit-row arithmetic, manifest-vs-recompute parity,
  * confirm-subset relations).
  */
class R8OpsSpec extends SparkSpecBase {

  test("ivf_recall_curve: exhaustive endpoint, monotone, matches ann_ivf at NProbe") {
    val curve = Ann.ivfRecallCurve(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(curve.keySet === (1 to Ann.NumCells).toSet)
    // nprobe = NumCells searches every cell = brute force ⇒ recall 10000
    assert(curve(Ann.NumCells)._3 === 10000L, "exhaustive depth must have full recall")
    // more probed cells can only add candidates ⇒ hits nondecreasing
    (2 to Ann.NumCells).foreach { p =>
      assert(curve(p)._2 >= curve(p - 1)._2, s"hits decreased at nprobe=$p")
    }
    // the NProbe point IS ann_ivf's recall (same candidates, same ranking)
    val exact = Ann.annBruteforce(spark, sfDir).select(col("q_id"), col("nb_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.annIvf(spark, sfDir).select(col("q_id"), col("nb_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(curve(Ann.NProbe)._2 === (ivf & exact).size.toLong,
      "curve's NProbe point diverged from ann_ivf's realized recall")
    // non-vacuity: the curve must actually climb somewhere (a flat curve
    // would mean the probe depth doesn't matter and the operator is noise)
    assert(curve(Ann.NumCells)._2 > curve(1)._2)
    Checkpoints.releaseAll()
  }

  test("mixture_realized: shares sum to ~100%, audit arithmetic is exact") {
    val rows = Sampling.mixtureRealized(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalBp = rows.map(_.getLong(3)).sum
    // integer floor division: sum in (10000 - #langs, 10000]
    assert(totalBp <= 10000L && totalBp > 10000L - rows.length,
      s"realized shares sum to $totalBp bp")
    // per-row recompute from corpus_mixture's kept set
    val kept = Sampling.corpusMixture(spark, sfDir)
      .groupBy(col("lang")).agg(sum(col("n_ws_tokens")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(2) === kept(lang), s"kept_toks wrong for $lang")
      assert(r.getLong(3) === kept(lang) * 10000L / total, s"realized_bp wrong for $lang")
      if (!r.isNullAt(4))
        assert(r.getLong(5) === r.getLong(3) - r.getLong(4), s"dev_bp wrong for $lang")
    }
    // at least one targeted language present (else the audit is vacuous
    // on this corpus)
    assert(rows.exists(!_.isNullAt(4)))
    Checkpoints.releaseAll()
  }

  test("shard_manifest matches a driver-side recompute of the pipeline output") {
    val manifest = Corpus.shardManifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(manifest.nonEmpty && manifest.size <= graft.llm.Packing.PackShards)
    val docs = Corpus.corpusPipeline(spark, sfDir)
      .select(col("shard"), col("lang"), col("n_tokens"), col("seq_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    docs.groupBy(_._1).foreach { case (shard, rows) =>
      val (nDocs, nLangs, totToks, nSeqs, lastSeq) = manifest(shard)
      assert(nDocs === rows.size.toLong)
      assert(nLangs === rows.map(_._2).distinct.size.toLong)
      assert(totToks === rows.map(_._3).sum)
      assert(nSeqs === rows.map(_._4).distinct.size.toLong)
      assert(lastSeq === rows.map(_._4).max)
    }
    Checkpoints.releaseAll()
  }

  test("index_occupancy: accounting identities hold for all five structures") {
    val rows = graft.llm.IndexQc.indexOccupancy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val fams = rows.keySet.map(_._1)
    assert(fams === Set("minhash", "emb_lsh", "simhash", "ann_lsh", "ivf"))
    // block counts match each structure's layout
    def blocks(f: String) = rows.keySet.filter(_._1 == f).map(_._2)
    assert(blocks("minhash") === (0 until Dedup.Bands).toSet)
    assert(blocks("emb_lsh") === (0 until Ann.EmbBands).toSet)
    val nCombos = (Dedup.simhashBlocks - Dedup.SimhashK, Dedup.simhashBlocks) match {
      case (g, b) => (0 until b).combinations(g).size
    }
    assert(blocks("simhash") === (0 until nCombos).toSet)
    // the serving structures are single-block; every vector lands in
    // exactly one bucket/cell, and the cell universe is bounded by config
    assert(blocks("ann_lsh") === Set(0) && blocks("ivf") === Set(0))
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows(("ann_lsh", 0))._2 === nVecs && rows(("ivf", 0))._2 === nVecs)
    assert(rows(("ivf", 0))._1 <= Ann.NumCells.toLong)
    assert(rows(("ann_lsh", 0))._1 <= (1L << Ann.NumPlanes))
    rows.foreach { case ((f, blk), (nKeys, nRows, maxB, candPairs)) =>
      // every block of a family indexes the same underlying row set
      val famRows = rows.collect { case ((`f`, _), v) => v._2 }
      assert(famRows.forall(_ === nRows), s"$f rows differ across blocks")
      assert(nKeys <= nRows && maxB <= nRows && nKeys >= 1, s"$f/$blk bounds")
      // candidate volume brackets: 0 when all buckets singleton; at most
      // the one-bucket worst case
      assert(candPairs >= 0 && candPairs <= nRows * (nRows - 1) / 2, s"$f/$blk volume")
      // a block where every key is distinct must report zero pairs
      if (nKeys == nRows) assert(candPairs === 0L, s"$f/$blk singleton block")
    }
    // driver-side recompute of one minhash band from the engine's own rows
    val band0 = Dedup.minhashSignatures(spark, sfDir)
      .filter(col("band_idx") === 0).groupBy(col("band_hash"))
      .agg(count(lit(1)).as("c")).collect().map(_.getLong(1))
    val (k0, r0, m0, p0) = rows(("minhash", 0))
    assert(k0 === band0.length.toLong && r0 === band0.sum &&
      m0 === band0.max && p0 === band0.map(c => c * (c - 1) / 2).sum)
    Checkpoints.releaseAll()
  }

  test("dedup_cluster_sizes: histogram matches a driver-side recompute; accounting exact") {
    val hist = Dedup.dedupClusterSizes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(hist.nonEmpty)
    // every component has >= 2 members (labels exist only for docs with a
    // near-dup edge, and edges are symmetric)
    assert(hist.keySet.min >= 2L)
    hist.foreach { case (s, (nc, nd, nr)) =>
      assert(nd === s * nc, s"size $s: n_docs != size * clusters")
      assert(nr === nd - nc, s"size $s: n_removed != docs - keepers")
    }
    // recompute from the engine's own component labels
    val sizes = Dedup.dedupComponents(spark, sfDir)
      .groupBy(col("component_id")).agg(count(lit(1)).as("s"))
      .collect().map(_.getLong(1))
    val expect = sizes.groupBy(identity).map { case (s, xs) =>
      s -> (xs.length.toLong, s * xs.length, (s - 1) * xs.length) }
    assert(hist === expect)
    // the removed total IS the doc count the keeper filter drops
    assert(hist.values.map(_._3).sum === sizes.map(_ - 1).sum)
    Checkpoints.releaseAll()
  }

  test("split_leakage: positive controls read 0; residual families recompute") {
    val rows = Sampling.splitLeakage(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("exact", "minhash", "simhash", "containment"))
    // the split keys on content hash / near-dup component: its own
    // channels can NEVER cross — a nonzero here is a split-keying bug
    assert(rows("exact")._2 === 0L, "exact-dup group crossed the split")
    assert(rows("minhash")._2 === 0L, "minhash pair crossed the split")
    rows.foreach { case (f, (links, cross, bp)) =>
      assert(cross >= 0 && cross <= links, s"$f: cross outside [0, links]")
      val expectBp = if (links == 0) 0L else 10000L * cross / links
      assert(bp === expectBp, s"$f: cross_bp arithmetic")
    }
    // non-vacuity: the corpus has minhash pairs at spec scale, so the
    // component-key control must be auditing something (exact dups are
    // legitimately absent from the synthetic corpus — its row still
    // proves the zero-group accounting)
    assert(rows("minhash")._1 > 0)
    // simhash detects similarity the component key never saw, so it is
    // the one family that CAN cross — at spec scale it must find links,
    // or the residual-leakage claim is vacuous
    assert(rows("simhash")._1 > 0)
    // driver-side recompute of the simhash residual from the operator's
    // own published pieces (pairs + split are both bounded at spec scale)
    val split = Sampling.splitHoldout(spark, sfDir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sim = Dedup.dedupSimhash(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val crossSim = sim.count { case (a, b) => split(a) != split(b) }
    assert(rows("simhash") === ((sim.length.toLong, crossSim.toLong,
      if (sim.isEmpty) 0L else 10000L * crossSim / sim.length)))
    Checkpoints.releaseAll()
  }

  test("dedup_minhash_verified: confirmed subset with exact Jaccard >= 0.5") {
    val cand = Dedup.dedupMinhash(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.dedupMinhashVerified(spark, sfDir).collect()
    val vPairs = verified.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(vPairs.nonEmpty && vPairs.subsetOf(cand),
      "verified pairs must be a subset of the minhash candidates")
    verified.foreach(r => assert(r.getDouble(3) >= 0.5))
    // non-vacuity of the CONFIRM: the estimate and the exact number must
    // genuinely differ somewhere (16-component granularity vs true J) —
    // otherwise the second phase proves nothing on this corpus
    assert(verified.exists(r => math.abs(r.getDouble(2) - r.getDouble(3)) > 1e-9),
      "est_sim == exact jaccard everywhere — confirm is vacuous here")
    Checkpoints.releaseAll()
  }

  test("pack_efficiency: per-shard accounting matches a driver-side recompute of both packings") {
    val B = Packing.PackBudget
    val eff = Packing.packEfficiency(spark, sfDir).collect().map { r =>
      assert(!r.isNullAt(8), "empty shard at spec scale — utilization null")
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7), r.getLong(8))
    }.toMap
    assert(eff.keys.map(_._1).toSet === Set("ws", "bpe"))
    eff.foreach { case ((c, shard), (_, tt, nc, tp, cd, bc, ub)) =>
      // tail padding is the ONLY padding: tokens + padding fill the chunks
      assert(tt + tp === nc * B, s"$c/$shard: tokens + tail != chunks * budget")
      // every crossing doc crosses at least once
      assert(bc >= cd, s"$c/$shard: crossings < crossing docs")
      assert(ub === 10000L * tt / (nc * B), s"$c/$shard: utilization arithmetic")
    }
    // recompute per counter from the pack operators' own outputs
    for ((counter, pack) <- Seq("ws" -> Packing.packSequences(spark, sfDir),
                                "bpe" -> Packing.packSequencesBpe(spark, sfDir))) {
      val rows = pack.collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(4))) // (shard, n_tokens, seq_offset)
      assert(rows.map(_._1).distinct.length === eff.count(_._1._1 == counter),
        s"$counter: shard sets differ")
      rows.groupBy(_._1).foreach { case (shard, xs) =>
        val total = xs.map(_._2).sum
        val nChunks = (total + B - 1) / B
        val expect = (xs.length.toLong, total, nChunks, (B - total % B) % B,
          xs.count(x => x._3 + x._2 > B).toLong,
          xs.map(x => if (x._2 > 0) (x._3 + x._2 - 1) / B else 0L).sum,
          10000L * total / (nChunks * B))
        assert(eff((counter, shard)) === expect, s"$counter/$shard accounting")
      }
    }
    // non-vacuity: at spec scale some docs exceed the 128-token budget's
    // remainder, so fragmentation must be observed somewhere
    assert(eff.values.exists(_._5 > 0), "no crossing docs anywhere — gauge is vacuous")
    Checkpoints.releaseAll()
  }
}

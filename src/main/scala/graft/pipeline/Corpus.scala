package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs after
  * dedup/quality: PII redaction, vocabulary statistics, deterministic
  * train/val/test splitting, sequence packing, and benchmark
  * contamination checks.
  *
  * Scale notes: everything here is either a narrow per-row transform
  * (redaction, split), a partial-aggregable count (vocabulary — map-side
  * combine makes the shuffle carry one row per distinct token per
  * partition), a per-group window (packing — one shuffle on the
  * partition column), or a broadcast semi-join (contamination — the
  * benchmark side is small by construction, the corpus side streams).
  */
object Corpus {

  /** Pattern subset chosen to behave identically in Java regex (Spark)
    * and RE2 (DuckDB oracle): character classes and bounded repetition
    * only — no backreferences or lookaround.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Count and redact emails/phones. Narrow codegen'd transform. */
  def withPiiRedacted(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(text, lit(phonePattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))
  }

  /** Top-k vocabulary by token frequency (tie-broken by token so the
    * result is deterministic across engines and partitionings).
    */
  def vocabTopK(df: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Per-language out-of-vocabulary rate against the corpus top-k
    * vocabulary ([[vocabTopK]], deterministic (count desc, token) order)
    * — the tokenizer-coverage diagnostic: a language whose OOV rate
    * runs hot is under-served by the vocabulary and will fragment into
    * long byte-level token sequences. The vocab is a broadcast ≤k-row
    * side; the per-language rollup is one partial-aggregable groupBy
    * over (lang, in-vocab flag) counts — token text never re-shuffles
    * after the vocab join.
    */
  def oovRateByLang(df: DataFrame, k: Int = 100,
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val vocab = vocabTopK(df, k, textCol).select(col("token"))
    val tok = df.select(col(langCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    tok.join(broadcast(vocab.withColumn("_v", lit(1))), Seq("token"),
        "left")
      .groupBy(langCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(langCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov") * 1.0 / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Deterministic content-free train/val/test split on the id: first
    * hex digit of md5(id) → ~81 % / 13 % / 6 %. Reproducible across
    * engines, runs, and partitionings — no RNG state to ship.
    */
  def splitColumn(idCol: Column): Column = {
    val h = substring(md5(idCol.cast("string")), 1, 1)
    when(h < "d", "train").when(h < "f", "val").otherwise("test")
  }

  /** Leakage-safe split: [[splitColumn]]'s md5 rule keyed by the
    * near-dup CLUSTER id instead of the document id, so every member of
    * a duplicate cluster lands in the SAME split. An id-hash split on
    * an undeduplicated corpus puts near-copies of one document on both
    * sides of the train/eval boundary — the classic data-leakage
    * failure that inflates eval scores; keying the hash by the
    * connected-component label makes straddling impossible by
    * construction.
    *
    * Scale shape: [[Dedup.components]]' label propagation runs over the
    * PAIR graph only; the corpus then takes one left join against those
    * labels (broadcast for realistic dup fractions) — singleton docs
    * keep their own id as the cluster key, so their assignment equals
    * the plain [[splitColumn]] split.
    */
  def splitByCluster(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    splitByClusterFrom(df, idCol, Dedup.components(pairs))

  /** [[splitByCluster]] over already-converged labels (the fan-out form
    * — same rationale as [[Dedup.representativesFrom]]). */
  def splitByClusterFrom(df: DataFrame, idCol: String,
      comps0: DataFrame): DataFrame = {
    val comps = comps0.withColumnRenamed("doc_id", idCol)
    df.join(comps, Seq(idCol), "left")
      .select(col(idCol),
        splitColumn(coalesce(col("comp"), col(idCol))).as("split"))
  }

  /** Deterministic hash-sampling predicate: keep a row iff the first 8
    * hex digits of md5(id) fall under `rate`'s share of the hex space.
    * Fixed-width lowercase hex compares lexicographically == numerically,
    * so the same predicate is one string compare in any engine — no RNG
    * state, stable under re-runs and repartitioning, and composable into
    * per-stratum sampling by applying it within groups.
    */
  def sampleHash(idCol: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate out of [0,1]")
    // rate 1.0 must keep EVERY row — a clamped "ffffffff" threshold with
    // strict < would drop ids whose md5 starts with ffffffff (2^-32 of a
    // large corpus); rate 0.0 symmetric
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else {
      val threshold = f"${(rate * 4294967296.0).toLong}%08x"
      substring(md5(idCol.cast("string")), 1, 8) < threshold
    }
  }

  /** Deterministic sample of `rate` — uniform per id, hence
    * proportionally stratified across any grouping column for free.
    */
  def sample(df: DataFrame, rate: Double, idCol: String = "doc_id"): DataFrame =
    df.filter(sampleHash(col(idCol), rate))

  /** Greedy sequential sequence packing: within each `partCol` group,
    * docs in id order fill fixed token-budget bins; a doc starts in the
    * bin its cumulative token offset falls into.
    *
    * Greedy packing is sequential by DEFINITION, but the only
    * sequential quantity is an associative prefix sum — so the
    * per-source cumsum is NOT a source-partitioned window (one source
    * = one task at scale, the p63/p103 defect class). Instead ONE
    * [[withGlobalOrder]] range-partitioned cumsum over (source, id),
    * then each source's base offset (min of the exclusive prefix —
    * nondecreasing in the order, so the min IS the prefix mass before
    * the source's first row; |sources| rows, broadcast back) converts
    * global prefixes into in-source offsets. Only (source, id, n_tok)
    * triples shuffle, never text.
    */
  def packSequences(df: DataFrame, budget: Int, partCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ordered = withGlobalOrder(
      df.select(col(partCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok")),
      Seq(col(partCol), col(idCol)), col("n_tok"))
    val offs = ordered.groupBy(partCol)
      .agg(min(col("cum") - col("n_tok")).as("_off"))
    ordered.join(broadcast(offs), Seq(partCol))
      .withColumn("bin", expr(s"(cum - n_tok - _off) DIV $budget"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
  }

  /** Mixture-weight corpus sampling (data mixing): keep each document
    * with its source's target rate — the knob a training pipeline turns
    * to reweight domains (upsample books, downsample web). Same
    * hash-threshold determinism as [[sampleHash]], but the hash is
    * salted with the source so the SAME id drawn under different
    * sources decorrelates, and the rate is a per-row column resolved
    * from the weight map (unknown sources fall back to `defaultRate`).
    * Narrow codegen'd filter — no shuffle, no RNG state, reproducible
    * under re-runs and repartitioning.
    */
  def mixSources(docs: DataFrame, weights: Map[String, Double],
      defaultRate: Double = 1.0, idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    require((weights.values ++ Seq(defaultRate)).forall(r =>
      r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val rate = weights.foldLeft(lit(defaultRate)) { case (acc, (s0, r)) =>
      when(col(srcCol) === s0, lit(r)).otherwise(acc)
    }
    val h = substring(
      md5(concat_ws(":", col(srcCol), col(idCol).cast("string"))), 1, 8)
    // fixed-width lowercase hex: string compare == numeric compare; the
    // rate>=1 / <=0 branches dodge the 9-hex-digit 2^32 edge (lpad would
    // truncate it)
    val thr = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))),
      8, "0")
    docs.filter(when(rate >= 1.0, lit(true))
      .when(rate <= 0.0, lit(false))
      .otherwise(h < thr))
  }

  /** Deterministic shard assignment for training-output layout: shard =
    * high 32 bits of md5(id) scaled to [0, nShards) — balanced in
    * expectation, content-independent, and stable across runs and
    * repartitionings (unlike pmod(hash) with engine-specific hashes,
    * the md5-range definition is reproducible in ANY engine). At scale:
    * `repartitionByRange(nShards, col("shard"))` + partitionBy writer →
    * fixed shard count with one file each, the layout a training loader
    * wants. shiftright keeps the arithmetic exact integer end to end.
    */
  def shardBy(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0 && nShards <= (1 << 20), s"bad nShards $nShards")
    val hexv = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    docs.withColumn("shard", shiftright(hexv * nShards, 32))
  }

  /** Cross-document paragraph dedup (boilerplate removal): a paragraph
    * appearing in >= `minDocs` DISTINCT documents is corpus-wide
    * boilerplate (nav bars, cookie banners, license footers) and is
    * stripped from every document; per-document content survives.
    *
    * Scale shape: the frequency count groups on the md5 digest (16-byte
    * shuffle keys, partial-aggregated map-side), and the boilerplate set
    * is tiny by definition — a paragraph must repeat across `minDocs`
    * docs to qualify — so membership is a broadcast anti-join against
    * digests, never a self-join of the corpus. Reassembly is the single
    * doc_id shuffle (sort_array over collected (pos, para) structs keeps
    * paragraph order without a window).
    *
    * Output per document: paragraph counts and md5 of the cleaned text —
    * enough for an exact cross-engine oracle without shipping full text.
    */
  def paragraphDedup(docs: DataFrame, minDocs: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sep = "\n\n"
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol), sep)).as(Seq("pos", "para")))
    val boiler = paras
      .groupBy(md5(col("para")).as("digest"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("digest")
    val kept = paras.withColumn("digest", md5(col("para")))
      .join(broadcast(boiler), Seq("digest"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          _.getField("para")), sep).as("cleaned"))
    docs.select(col(idCol),
        size(split(col(textCol), sep)).cast("long").as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        md5(coalesce(col("cleaned"), lit(""))).as("clean_md5"))
  }

  /** Benchmark-contamination check: flag every corpus document sharing
    * at least one word n-gram with the (small) benchmark set. The
    * benchmark's shingle hashes broadcast; the corpus side is one
    * narrow scan + explode + semi-join — no corpus-side all-pairs.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val benchGrams = benchmark
      .select(explode(VectorExpressions.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
    val hits = corpus
      .select(col(idCol),
        explode(VectorExpressions.shingleHashes(col(textCol), n)).as("h"))
      .join(broadcast(benchGrams), Seq("h"), "left_semi")
      .select(idCol).distinct()
      .withColumn("contaminated", lit(true))
    corpus.select(idCol)
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }
  /** Quality-weighted importance resampling predicate: keep a row iff
    * the first 8 hex digits of md5(id) fall under the row's OWN keep
    * rate — [[sampleHash]] generalized from a constant rate to a
    * score-derived column, the mixing knob that up/down-weights corpus
    * slices by quality instead of dropping them outright. The per-row
    * threshold is the rate rendered as fixed-width lowercase hex
    * (floor(rate·2³²)), so the comparison stays one string compare —
    * no RNG state, stable across engines, runs, and partitionings, and
    * E[kept | rate] = rate to 2⁻³² exactly like the constant-rate form.
    * Rates ≥ 1 keep unconditionally; ≤ 0 drop (an 8-char lpad would
    * otherwise truncate the 9-hex-digit 2³² threshold).
    */
  def importanceKeep(idCol: Column, rate: Column): Column = {
    val frac = substring(md5(idCol.cast("string")), 1, 8)
    val thr = lower(lpad(hex(floor(rate * 4294967296.0).cast("bigint")),
      8, "0"))
    when(rate >= 1.0, lit(true))
      .when(rate <= 0.0, lit(false))
      .otherwise(frac < thr)
  }

  /** Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"): each
    * row draws a deterministic uniform u ∈ (0,1] from md5(id) and is
    * ranked by key = ln(u)/w — the top k keys are a weighted sample
    * without replacement with inclusion probability ∝ w (taking
    * ln(u)/w, monotone in u^(1/w), keeps the arithmetic to one log and
    * one divide). This is the exact-count complement of the Bernoulli
    * [[importanceKeep]] rule: "exactly K documents, quality-weighted"
    * is the training-mixture ask importance rates can't express.
    *
    * Scale shape: key assignment is one narrow per-row expression; the
    * global top-k lowers to TakeOrderedAndProject (per-partition heaps
    * + a k-row driver merge — no global sort, no shuffle of the
    * corpus). Keys are ROUNDED to 6 decimals with an id tie-break
    * before ranking so the selected set is reproducible bit-for-bit
    * across engines (the established round-then-tiebreak determinism
    * rule; the statistical properties are unaffected).
    */
  def weightedSampleK(df: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val u = (conv(substring(md5(concat(lit("ws:"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 1d) /
      4294967296.0
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        (round(log(u) / col(weightCol), 6) + 0.0).as("key"))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }

  /** Data-mixture reweighting: per-source token masses vs a TARGET
    * mixture (the DoReMi/Pile-style "how hard do I up/down-sample each
    * source to hit the recipe" table). For each source: exact int64
    * doc/token counts, the natural share n_tokens/total, the target
    * share from the recipe, and the sampling weight
    * target_share·total/n_tokens — weight > 1 means the source must be
    * upsampled (repeated epochs), < 1 downsampled. Sources missing
    * from the recipe weight to 0 (dropped); every division is guarded
    * and the double expression tree is fixed-form over the exact
    * sums, mirrored term-for-term by the oracle.
    *
    * Distributed shape: one partial-agg groupBy to |sources| rows, a
    * 1-row total crossJoin, a broadcast recipe join — nothing wider
    * than the source table ever shuffles.
    */
  def mixtureWeights(df: DataFrame, targets: Map[String, Double],
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val per = df.select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("nt").cast("long").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").cast("long").as("tot"))
    val recipe = broadcast(targets.toSeq.toDF("source", "tgt"))
    val totD = col("tot").cast("double")
    val ntD = col("n_tokens").cast("double")
    val tgt = coalesce(col("tgt"), lit(0.0))
    per.crossJoin(broadcast(tot))
      .join(recipe, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(when(col("tot") > 0, ntD / totD), 6).as("nat_share"),
        round(tgt, 6).as("tgt_share"),
        round(when(col("n_tokens") > 0, tgt * totD / ntD), 6)
          .as("weight"),
        coalesce(when(col("n_tokens") > 0, tgt * totD / ntD) > 1.0,
          lit(false)).as("upsampled"))
      .orderBy("source")
  }

  /** Stratified corpus sample with EXACT largest-remainder allocation
    * (Hamilton apportionment): a total `budget` splits over the
    * strata of `stratCol` proportionally to their sizes in pure int64
    * — base_s = B·c_s div C, then the B − Σbase leftovers go to the
    * largest remainders (B·c_s mod C, ties by stratum value) — and
    * each stratum contributes its n_s lowest-md5 members (tiebreak
    * id), so the draw is deterministic, engine-portable, and
    * reproducible from the data alone: no RNG state, no float
    * proportions that could apportion differently under reordering. A
    * stratum smaller than its allocation contributes everything it
    * has (the sample under-fills rather than borrowing — borrowing
    * would make one stratum's content depend on another's size, the
    * thing stratification exists to prevent).
    *
    * Distributed shape: the allocation table is one partial-agg
    * groupBy (|strata| rows) plus a window over that TINY table. The
    * per-doc draw is NOT a stratum-partitioned window sort — a stratum
    * is a source, so that shape puts one source's entire (stratum, id,
    * hash) projection in a single task (the p63/p103 defect class).
    * Instead ONE [[withGlobalOrder]] range-partitioned rank over
    * (stratum, draw, id) — parallel across AND within strata — then
    * per-stratum offsets (min global pos; |strata| rows, broadcast
    * back) turn global positions into in-stratum ranks, exactly the
    * [[perSourcePercentile]] composition. Only (stratum, id, 16-byte
    * prefix) projections shuffle, never text; output is
    * budget-bounded.
    */
  def stratifiedSample(df: DataFrame, budget: Long,
      stratCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val counts = df.groupBy(col(stratCol).as("s"))
      .agg(count(lit(1)).cast("long").as("c"))
    val alloc = allocFromCounts(counts, budget, stratCol)
    stratumTopK(df, budget, stratCol, idCol)
      .join(broadcast(alloc), Seq(stratCol))
      .filter(col("rk") <= col("n_alloc"))
      .select(col(stratCol), col(idCol), col("rk").as("rank_in_stratum"),
        col("n_alloc"))
      .orderBy(col(stratCol), col("rank_in_stratum"))
  }

  /** Non-foldable constant-zero window partition key for relations
    * that are BOUNDED by construction (|strata|, #funnel steps,
    * #bins …): Catalyst constant-folds a literal key out of a window's
    * partitionSpec, leaving the empty spec WindowExec warns about at
    * every execution (the r10 bench-tail warnings — the r9
    * `partitionBy(lit(0))` fix never survived optimization).
    * pmod(xxhash64(c), 1) evaluates to 0 for every row yet is not
    * foldable, so the single-partition intent stays explicit in the
    * plan. Use ONLY over bounded relations — the single task is the
    * point, not an accident.
    */
  private[graft] def boundedKey(c: Column): Column =
    pmod(xxhash64(c), lit(1L))

  /** [[stratifiedSample]]'s exact largest-remainder allocation over a
    * pre-aggregated (`s`, `c`) stratum-count table — the seam the s40
    * streaming mirror shares: its carried state is per-batch stratum
    * counts, which merge by sum into exactly this input. Pure int64
    * apportionment; both windows run over the |strata|-row table
    * (constant partition key documents the boundedness, same as
    * funnelRates).
    */
  private[graft] def allocFromCounts(counts: DataFrame, budget: Long,
      stratCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = counts.agg(sum("c").cast("long").as("tc"))
    val base = counts.crossJoin(broadcast(tot))
      .select(col("s"), col("c"),
        expr(s"$budget * c div tc").as("b"),
        expr(s"($budget * c) % tc").as("r"),
        col("tc"))
    val wR = Window.partitionBy(boundedKey(col("s")))
      .orderBy(col("r").desc, col("s"))
    base
      .withColumn("extra",
        when(row_number().over(wR) <=
          lit(budget) -
            sum(col("b")).over(Window.partitionBy(boundedKey(col("s")))),
          1L).otherwise(0L))
      .select(col("s").as(stratCol),
        least(col("b") + col("extra"), col("c")).as("n_alloc"))
  }

  /** Each stratum's k lowest-(draw, id) members with their exact
    * in-stratum rank — [[stratifiedSample]]'s per-doc draw, and the
    * bounded per-batch candidate state of the s40 streaming mirror
    * (a union of per-batch top-k contains every global top-k member,
    * the same min-k merge property as s30's reservoir keys). The rank
    * is the p63 composition over (stratum, draw, id) — never a
    * stratum-partitioned window over the corpus.
    */
  private[graft] def stratumTopK(df: DataFrame, k: Long,
      stratCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val ordered = withGlobalOrder(
      df.select(col(stratCol), col(idCol),
        md5(concat(lit("strat:"), col(idCol).cast("string"))).as("draw")),
      Seq(col(stratCol), col("draw"), col(idCol)), lit(1L))
    val offs = ordered.groupBy(stratCol).agg(min("pos").as("_p0"))
    ordered.join(broadcast(offs), Seq(stratCol))
      .withColumn("rk", col("pos") - col("_p0") + lit(1L))
      .filter(col("rk") <= k)
      .select(col(stratCol), col(idCol), col("draw"), col("rk"))
  }

  /** Benchmark-contamination FRACTION: per corpus document, the share
    * of its distinct word n-gram windows that also occur anywhere in
    * the benchmark set — the thresholdable contamination score behind
    * decontamination policies ([[contaminated]]'s boolean is this at
    * "> 0"). Same scale shape: benchmark grams broadcast, corpus side
    * is one narrow scan + explode + ONE partial-aggregable groupBy —
    * no corpus-side all-pairs, no shuffle of text.
    */
  def contaminationFraction(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 13, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val benchGrams = benchmark
      .select(explode(VectorExpressions.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .withColumn("hit", lit(true))
    // shingleHashes is distinct-per-doc, so count(*) counts distinct
    // windows and count(hit) the distinct windows found in the benchmark
    corpus
      .select(col(idCol),
        explode(VectorExpressions.shingleHashes(col(textCol), n)).as("h"))
      .join(broadcast(benchGrams), Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"), count(col("hit")).as("n_hit"))
      .select(col(idCol), col("n_windows"), col("n_hit"),
        round(col("n_hit") / col("n_windows"), 6).as("contaminated_frac"))
  }

  /** Release-over-release n-gram novelty: what fraction of the new
    * release's distinct word n-grams never occurred in the previous one
    * — the corpus-growth quality dial (a release that only re-crawls
    * known pages scores ~0; a source expansion scores high; a sudden
    * spike flags an extractor change, complementing p71's PSI drift).
    * Both gram sets ride the native distinct-per-doc
    * [[org.apache.spark.sql.graft.VectorExpressions.shingleHashes]]
    * (8-byte hashes; hash-equality = string-equality at 2⁻⁶⁴ — the p04
    * argument), global-distinct'd in one hash-keyed shuffle each, with
    * the novelty anti-membership a plain h-keyed left join — no strings
    * and no doc ids cross any shuffle, so the op scales with DISTINCT
    * gram count, not corpus size.
    */
  def releaseNovelty(v1: DataFrame, v2: DataFrame, n: Int = 5,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    def grams(df: DataFrame): DataFrame = df
      .select(explode(VectorExpressions.shingleHashes(col(textCol), n))
        .as("h"))
      .distinct()
    val old = grams(v1).withColumn("seen", lit(true))
    grams(v2).join(old, Seq("h"), "left")
      .agg(count(lit(1)).as("n_grams_v2"),
        count(when(col("seen").isNull, 1)).as("n_new"))
      .select(col("n_grams_v2"), col("n_new"),
        round(col("n_new").cast("double") /
          col("n_grams_v2").cast("double"), 6).as("novelty_frac"))
  }

  /** One-pass column profiling: per column, row/null counts, min/max
    * (as strings, computed on the native type first), exact distinct
    * count, and a boolean asserting the HLL++ estimate is within 5% of
    * exact.
    *
    * Scale shape: every statistic except the exact distinct is a
    * partial-aggregable single-pass aggregate (the production profiling
    * path is approx-only — mergeable HLL sketches, one scan, one 1-row
    * shuffle). The exact distinct counts exist to GATE the sketches the
    * way p17 does; Catalyst plans the multi-column COUNT(DISTINCT) via
    * Expand, which is the pay-once audit path, not the per-ingest one.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        count_distinct(col(c)).as(s"${c}__nd"),
        approx_count_distinct(col(c)).as(s"${c}__and"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        (abs(col(s"${c}__and").cast("double") - col(s"${c}__nd"))
          <= col(s"${c}__nd") * 0.05).as("approx_distinct_ok"))
    }: _*)
    row.select(col("n_rows"), explode(entries).as("p"))
      .select(col("p.column"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"),
        col("p.approx_distinct_ok"))
  }
  /** Exact heavy hitters (tokens occurring in at least `minFraction` of
    * all token occurrences) with a Count-Min prefilter: the sketch is
    * built in one mergeable pass (`DataFrameStatFunctions
    * .countMinSketch`), every token OCCURRENCE is probed by a codegen'd
    * zero-shuffle expression, and only occurrences whose estimate
    * reaches the threshold enter the exact groupBy. CMS never
    * underestimates, so no true heavy hitter is dropped; the post-
    * aggregation filter removes the overestimated impostors — exact
    * result, but the shuffle carries the candidate sliver instead of
    * the whole vocabulary (the point at 100 TB, where the full token
    * shuffle is corpus-sized but the sketch is ~1 MB).
    */
  def heavyHitters(df: DataFrame, textCol: String = "text",
      minFraction: Double = 0.002, eps: Double = 1e-4,
      confidence: Double = 0.99): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val toks = df.select(
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val cms = toks.stat.countMinSketch(col("token"), eps, confidence, 42)
    val threshold = math.ceil(cms.totalCount * minFraction).toLong
    val bytes = cms.toByteArray
    toks.filter(
        VectorExpressions.countMinEstimate(col("token"), bytes) >= threshold)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** Cross-source content-overlap matrix: for every pair of sources,
    * how many DISTINCT document contents they share — the audit that
    * tells a corpus owner which feeds are re-crawls of each other (and
    * the cross-source face of p24's train-vs-benchmark contamination).
    *
    * Scale shape: one digest+source distinct (the digest index again),
    * then a per-digest self-join whose fan-out is bounded by the number
    * of SOURCES a content appears in, never by its copy count — a
    * million-copy document in 3 feeds contributes 3 rows to the join,
    * exactly like the exact-dup pre-collapse bounds banded LSH. Source
    * counts join in for the denominators.
    */
  def sourceOverlap(df: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val d = df.select(md5(col(textCol)).as("dg"), col(srcCol).as("source"))
      .distinct()
    val perSource = d.groupBy("source").agg(count(lit(1)).as("n"))
    d.select(col("dg"), col("source").as("src_a"))
      .join(d.select(col("dg"), col("source").as("src_b")), Seq("dg"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_docs"))
      .join(perSource.select(col("source").as("src_a"), col("n").as("n_a")),
        Seq("src_a"))
      .join(perSource.select(col("source").as("src_b"), col("n").as("n_b")),
        Seq("src_b"))
      .select("src_a", "src_b", "shared_docs", "n_a", "n_b")
  }

  /** Global cumulative sum + global position over a total order WITHOUT a
    * single-partition window (the thing that would serialize 100 TB
    * through one task): range-partition on the sort key, materialize the
    * partitioning through a parquet barrier so partition ids become DATA
    * (re-planning can't move rows between pids afterwards), lift the
    * per-partition (sum, count) totals to the driver — nParts rows, tiny
    * — and finish with a per-pid window plus broadcast running offsets.
    * Every stage is partition-parallel; the only driver state is the
    * offsets array.
    *
    * The result is independent of WHERE the range boundaries land (they
    * come from sampling): `sortCols` must be a total order (include a
    * unique id), so each row's set of predecessors — and therefore its
    * cum/pos — is the same under any boundary placement.
    */
  private[graft] def withGlobalOrder(df: DataFrame, sortCols: Seq[Column],
      value: Column, nParts: Int = 32): DataFrame =
    withGlobalOrderStaged(df, sortCols, value, nParts)._1

  /** [[withGlobalOrder]] variant that also exposes the staged barrier
    * dir, for callers that derive driver-side scalars from the barrier
    * FOOTERS (row count, int64 min/max — zero extra jobs) or release
    * the scratch eagerly once consumed. The returned DataFrame reads
    * the barrier lazily: release only after the consumer executed.
    */
  private[graft] def withGlobalOrderStaged(df: DataFrame,
      sortCols: Seq[Column], value: Column, nParts: Int = 32)
      : (DataFrame, org.apache.hadoop.fs.Path) = {
    val (staged, stagedDir) = Dedup.materializeBarrierAt(
      df.withColumn("_v", value)
        .repartitionByRange(nParts, sortCols: _*)
        .withColumn("_pid", spark_partition_id()),
      "globalorder")
    val parts = staged.groupBy("_pid")
      .agg(sum("_v").as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var vOff = 0L
    var rOff = 0L
    val offRows = parts.toSeq.map { case (pid, t, n) =>
      val row = (pid, vOff, rOff)
      vOff += t
      rOff += n
      row
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offs = broadcast(offRows.toDF("_pid", "_voff", "_roff"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(sortCols: _*)
    (staged.join(offs, "_pid")
      .withColumn("cum", col("_voff") + sum(col("_v")).over(w))
      .withColumn("pos", col("_roff") + row_number().over(w).cast("long"))
      .drop("_pid", "_voff", "_roff", "_v"), stagedDir)
  }

  /** Token-budget corpus selection: rank documents quality-first (here
    * the n_chars proxy, unique-tiebroken on id) and keep documents while
    * the running token total stays within `budget` — the "best B tokens"
    * curation step. Exact int64 arithmetic end to end; the global
    * running total uses [[withGlobalOrder]], so no single-partition
    * window at any scale.
    */
  def tokenBudgetSelect(df: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    withGlobalOrder(
      df.select(col(idCol), col("n_chars"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      Seq(col("n_chars").desc, col(idCol)), col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        col("cum").cast("long").as("cum_tokens"),
        (col("cum") <= budget).as("selected"))

  /** Per-domain corpus statistics: extract http(s) URLs from document
    * text, reduce to registrable host, and aggregate document/URL counts
    * plus a mean-length quality proxy per domain — the input table for
    * domain-level filtering (blocklists, spam-domain down-weighting,
    * crawl budgeting). One narrow extract + explode and ONE
    * partial-aggregable groupBy; the pattern subset (classes + bounded
    * repetition, no lookaround) behaves identically in Java regex and
    * RE2, like [[emailPattern]].
    */
  def domainStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hostPattern = "https?://([A-Za-z0-9.-]+)"
    val urls = df.select(col(idCol).as("id"), col("n_chars"),
        explode(expr(
          s"regexp_extract_all($textCol, 'https?://[A-Za-z0-9.-]+', 0)"))
          .as("url"))
      .withColumn("domain", regexp_extract(col("url"), hostPattern, 1))
    urls.groupBy("domain")
      .agg(countDistinct("id").as("n_docs"),
        count(lit(1)).as("n_urls"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
  }

  /** Crawl URL canonicalization + URL-level dedup counts: the first
    * dedup any web-scale pipeline runs (before any content hashing) is
    * "same page fetched under cosmetically different URLs". Each URL is
    * normalized by a deterministic rewrite chain — lowercase scheme and
    * host, strip the scheme's default port, drop the fragment, remove
    * tracking parameters (utm_*, fbclid, gclid) while healing the
    * query-string separators, strip a trailing slash — and the corpus
    * is aggregated per canonical URL.
    *
    * Scale shape: extract + canonicalize are narrow codegen'd regex
    * projections (no UDF); the ONLY shuffle carries (canonical_url,
    * doc_id) pairs — never the document text — into one
    * partial-aggregable groupBy. Every rewrite uses classes + bounded
    * repetition only, so Java regex (Spark) and RE2 (DuckDB oracle)
    * agree byte-for-byte.
    */
  def canonicalUrls(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val urls = df.select(col(idCol).as("id"),
      explode(expr(s"regexp_extract_all($textCol, " +
        "'https?://[A-Za-z0-9.:/?&=#_%+~-]+', 0)")).as("url"))
    val scheme = lower(regexp_extract(col("url"), "^(https?)://", 1))
    val hostport = lower(regexp_extract(col("url"), "^https?://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(regexp_replace(hostport, ":443$", ""))
    val rest0 = regexp_extract(col("url"), "^https?://[^/?#]+(.*)$", 1)
    val r1 = regexp_replace(rest0, "#.*$", "")                 // fragment
    val r2 = regexp_replace(r1,                                // tracking
      "[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "")
    val r3 = regexp_replace(r2, "^([^?&]*)&", "$1?")           // heal ?/&
    val r4 = regexp_replace(r3, "/\\?", "?")                   // slash?query
    val r5 = regexp_replace(r4, "\\?$", "")                    // bare ?
    val r6 = regexp_replace(r5, "/$", "")                      // trailing /
    urls
      .select(col("id"),
        concat(scheme, lit("://"), host, r6).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("id").as("n_docs"))
  }

  /** Deterministic fixed-k per-source sample (datasheet / eyeball set /
    * per-source eval split): the k docs whose md5 rank is smallest
    * within each source, reproducible in any engine. NOT the rank
    * window it's equivalent to — `row_number() OVER (PARTITION BY
    * source)` funnels every row of a source into one reduce task (a
    * multi-TB hot task for a dominant source at 100 TB); the bounded
    * [[org.apache.spark.sql.graft.TopKPairs]] heap keeps ≤ k rows per
    * source per map partition, so the shuffle carries ≤ k × partitions
    * rows total. 13 hex digits = 52 bits, exactly representable in the
    * heap's double score — the int64 oracle ordering and the heap
    * ordering can never disagree.
    */
  def perSourceSample(df: DataFrame, k: Int, srcCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val hv = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    df.select(col(srcCol).as("source"), col(idCol).as("id"), hv.as("hv"))
      .groupBy("source")
      .agg(VectorExpressions.topKByScore(
        col("id"), -col("hv").cast("double"), k).as("tk"))
      .select(col("source"), posexplode(col("tk")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"))
  }

  /** Sharded-profile merge gate: corpus profiling at 100 TB cannot be
    * one job over all files — shards are profiled independently (per
    * ingest batch, per partition, per day) and the SKETCHES are merged.
    * This gate proves the mergeability contract on the HLL distinct
    * sketch: estimate(union of per-shard sketches) must agree with
    * estimate(one whole-corpus sketch) (register-max union; ≤1%
    * tolerance for sparse→dense promotion differences) and land within
    * 5% of the exact distinct count. Sketch rows are KB-sized — the
    * merge shuffles |shards| rows, not data.
    */
  def shardedProfileGate(df: DataFrame, cols: Seq[String],
      idCol: String = "doc_id", nShards: Int = 4): DataFrame = {
    // lgK 14 (RSE ~0.8%): the 2%/5% tolerances sit >2σ/>6σ out, so the
    // booleans hold under ANY partitioning — the sketch's dense-mode
    // registers are set-determined, but sparse→dense promotion depends
    // on intermediate union sizes, so estimates may legitimately differ
    // by a few per-mille between the merged and whole paths.
    val lgK = lit(14)
    cols.map { c =>
      val whole = df.agg(
        countDistinct(col(c)).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col(c), lgK)).as("est_whole"))
      val merged = df.groupBy((col(idCol) % nShards).as("shard"))
        .agg(hll_sketch_agg(col(c), lgK).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_merged"))
      whole.crossJoin(merged).select(
        lit(c).as("col_name"), col("n_exact"),
        (abs(col("est_merged") - col("est_whole")).cast("double") /
          greatest(col("est_whole"), lit(1L)).cast("double") <= 0.02)
          .as("merged_close"),
        (abs(col("est_merged") - col("n_exact")).cast("double") /
          col("n_exact").cast("double") <= 0.05).as("est_within_5pct"))
    }.reduce(_.unionAll(_))
  }

  /** Water-filling mixture allocation: given a token budget (a fraction
    * of the corpus) and temperature-α source weights (w ∝ avail^α, the
    * mT5 rule p72 samples against), allocate tokens per source,
    * capping any source at what it actually has and redistributing the
    * excess across the uncapped sources — `rounds` redistribution
    * passes (each pass can only cap more sources, so ≤ |sources| passes
    * reach the fixpoint; 3 covers practical skews). The allocator that
    * FEEDS p72's per-source rates. Determinism across engines: the
    * only order-dependent reductions (Σw, Σcapped-avail) run on
    * DECIMAL(28,12) / int64 — associative, partition-order-independent
    * (the p97 pattern) — and the per-row double arithmetic consumes
    * those exact sums identically in both engines.
    */
  def mixWaterfill(df: DataFrame, budgetFrac: Double = 0.5,
      alpha: Double = 0.5, rounds: Int = 3,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val avail = df.select(col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("avail"))
    val budget = avail.agg(
      (sum("avail").cast("double") * budgetFrac).as("budget"))
    var st = avail.crossJoin(budget)
      .withColumn("wd",
        pow(col("avail").cast("double"), alpha).cast("decimal(28,12)"))
      .withColumn("capped", lit(false))
      .withColumn("alloc", lit(0.0))
    val decZero = lit(BigDecimal(0)).cast("decimal(28,12)")
    for (_ <- 1 to rounds) {
      val sums = st.agg(
        sum(when(col("capped"), col("avail")).otherwise(0L))
          .cast("double").as("usedCap"),
        sum(when(!col("capped"), col("wd")).otherwise(decZero))
          .cast("double").as("wSum"))
      st = st.crossJoin(sums)
        .withColumn("prop",
          when(col("capped"), col("avail").cast("double"))
            .otherwise((col("budget") - col("usedCap")) *
              col("wd").cast("double") / col("wSum")))
        .withColumn("capped",
          col("capped") || col("prop") >= col("avail").cast("double"))
        .withColumn("alloc", least(col("prop"), col("avail").cast("double")))
        .drop("usedCap", "wSum", "prop")
    }
    st.select(col("source"), col("avail"),
      round(col("wd").cast("double"), 6).as("weight"),
      round(col("alloc"), 6).as("alloc_tokens"),
      col("capped"))
  }

  /** Marginal-novelty scoring in corpus order: for each document, the
    * fraction of its distinct word-3-shingles not seen in any
    * earlier-id document — the data-valuation signal behind "keep the
    * doc that contributed the content, down-weight late arrivals that
    * re-say it" (and the per-doc form of p84's release novelty). Scale
    * shape: shingles ride as 64-bit hashes (native ShingleHashes — no
    * string shuffles); first-seen is ONE partial-aggregable min per
    * hash; the join back is hash-keyed; the final per-doc rollup is
    * partial-aggregable. Text never shuffles.
    */
  def noveltyContribution(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleN: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpressions
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(
        VectorExpressions.shingleHashes(col(textCol), shingleN))).as("h"))
    val firstSeen = sh.groupBy("h").agg(min("id").as("first_id"))
    sh.join(firstSeen, Seq("h"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_shingles").cast("double"), 6).as("novelty_frac"))
  }

  /** Per-source dedup savings report: what exact dedup would buy, in the
    * unit that matters for training (tokens), BEFORE committing to the
    * materialization — docs/tokens total vs kept under keep-lowest-id,
    * and the savings fraction, per source. The table that decides
    * whether a source's crawl is worth re-fetching vs deduping. Scale
    * shape: text is reduced to (digest, id, tokens, source) in one
    * narrow pass; the digest groupBy and the digest-keyed join back
    * shuffle those four columns only, and the final per-source rollup
    * is partial-aggregable.
    */
  def dedupSavings(df: DataFrame, idCol: String = "doc_id",
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      md5(col(textCol)).as("dg"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("nt"))
    val keep = base.groupBy("dg").agg(min("id").as("keep_id"))
    base.join(keep, Seq("dg"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_total"),
        sum(when(col("id") === col("keep_id"), 1L).otherwise(0L))
          .as("docs_kept"),
        sum("nt").as("tokens_total"),
        sum(when(col("id") === col("keep_id"), col("nt")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("token_savings",
        round(lit(1.0) - col("tokens_kept").cast("double") /
          col("tokens_total").cast("double"), 6))
  }

  /** Domain-blocklist filter with suffix semantics: a document is blocked
    * when ANY of its URL hosts equals a blocklist entry OR sits under it
    * as a subdomain (`deep.sub.site1.example.com` matches
    * `site1.example.com`; the lookalikes `notsite1.example.com` and
    * `site1.example.com.evil.com` must NOT match). The scalable shape:
    * per-URL hosts explode into their label-boundary suffix chains
    * (`a.b.c` → `a.b.c`, `b.c`, `c` — bounded by label count, ~4-6 per
    * host), which turns "endsWith at a dot boundary" into an exact
    * equi-join the tiny blocklist side broadcasts into. Only MATCHED
    * (id, suffix) rows reach the per-doc rollup shuffle, and the final
    * doc join carries ids only — the text never shuffles. blocked_by is
    * the alphabetically-first matching entry (deterministic attribution).
    */
  def domainBlocklist(df: DataFrame, blocked: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hostsOf =
      expr(s"regexp_extract_all($textCol, 'https?://([A-Za-z0-9.-]+)', 1)")
    val suffixes = df
      .select(col(idCol).as("id"), explode(hostsOf).as("host"))
      .withColumn("labels", split(col("host"), "[.]"))
      .select(col("id"), explode(expr(
        """transform(sequence(0, size(labels) - 1),
          |  i -> array_join(slice(labels, i + 1, size(labels)), '.'))"""
          .stripMargin)).as("sfx"))
    val bl = blocked.toDF("sfx")
    val matched = suffixes.join(broadcast(bl), "sfx")
      .groupBy("id").agg(min("sfx").as("blocked_by"))
    df.select(col(idCol), size(hostsOf).cast("long").as("n_urls"))
      .join(matched, col(idCol) === col("id"), "left")
      .select(col(idCol), col("n_urls"),
        col("blocked_by").isNotNull.as("blocked"), col("blocked_by"))
  }

  /** Deterministic global training-order shuffle: position = rank under
    * ORDER BY md5(seed || id) — an RNG-free permutation both engines (and
    * any re-run) agree on. Built on [[withGlobalOrder]]: range partition
    * on the hash, no single-partition sort.
    */
  def shuffleOrder(df: DataFrame, seed: String = "shuf42",
      idCol: String = "doc_id"): DataFrame =
    withGlobalOrder(
      df.select(col(idCol),
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("_h")),
      Seq(col("_h"), col(idCol)), lit(1L))
      .select(col(idCol), col("pos"))

  /** Per-source score normalization: each document's percentile rank of
    * `scoreCol` WITHIN its source — the calibration step before mixing
    * heterogeneous sources on a shared quality threshold (a raw score
    * that means "good" in src3 may be mediocre in src7; percentiles
    * compare like with like). NOT a per-source window sort: that puts
    * one source = one task, and a dominant crawl source becomes a
    * single-executor sort at scale. Instead ONE [[withGlobalOrder]]
    * range-partitioned rank over (source, score, id) — parallel across
    * AND within sources — then per-source offsets (count + min global
    * pos; #sources rows, broadcast back) turn global positions into
    * in-source ranks. pct = rank/(n−1) is a double division of exact
    * int64s + ROUND 6.
    */
  def perSourcePercentile(df: DataFrame, scoreCol: Column,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val ordered = withGlobalOrder(
      df.select(col(idCol), col(sourceCol), scoreCol.as("_s")),
      Seq(col(sourceCol), col("_s"), col(idCol)), lit(1L))
    val offs = ordered.groupBy(sourceCol)
      .agg(min("pos").as("_p0"), count(lit(1)).as("_n"))
    ordered.join(broadcast(offs), Seq(sourceCol))
      .select(col(idCol), col(sourceCol),
        (col("pos") - col("_p0")).as("rank_in_source"),
        when(col("_n") === 1, lit(0.0))
          .otherwise(round((col("pos") - col("_p0")).cast("double") /
            (col("_n") - 1).cast("double"), 6)).as("pct"))
  }

  /** Per-source unigram KL divergence vs the whole-corpus distribution:
    * KL(source ‖ corpus) = Σ_t p_t·ln(p_t/q_t) over the source's token
    * support (q_t ≥ p_t·n_s/N > 0 always, since every source token is a
    * corpus token — no smoothing needed). The drift diagnostic a mixing
    * pipeline watches per ingest source: a source whose distribution
    * runs hot against the corpus is boilerplate, spam, or another
    * language. The marginals n_s and c_t are WINDOW sums over the one
    * (source, token) count table — self-joining that table back on
    * itself looks natural but defeats exchange reuse (branch predicate
    * pushdown differs), so the corpus would be re-tokenized once per
    * marginal; windows keep it one linear plan, one explode. The corpus
    * total is a separate narrow no-explode aggregate (Σ of per-doc token
    * counts), broadcast as one row. Every shuffle carries (source,
    * token) COUNTS, never text. Σ over ≤vocab-size doubles → ROUND 6
    * (the per-row-math determinism rule, same as lmScore).
    */
  def sourceDivergence(df: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(srcCol).as("src"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val st = tok.groupBy("src", "token").agg(count(lit(1)).as("c_st"))
      .withColumn("n_s", sum("c_st").over(Window.partitionBy("src")))
      .withColumn("c_t", sum("c_st").over(Window.partitionBy("token")))
    val total = df.agg(
      sum(size(TextAnalysis.tokens(col(textCol))).cast("long"))
        .as("big_n"))
    st.crossJoin(broadcast(total))
      .select(col("src"), col("c_st"),
        ((col("c_st") / col("n_s")) *
          log((col("c_st") / col("n_s")) / (col("c_t") / col("big_n"))))
          .as("_term"))
      .groupBy("src")
      .agg(sum("c_st").as("n_tokens"), round(sum("_term"), 6).as("kl"))
      .select(col("src").as(srcCol), col("n_tokens"), col("kl"))
  }

  /** Temperature-scaled source sampling (the multilingual-corpus α rule,
    * mT5/XLM-R style): sampling mass p_s ∝ (n_s/N)^α flattens the source
    * distribution — α=1 keeps natural proportions, α→0 approaches
    * uniform — and the per-source keep rate is rescaled so the least
    * downsampled source keeps everything (filter-only, no upsampling):
    * rate_s = p_s·C/n_s with C = min_s n_s/p_s. Rates are derived on the
    * ≤#sources count table (single-partition windows over ~20 rows,
    * bounded), broadcast back, and rows kept by the p53 deterministic
    * md5-threshold rule — the ROUNDED rate feeds the threshold so both
    * engines compare identical 6-decimal values. Output: per source, the
    * rate and the exact kept count.
    */
  def temperatureSample(df: DataFrame, alpha: Double = 0.3,
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(boundedKey(col(srcCol)))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = df.groupBy(srcCol).agg(count(lit(1)).as("n_s"))
      .withColumn("_pa", pow(col("n_s") / sum("n_s").over(w), lit(alpha)))
      .withColumn("_p", col("_pa") / sum("_pa").over(w))
      .withColumn("_c", min(col("n_s") / col("_p")).over(w))
      .select(col(srcCol), col("n_s"),
        round(col("_p") * col("_c") / col("n_s"), 6).as("rate"))
    df.join(broadcast(rates), Seq(srcCol))
      .select(col(srcCol), col("n_s"), col("rate"),
        importanceKeep(col(idCol), col("rate")).as("_k"))
      .groupBy(srcCol, "n_s", "rate")
      .agg(sum(when(col("_k"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Release-over-release distribution drift (population stability
    * index) between two corpus versions, over document-length bins:
    * term_b = (p_b − q_b)·ln(p_b/q_b), Laplace-smoothed so a bin
    * present in only one version stays finite. The release-gate metric
    * a pipeline alarms on AFTER [[snapshotDiff]] says what changed —
    * PSI says whether the corpus SHAPE moved (a length-distribution
    * shift is the classic symptom of a broken extractor upstream).
    * Bins are decimal digit counts of the length — exact integer
    * binning in both engines, no float-boundary flakes. Each side is
    * one narrow groupBy to ≤ #bins rows; the totals window runs on that
    * bin table (single-partition but bounded by ~6 rows, documented).
    */
  def snapshotDrift(v1: DataFrame, v2: DataFrame,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def hist(df: DataFrame, cName: String) =
      df.select(length(length(col(textCol)).cast("string"))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cName))
    val j = hist(v1, "c1").join(hist(v2, "c2"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val w = Window.partitionBy(boundedKey(col("bin")))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.withColumn("_n1", sum("c1").over(w))
      .withColumn("_n2", sum("c2").over(w))
      .withColumn("_nb", count(lit(1)).over(w))
      .select(col("bin"), col("c1"), col("c2"),
        round((((col("c1") + 1) / (col("_n1") + col("_nb"))) -
          ((col("c2") + 1) / (col("_n2") + col("_nb")))) *
          log(((col("c1") + 1) / (col("_n1") + col("_nb"))) /
            ((col("c2") + 1) / (col("_n2") + col("_nb")))), 6)
          .as("psi_term"))
  }

  /** Snapshot diff between two corpus versions: per id, whether the
    * document was `added`, `removed`, `changed` (same id, different
    * content digest), or `unchanged` — the release-delta table an
    * incremental pipeline reads to decide what to reprocess (changed ∪
    * added) and what to tombstone (removed). ONE full-outer equi-join
    * on the id over narrow (id, digest) projections — full text never
    * shuffles; at 100 TB both sides are digest tables a fraction the
    * corpus size, and identical bucketing on id makes the join
    * shuffle-free (x01 pattern).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val a = v1.select(col(idCol), md5(col(textCol)).as("_dga"))
    val b = v2.select(col(idCol), md5(col(textCol)).as("_dgb"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_dgb").isNull, "removed")
          .when(col("_dga").isNull, "added")
          .when(col("_dga") =!= col("_dgb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Domain authority via PageRank over the co-citation graph: domains
    * mentioned together in a document are mutually endorsing; the
    * stationary weight ranks domains for crawl prioritization and
    * boilerplate-farm down-weighting. Classic iterative-join Spark:
    * each round is (rank ⋈ edges) → partial-aggregable groupBy — the
    * rank table is #domains rows, orders of magnitude below the corpus,
    * and the edge table is the one big shuffle, built once. Exact-int64
    * arithmetic throughout (rank mass in millionths, contributions via
    * integer `div`): integer sums are order-independent, so results are
    * bit-identical across partitionings, engines, and re-runs — the
    * p54 exact-Lloyd rule applied to power iteration.
    */
  def domainRank(df: DataFrame, iterations: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val mentions = df.select(col(idCol).as("id"),
        explode(expr(
          s"regexp_extract_all($textCol, 'https?://[A-Za-z0-9.-]+', 0)"))
          .as("url"))
      .select(col("id"),
        regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1)
          .as("domain"))
      .distinct()
    // the graph tables are STATIC across iterations — barrier them
    // once so the power loop's unrolled plan re-reads domain-sized
    // parquet instead of re-deriving the corpus-wide mention
    // extraction + self-join every iteration (the r9→r10 p64 bench
    // drift was exactly this re-derivation tax; at 100 TB one corpus
    // scan vs `iterations` of them is the difference that matters)
    val edges = Dedup.materializeBarrier(
      mentions.as("a")
        .join(mentions.as("b"), Seq("id"))
        .filter(col("a.domain") =!= col("b.domain"))
        .groupBy(col("a.domain").as("src"), col("b.domain").as("dst"))
        .agg(count(lit(1)).as("w")),
      "pagerank-edges")
    val outW = edges.groupBy("src").agg(sum("w").as("ow"))
    // nodes stays lazy: one narrow extract+distinct per unrolled
    // iteration costs less than a second barrier round-trip
    val nodes = mentions.select(col("domain")).distinct()
    var rank = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contrib = rank.join(edges, rank("domain") === edges("src"))
        .join(outW, "src")
        .select(col("dst").as("domain"),
          expr("r * w div ow").as("c"))
        .groupBy("domain").agg(sum("c").as("cs"))
      rank = nodes.join(contrib, Seq("domain"), "left")
        .select(col("domain"),
          expr("150000 + coalesce(cs, CAST(0 AS BIGINT)) * 85 div 100")
            .cast("long").as("r"))
    }
    rank.select(col("domain"), col("r").as("rank_micros"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", NeurIPS —
    * public-paper recipe): per-doc log importance ratio
    * log p_target(doc) − log p_raw(doc) under hashed-unigram bag
    * models with add-one smoothing over B = 256 buckets. `target` is
    * the curated seed corpus whose distribution raw docs are scored
    * against; docs scoring high are up-sampled into the training mix.
    *
    * Bucketing: the first two hex digits of md5(token) (the p83
    * hash-mirroring trick — the oracle replays the same bucket from
    * DuckDB's md5 with hex-digit arithmetic, so any divergence in
    * tokenize/hash/smoothing flips a value). Per-token term
    * ln(tc_b+1) − ln(rc_b+1) plus the n_tokens-weighted normalizer
    * ln(rawTotal+B) − ln(tgtTotal+B) gives exactly
    * Σ_t ln p̂_target(b_t) − ln p̂_raw(b_t); final score rounded 6.
    *
    * Distributed shape: two bucket tables of ≤ 256 rows (partial-agg
    * counts) broadcast into the token stream; totals ride a one-row
    * crossJoin (no collect); the per-doc rollup partial-aggregates.
    * At 100 TB the bucket tables are a constant-size side input —
    * the whole scorer is one corpus scan.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val B = 256
    def buckets(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .select(col("id"),
        conv(substring(md5(col("token")), 1, 2), 16, 10)
          .cast("int").as("bucket"))
    val tok = buckets(corpus)
    val rawB = tok.groupBy("bucket").agg(count(lit(1)).as("rc"))
    val tgtB = buckets(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
    val totals = rawB.agg(sum("rc").as("rt"))
      .crossJoin(tgtB.agg(sum("tc").as("tt")))
    val perDoc = tok
      .join(broadcast(rawB), Seq("bucket"))
      .join(broadcast(tgtB), Seq("bucket"), "left")
      .select(col("id"),
        (log((coalesce(col("tc"), lit(0L)) + 1).cast("double")) -
          log((col("rc") + 1).cast("double"))).as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("s"))
    corpus.select(col(idCol))
      .join(perDoc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"),
        round(coalesce(
          col("s") + col("n_tokens").cast("double") *
            (log((col("rt") + B).cast("double")) -
              log((col("tt") + B).cast("double"))),
          lit(0.0)), 6).as("score"))
  }

  /** Importance-weight health diagnostics — the "is my reweighting
    * degenerate" check that must accompany any [[importanceWeights]] /
    * [[mixtureWeights]] deployment: effective sample size
    * ESS = (Σw)²/Σw² (Kong 1992 — the equivalent count of UNIT-weight
    * samples; ESS ≪ n means a few documents dominate the resampled
    * corpus), its fraction of n, the single heaviest weight's share of
    * total mass, and how many weights exceed `heavyMult`× the mean
    * (clipping candidates).
    *
    * Determinism: weights are data-derived doubles, so a plain float
    * SUM would be partition-order-dependent — each term is pinned to
    * DECIMAL(38,12) before the sum (the gradient-sum trick), making
    * both sums exact and order-free; max is order-free natively. The
    * pinned terms are the MAX-NORMALIZED weights w/max|w| ∈ [−1, 1]
    * (ESS is scale-invariant, so normalizing changes nothing but the
    * units): a raw-w pin dies at w ≳ 1e13 — (w·w) past 1e26 overflows
    * DECIMAL(38,12), silently NULL-dropping the term in non-ANSI Spark
    * while the oracle's cast errors (ADVICE r11) — whereas normalized
    * terms fit the decimal for ANY weight magnitude (w = exp(score)
    * with score in the hundreds included), accumulate safely to 1e26
    * rows, and quantize RELATIVE to the heaviest weight (1e-12 · max).
    * Σw'² = 0 (empty input or all-zero weights) → every ratio NULL,
    * `guarded` true.
    *
    * Distributed shape: the weight relation barriers ONCE (the heavy
    * upstream derivation is not re-run), then three scalar aggregates
    * over the barrier — normalization needs max|w| first, the heavy
    * count needs Σw/n; each is a broadcast scalar into the next pass.
    * No window, no shuffled join.
    */
  def weightDiagnostics(weights: DataFrame, wCol: String,
      heavyMult: Double = 10.0): DataFrame = {
    require(heavyMult > 0, s"bad heavyMult $heavyMult")
    val d38 = "decimal(38,12)"
    val w = Dedup.materializeBarrier(
      weights.select(col(wCol).cast("double").as("w")), "weight-diag")
    val m0 = w.agg(
      count(lit(1)).cast("long").as("n"),
      max(abs(col("w"))).as("mwa"),
      max(col("w")).as("mw"))
    // normalized moment sums: w' = w/max|w|, each term decimal-pinned
    // — written as (w/mwa) and (w/mwa)*(w/mwa) so the oracle replays
    // the identical IEEE expression shape
    val wn = when(col("mwa") > 0, col("w") / col("mwa"))
    val sums = w.crossJoin(broadcast(m0)).agg(
      coalesce(sum(wn.cast(d38)), lit(0).cast(d38))
        .cast("double").as("swn"),
      coalesce(sum((wn * wn).cast(d38)), lit(0).cast(d38))
        .cast("double").as("sw2n"))
    val heavy = w.crossJoin(broadcast(m0)).crossJoin(broadcast(sums))
      .agg(coalesce(sum(when(col("w") > lit(heavyMult) * col("mwa") *
        col("swn") / col("n").cast("double"), 1L).otherwise(0L)),
        lit(0L)).cast("long").as("n_heavy"))
    val ess = when(col("sw2n") > 0,
      col("swn") * col("swn") / col("sw2n"))
    m0.crossJoin(broadcast(sums)).crossJoin(broadcast(heavy)).select(
      col("n"),
      round(coalesce(col("mwa") * col("swn"), lit(0.0)), 6)
        .as("sum_w"),
      round(ess, 6).as("ess"),
      round(when(col("sw2n") > 0 && col("n") > 0,
        col("swn") * col("swn") / col("sw2n") /
          col("n").cast("double")), 6).as("ess_frac"),
      round(when(col("swn") > 0, col("mw") / col("mwa") / col("swn")),
        6).as("max_share"),
      col("n_heavy"),
      coalesce(!(col("sw2n") > 0), lit(true)).as("guarded"))
  }

  /** Per-source corpus datasheet — the release-notes table every
    * training-data drop ships with: documents, token/char volume, exact
    * duplicate rate (1 − distinct digests/docs), language diversity and
    * the dominant language, mean document length. One tokenizing scan
    * feeds the volume aggregates; the language branch prunes to
    * (source, lang) so Parquet never reads `text` for it; the dominant
    * language is a partial-aggregable min(struct(−cnt, lang)) — count
    * desc, lang asc, deterministic — not a window over the corpus.
    */
  def corpusReport(docs: DataFrame, srcCol: String = "source",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(srcCol).as("source"), col(langCol).as("lang"),
      md5(col(textCol)).as("dg"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("nt"),
      length(col(textCol)).cast("long").as("nc"))
    val vol = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("nt").cast("long").as("n_tokens"),
      sum("nc").cast("long").as("n_chars"),
      count_distinct(col("dg")).as("n_distinct_texts"),
      round(lit(1.0) - count_distinct(col("dg")).cast("double") /
        count(lit(1)).cast("double"), 6).as("dup_rate"),
      round(sum("nt").cast("double") / count(lit(1)).cast("double"), 6)
        .as("mean_tokens"))
    val perLang = base.groupBy("source", "lang")
      .agg(count(lit(1)).as("c"))
    val langs = perLang.groupBy("source").agg(
      count(lit(1)).as("n_langs"),
      min(struct((-col("c")).as("negc"), col("lang"))).as("m"))
      .select(col("source"), col("n_langs"),
        col("m.lang").as("top_lang"))
    vol.join(langs, Seq("source"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: split the corpus into
    * `buckets` equal id-ranges, and report, cumulatively in id order,
    * documents, token occurrences, and DISTINCT token types seen so
    * far, plus the Heaps exponent estimate ln(types)/ln(tokens). The
    * standard corpus-health curve: a release whose type growth bends
    * away from the previous release's power law signals boilerplate
    * flooding (too flat) or encoding noise (too steep).
    *
    * Distributed shape — the cumulative-distinct trap is avoided by
    * computing each type's FIRST bucket (a token-keyed min aggregate)
    * and counting first-occurrences per bucket: one tokenize pass, two
    * partial-aggregable groupBys, then every cumulative sum runs over
    * the ≤`buckets`-row summary (a single-partition window over a
    * constant-size table, the s08 pattern). No per-prefix distinct
    * jobs, no quadratic re-scan.
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bucket = id*buckets/(max+1) in exact integer arithmetic — the id
    // spine is dense enough in every caller that this is an even split,
    // and the rule replays verbatim in the oracle.
    val maxId = docs.agg(max(col(idCol).cast("long")).as("max_id"))
    val bucketed = docs.crossJoin(broadcast(maxId))
      .select(expr(s"CAST($idCol AS BIGINT) * $buckets div (max_id + 1)")
        .as("bucket"),
        col(idCol), col(textCol))
    val docCounts = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"))
    val tok = bucketed.select(col("bucket"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val tokCounts = tok.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok.groupBy("token").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new_types"))
    // the cumulative frame is #buckets rows by construction; the
    // non-foldable constant key states that boundedness in the plan
    // and silences WindowExec's no-partition warning
    val w = Window.partitionBy(boundedKey(col("bucket"))).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docCounts
      .join(tokCounts, Seq("bucket"), "left")
      .join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"),
        sum("n_docs").over(w).as("cum_docs"),
        sum(coalesce(col("n_tokens"), lit(0L))).over(w).as("cum_tokens"),
        sum(coalesce(col("n_new_types"), lit(0L))).over(w)
          .as("cum_types"))
      .select(col("bucket").cast("long").as("bucket"),
        col("cum_docs").cast("long").as("cum_docs"),
        col("cum_tokens").cast("long").as("cum_tokens"),
        col("cum_types").cast("long").as("cum_types"),
        round(log(col("cum_types").cast("double")) /
          log(col("cum_tokens").cast("double")), 6).as("heaps"))
  }

  /** Corpus-frequency boilerplate LINE removal (the CCNet line-dedup
    * rule: a line appearing verbatim in many documents is navigation /
    * footer / cookie-banner chrome, not content). Two passes:
    *
    *  1. count pass — per-doc DISTINCT md5 digests of eligible lines
    *     (trimmed length ≥ minLen; short separators and blanks are
    *     structure, not boilerplate) roll up to document frequencies;
    *     only 32-hex digests shuffle, never line text.
    *  2. rebuild pass — the common set (df ≥ minDf, capped at topK by
    *     (df desc, digest) for a deterministic bound) is collected to
    *     the driver (boilerplate is by definition FEW distinct lines —
    *     the cap makes the worst case explicit, the IVF-centroid
    *     precedent) and compiled into the projection as a literal
    *     array probe: the rebuild is then zero-shuffle per-row HOF
    *     arithmetic, text never leaves its partition.
    */
  def boilerplateLineRemoval(df: DataFrame, minDf: Int = 10,
      minLen: Int = 10, topK: Int = 1000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    def eligible(l: Column): Column = length(trim(l)) >= minLen
    val common: Array[String] = df
      .select(col(idCol), explode(array_distinct(
        transform(filter(split(text, "\n"), eligible(_)),
          l => md5(trim(l))))).as("dg"))
      .groupBy("dg").agg(countDistinct(col(idCol)).as("cnt"))
      .filter(col("cnt") >= minDf)
      .orderBy(col("cnt").desc, col("dg"))
      .limit(topK)
      .select("dg").collect().map(_.getString(0))
    val ln = split(text, "\n")
    val kept = if (common.isEmpty) ln else {
      val commonArr = array(common.map(lit).toIndexedSeq: _*)
      filter(ln,
        l => !(eligible(l) && array_contains(commonArr, md5(trim(l)))))
    }
    df.select(col(idCol),
      size(ln).cast("long").as("n_lines"),
      (size(ln) - size(kept)).cast("long").as("n_removed"),
      md5(array_join(kept, "\n")).as("clean_dg"))
  }

  /** Rare-token privacy audit (the k-anonymity analog for text: a token
    * appearing in ≤ maxDf documents is a potential identifier — serial
    * numbers, usernames, one-off hashes — and a document DENSE in such
    * tokens is a re-identification risk and a memorization magnet).
    * Per-doc distinct tokens roll up to document frequencies; rare ones
    * join back for a per-doc count plus the lexicographically-first
    * example (deterministic evidence pointer). Only (id, token) pairs
    * shuffle — never text.
    */
  def rareTokenAudit(df: DataFrame, maxDf: Int = 2,
      riskThreshold: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col(textCol)))).as("tok"))
    val rare = toks.groupBy("tok")
      .agg(countDistinct("id").as("c"))
      .filter(col("c") <= maxDf).select("tok")
    val perDoc = toks.join(rare, "tok")
      .groupBy("id")
      .agg(count(lit(1)).as("n_rare"), min("tok").as("example_rare"))
    df.select(col(idCol),
      size(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col(textCol))))
        .cast("long").as("n_distinct_tokens"))
      .join(perDoc, col(idCol) === col("id"), "left")
      .select(col(idCol),
        col("n_distinct_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare_tokens"),
        col("example_rare"),
        (coalesce(col("n_rare"), lit(0L)) >= riskThreshold)
          .as("is_risky"))
  }

  /** Curriculum staging: order the corpus easiest-first by readability
    * and cut it into nStages contiguous stages (the data-ordering half
    * of curriculum learning; x28 turns the resulting order into
    * physical layout). The global rank comes from [[withGlobalOrder]] —
    * range partition + per-partition windows + broadcast offsets, no
    * single-partition sort — and the stage cut is exact int64
    * arithmetic on (rank, total).
    */
  def curriculumStages(df: DataFrame, nStages: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = graft.pipeline.TextAnalysis
      .readabilitySignals(df, idCol, textCol)
      .select(col(idCol), col("flesch"),
        coalesce(col("flesch"), lit(-1e9)).as("_key"))
    val total = df.count()
    val ordered = withGlobalOrder(sig,
      Seq(col("_key").desc, col(idCol)), lit(1L))
    ordered.select(col(idCol), col("flesch"),
      col("pos").as("curriculum_rank"),
      (expr(s"((pos - 1) * $nStages) DIV $total") + 1).as("stage"))
  }

  /** Hash-integrity audit: every digest-keyed operator in this engine
    * (exact dedup, gram/shingle joins, the dedup index) rests on
    * "digest equality == content equality" — this measures that
    * assumption on the actual corpus instead of assuming it: distinct
    * texts vs distinct md5 vs distinct xxhash64. A collision would
    * surface as a smaller hash-distinct count; at 2^-64/2^-128 rates
    * the booleans are expected true at ANY corpus size, which is
    * exactly why a violation must abort a pipeline rather than
    * silently merge two documents.
    */
  def hashIntegrityReport(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(textCol)).as("n_distinct_text"),
      countDistinct(md5(col(textCol))).as("n_distinct_md5"),
      countDistinct(xxhash64(col(textCol))).as("n_distinct_xx"))
      .select(col("n_docs"), col("n_distinct_text"),
        col("n_distinct_md5"),
        (col("n_distinct_md5") === col("n_distinct_text"))
          .as("md5_injective"),
        (col("n_distinct_xx") === col("n_distinct_text"))
          .as("xx_injective"))

  /** Sentence-aware chunking (the RAG/packing primitive p28's fixed
    * token windows can't give: chunks that never split a sentence).
    * Sentences = terminal-punctuation runs; each sentence joins the
    * running chunk until the EXCLUSIVE token cumsum crosses the
    * budget — i.e. chunk(i) = cumsumBefore(i) DIV budget, which keeps
    * chunks ≥ budget-aligned, allows a long sentence to overflow its
    * chunk rather than be split, and is exactly replayable as a
    * windowed running sum. Per-doc HOF arithmetic + one (doc, chunk)
    * rollup; chunk text digests are over '. '-joined sentences (a
    * documented normalization — original inter-sentence punctuation is
    * not reconstructed).
    */
  def sentenceChunks(df: DataFrame, maxTokens: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val sents = filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)
    val tc = transform(sents, s => size(split(trim(s), "\\s+")))
    // exclusive running sum per sentence (aggregate builds the array)
    val cumBefore = aggregate(tc,
      struct(array().cast("array<long>").as("arr"), lit(0L).as("run")),
      (acc, x) => struct(
        concat(acc.getField("arr"), array(acc.getField("run"))).as("arr"),
        (acc.getField("run") + x).as("run")),
      acc => acc.getField("arr"))
    // chunkIds via ONE transform over the materialized cumsum array —
    // indexing cumBefore inside a per-element lambda would re-evaluate
    // the whole aggregate per sentence (the p86/p120/withLanguage trap)
    val chunkIds = transform(cumBefore,
      c => (c / maxTokens).cast("long"))
    val za = arrays_zip(transform(sents, s => trim(s)),
      transform(tc, x => x.cast("long")), chunkIds)
    // chunk assembly as a per-row fold: chunk ids are CONSECUTIVE, so
    // each sentence either extends the last chunk struct or appends a
    // new one. The whole operator is then a narrow projection + one
    // explode of finished chunk rows — the text never shuffles (the
    // earlier groupBy form shipped every sentence through an exchange).
    val chunkType = "array<struct<chunk_id:bigint,n_sentences:bigint," +
      "n_tokens:bigint,txt:string>>"
    val folded = aggregate(za,
      expr(s"CAST(array() AS $chunkType)"),
      (acc, x) => {
        val last = element_at(acc, -1)
        val cid = x.getField("2")
        val merged = struct(
          last.getField("chunk_id").as("chunk_id"),
          (last.getField("n_sentences") + 1L).as("n_sentences"),
          (last.getField("n_tokens") + x.getField("1")).as("n_tokens"),
          concat(last.getField("txt"), lit(". "), x.getField("0"))
            .as("txt"))
        val fresh = struct(cid.as("chunk_id"),
          lit(1L).as("n_sentences"), x.getField("1").as("n_tokens"),
          x.getField("0").as("txt"))
        when(size(acc) > 0 && last.getField("chunk_id") === cid,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(fresh)))
      })
    df.filter(size(sents) > 0)
      .select(col(idCol), explode(folded).as("c"))
      .select(col(idCol), col("c.chunk_id"),
        col("c.n_sentences"), col("c.n_tokens"),
        md5(col("c.txt")).as("chunk_dg"))
  }

  /** Contrastive triplet construction for embedding training: every
    * near-dup pair is a (anchor, positive); the negative is the
    * anchor's successor in a deterministic md5 ring over the WHOLE
    * corpus — uniform, reproducible, and relational (two equi-joins on
    * ring position, no per-anchor sampling loop). A successor that
    * lands in the anchor's own cluster falls through to the second
    * successor, then to null (counted, never silently dropped) — the
    * false-negative guard that makes the triplets safe to train on.
    * Ring positions come from the two-phase global order, so there is
    * no single-partition sort anywhere.
    */
  def contrastiveTriplets(corpus: DataFrame, pairs: DataFrame,
      labels: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val ids = corpus.select(col(idCol).as("id"))
    val lab = ids.join(
      labels.select(col(idCol).as("id"), col("comp").as("_c")),
      Seq("id"), "left")
      .select(col("id"), coalesce(col("_c"), col("id")).as("lb"))
    val keyed = lab.withColumn("_k",
      md5(concat(lit("cp:"), col("id").cast("string"))))
    val ordered = withGlobalOrder(keyed,
      Seq(col("_k"), col("id")), lit(1L))
      .select(col("id"), col("lb"), col("pos"))
    val total = ids.count()
    val o = ordered.select(col("id"), col("lb"),
      (((col("pos") - 1 + 1) % total) + 1).as("q1"),
      (((col("pos") - 1 + 2) % total) + 1).as("q2"))
    val succ = o
      .join(ordered.select(col("pos").as("q1"), col("id").as("n1"),
        col("lb").as("lb1")), "q1")
      .join(ordered.select(col("pos").as("q2"), col("id").as("n2"),
        col("lb").as("lb2")), "q2")
    pairs.select(col("id_a"), col("id_b"))
      .join(succ, col("id_a") === col("id"))
      .select(col("id_a").as("anchor"), col("id_b").as("positive"),
        when(col("lb1") =!= col("lb"), col("n1"))
          .when(col("lb2") =!= col("lb"), col("n2"))
          .as("negative"))
      .withColumn("no_negative", col("negative").isNull)
  }

  /** Cross-lingual document alignment by translation-invariant anchors
    * (bitext mining's cheap first pass: numbers, percentages, and
    * proper-noun-shaped tokens survive translation verbatim, so two
    * documents in DIFFERENT language buckets sharing several RARE
    * anchors are parallel-text candidates). Anchors are df-pruned
    * (≤ maxDf docs — a year like 2024 aligns nothing) before the
    * inverted-index self-join, which bounds work at (#anchors)·maxDf²;
    * pairs need ≥ minShared anchors and different `grpCol` values.
    * Only (id, grp, anchor) rows shuffle.
    */
  def anchorAlignPairs(df: DataFrame, maxDf: Int = 4,
      minShared: Int = 3, idCol: String = "doc_id",
      grpCol: String = "lang", textCol: String = "text"): DataFrame = {
    val isAnchor = (t: Column) =>
      t.rlike("^[0-9][0-9.,%]*$") || t.rlike("^[A-Z][a-z]{3,}$")
    val an = df.select(col(idCol).as("id"), col(grpCol).as("grp"),
      explode(array_distinct(filter(
        graft.pipeline.TextAnalysis.tokens(col(textCol)), isAnchor)))
        .as("tok"))
    val rare = an.groupBy("tok")
      .agg(countDistinct("id").as("c"))
      .filter(col("c") <= maxDf).select("tok")
    val ra = an.join(rare, "tok")
    ra.select(col("id").as("id_a"), col("grp").as("lang_a"), col("tok"))
      .join(ra.select(col("id").as("id_b"), col("grp").as("lang_b"),
        col("tok")), "tok")
      .filter(col("id_a") < col("id_b") &&
        col("lang_a") =!= col("lang_b"))
      .groupBy("id_a", "id_b", "lang_a", "lang_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline surface
  * (SURVEY.md §2.2 "LLM-data-pipeline extensions"): tokenization,
  * shingling, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Everything except [[rollingHash]] is pure Column expressions —
  * codegen'd, no UDFs, embarrassingly parallel: the 100 TB cost is one
  * narrow pass over the text column.
  */
object Text {

  /** Whitespace tokens with empties dropped (codegen'd split+filter). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Normalized n-token prefix key — the near-duplicate cluster proxy
    * shared by q44/q201/q207 and their specs. This is a CROSS-ENGINE
    * contract (oracle form: `array_to_string((tokens)[1:n], ' ')`), so
    * it is single-sourced here: a tweak to the token count or separator
    * must change every consumer together or the leakage-safety pairing
    * silently desynchronizes.
    */
  def prefixKey(text: Column, n: Int = 5): Column =
    concat_ws(" ", slice(tokens(text), 1, n))

  /** The engine's canonical stopword set — shared by
    * [[qualityMetrics]] and the domain-blocklist induction (q202),
    * and mirrored literally in their SQL oracles. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Keep only stopwords from a token array (codegen'd filter). */
  def stopwordFilter(toks: Column): Column =
    filter(toks, t => t.isin(stopwords: _*))

  /** Let-binding for higher-order lambdas: evaluates `c` ONCE per row
    * and hands the bound value to `f` as a lambda variable. A free
    * column subtree referenced k times inside an interpreted HOF lambda
    * re-evaluates k times per element (lambda bodies get no
    * common-subexpression elimination); wrapping it as the element of a
    * single-element array makes every reference a cheap variable read.
    */
  def letBound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Word n-gram shingles: `n` consecutive tokens joined by a space;
    * empty for docs shorter than `n` tokens. One native tight loop per
    * row ([[graft.functions.Shingles]], registered as
    * `graft_shingles`) — the HOF formulation it replaced is kept as
    * [[shinglesHof]] and bit-parity-tested in LlmSpec.
    */
  def shingles(toks: Column, n: Int): Column =
    call_function("graft_shingles", toks, lit(n))

  /** The declarative higher-order reference formulation of
    * [[shingles]] — interpreted (lambda dispatch per shingle,
    * element_at per token); kept as the parity oracle for the native
    * expression, not for production use. The short-doc case needs an
    * explicit branch: `sequence(0, -1)` is a DESCENDING range
    * `[0,-1]` in Spark, whose out-of-bounds `element_at` calls throw
    * under default ANSI mode.
    *
    * The token array is [[letBound]]: the shingle lambda references it
    * `n` times per shingle, and a free `toks` subtree (split+filter,
    * interpreted) would re-evaluate per reference — ~`n·|shingles|`
    * full tokenizations per row.
    */
  def shinglesHof(toks: Column, n: Int): Column =
    letBound(toks) { tk =>
      when(size(tk) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(tk) - n),
          i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o + 1)): _*)))
    }

  /** Winnowing fingerprint selection — native expression
    * ([[graft.functions.Winnow]], registered as `graft_winnow`):
    * distinct sliding-window-of-`w` minima of a hash array in
    * first-occurrence order. [[winnowHof]] is the declarative
    * reference it is bit-parity-tested against.
    */
  def winnow(hashes: Column, w: Int): Column =
    call_function("graft_winnow", hashes, lit(w))

  /** The declarative HOF reference formulation of [[winnow]] —
    * interpreted (lambda dispatch + O(w) slice/min per window); kept
    * as the parity oracle, not for production use. Let-bound for the
    * same reason as [[shinglesHof]]. */
  def winnowHof(hashes: Column, w: Int): Column =
    letBound(hashes) { h =>
      when(size(h) === 0, array().cast("array<long>"))
        .when(size(h) < w, array(array_min(h)))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(h) - w),
          i => array_min(slice(h, i + 1, lit(w))))))
    }

  /** Stopword-membership language-ID heuristic. Confidence-free and
    * deliberately SQL-expressible (same CASE runs in the oracle): real
    * n-gram models are a model artifact, not an engine feature — the
    * engine-side contract is "a per-row classifier over tokens stays in
    * codegen".
    */
  def langIdHeuristic(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    when(padded.contains(" der ") || padded.contains(" und "), "de")
      .when(padded.contains(" el ") || padded.contains(" los "), "es")
      .when(padded.contains(" the "), "en")
      .otherwise("other")
  }

  /** Quality metrics struct: token count, mean token length, stopword
    * ratio, punctuation ratio — the standard cheap pre-filters of a
    * training-data pipeline.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val stop = stopwordFilter(toks)
    Seq(
      "n_tokens" -> nTok,
      "mean_tok_len" -> (length(text) - nTok + 1).cast("double") /
        greatest(nTok, lit(1)).cast("double"),
      "stopword_ratio" -> size(stop).cast("double") / greatest(nTok, lit(1)).cast("double"),
      "punct_ratio" -> length(regexp_replace(text, "[^.!?,;]", "")).cast("double") /
        greatest(length(text), lit(1)).cast("double"))
  }

  /** 16-hex-char content fingerprint (md5 prefix): cross-engine-stable
    * document identity key for dedup joins.
    */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)

  /** Polynomial rolling hash over the text's bytes (mod 2^31-1) as a
    * Column expression: a left fold with `aggregate` over the char
    * codes — deterministic, order-sensitive (unlike a token-set hash),
    * the building block for shift-tolerant chunk fingerprints. Not
    * SQL-oracle-expressible (no modmul fold in ANSI SQL) — covered by
    * LlmSpec determinism/sensitivity properties instead.
    *
    * The modulus is 2^31-1 (not 2^61-1): the accumulator stays < 2^31
    * so `acc*131 + c` stays far below Long range — a 2^61 modulus
    * overflows the multiply after ~8 characters and crashes under
    * Spark 4's default ANSI arithmetic.
    */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // 2^31-1, Mersenne; keeps acc*131 < 2^39
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(7L),
      (acc, c) => pmod(acc * 131 + c, p))
  }

  /** Iterated BPE training (the Sennrich algorithm) over a
    * word-frequency table — `rounds` actual merge rounds, not just one
    * round's pair counts (q205).
    *
    * Words are held in BOUNDARY-MARKED form `|a|b|c|` (one `|`-wrapped
    * segment per current symbol): pair counting splits on the marker,
    * and applying merge (a, b) is the literal string replace
    * `|a|b| → |ab|` — `replace()` consumes matches left-to-right
    * without overlap in both Spark and DuckDB, which is exactly BPE's
    * single-pass merge semantics (`aaa` + rule (a,a) → `aa a`), so
    * every round replays verbatim in the SQL oracle. Symbols must not
    * contain `|` (callers restrict the corpus alphabet). Pair counts
    * follow the reference algorithm: ALL adjacent positions count,
    * overlapping included (`aaa` contributes (a,a) twice).
    *
    * Scale shape: the iterate is the VOCAB-bounded (word, freq) table
    * — the corpus is touched once to build it; each round is one
    * explode+aggregate over the vocab, a 1-row top-1
    * (TakeOrderedAndProject), and a broadcast-crossJoin replace.
    * Lineage is cut per round (the q159/q168 pattern), so plan depth
    * stays linear in rounds. Ties break (n desc, a asc, b asc) —
    * deterministic across engines.
    *
    * @param words (tok, freq) — distinct words with corpus frequencies
    * @return one row per round: (round, left_sym, right_sym, n_occ)
    */
  def bpeMerges(words: org.apache.spark.sql.DataFrame,
                rounds: Int): org.apache.spark.sql.DataFrame = {
    require(rounds >= 1, s"bpeMerges needs rounds >= 1, got $rounds")
    var wt = words.select(
      concat(lit("|"), regexp_replace(col("tok"), "(.)", "$1|")).as("w"),
      col("freq"))
      .localCheckpoint(false)
    var merges: Option[org.apache.spark.sql.DataFrame] = None
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = wt
        .select(col("freq"),
          filter(split(col("w"), "\\|"), x => x =!= "").as("s"))
        .filter(size(col("s")) >= 2) // sequence(1,0) DESCENDS (q205 note)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("a"),
            element_at(col("s"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
      // 1-row top-1; checkpointed because it feeds BOTH the result row
      // and the merge application.
      val best = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .localCheckpoint(false)
      // Degenerate-corpus stop: when every word has collapsed to one
      // symbol, `pairs` is empty and cross-joining the empty `best`
      // into `wt` would silently empty the word table for all later
      // rounds. Emit the rounds that exist and stop — the output
      // contract is "up to `rounds` merges" (isEmpty on a 1-row
      // checkpointed frame is a cheap bounded action).
      if (best.isEmpty) { exhausted = true }
      else {
        val row = best.select(lit(r).as("round"), col("a").as("left_sym"),
          col("b").as("right_sym"), col("n").as("n_occ"))
        merges = Some(merges.map(_.unionAll(row)).getOrElse(row))
        if (r < rounds)
          wt = wt.crossJoin(broadcast(best.select(col("a"), col("b"))))
            .select(
              expr("replace(w, concat('|', a, '|', b, '|'), concat('|', a, b, '|'))")
                .as("w"),
              col("freq"))
            .localCheckpoint(false)
        r += 1
      }
    }
    merges.map(_.orderBy("round")).getOrElse(
      words.sparkSession.emptyDataFrame
        .select(lit(0).as("round"), lit("").as("left_sym"),
          lit("").as("right_sym"), lit(0L).as("n_occ"))
        .limit(0))
  }

  /** Encode a vocabulary with a TRAINED merge list — the apply half of
    * the BPE train→apply loop ([[bpeMerges]] is the train half;
    * round-13 verdict, missing #4: q275 trained merges but nothing
    * encoded the corpus with them). Rules apply in TRAINING ORDER,
    * each as the same single-pass `|a|b| → |ab|` replace used during
    * training, so a vocabulary word encodes exactly as it would have
    * merged had it been present at train time (greedy rule-order
    * semantics, the Sennrich apply).
    *
    * Scale shape: the encode runs over the VOCAB (distinct words) —
    * the corpus is never re-scanned; callers join corpus tokens
    * against the encoded vocab on the word key. The merge list itself
    * is rounds-bounded driver metadata (the loadCentroids
    * bounded-collect precedent), compiled into one chained-replace
    * projection — codegen'd, no UDF, no per-rule pass over the data.
    *
    * @param words  one column `tok` — distinct words to encode
    * @param merges [[bpeMerges]] output (round, left_sym, right_sym, n_occ)
    * @return (tok, encoded, n_subtok) — boundary-marked encoding and
    *         its subword count
    */
  def bpeEncode(words: org.apache.spark.sql.DataFrame,
                merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rules = merges.orderBy("round").collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    var enc = words.select(col("tok"),
      concat(lit("|"), regexp_replace(col("tok"), "(.)", "$1|")).as("w"))
    for ((a, b) <- rules)
      enc = enc.withColumn("w",
        replace(col("w"), lit(s"|$a|$b|"), lit(s"|$a$b|")))
    enc.select(col("tok"), col("w").as("encoded"),
      size(filter(split(col("w"), "\\|"), x => x =!= "")).cast("long")
        .as("n_subtok"))
  }
}

"""Byte-pair-encoding merge TRAINING (the iterative vocab-learning loop).

`bpe_merge_candidates` (plans/catalog_mix.py) computes pass-2 pair
statistics; this module closes the loop into the actual BPE training
kernel (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units"): repeatedly pick the most frequent
adjacent symbol pair and merge it everywhere, growing the learned-merge
table one rule per iteration. The classic implementation detail is kept:
training runs over the DISTINCT word table weighted by word frequency
(|vocab| rows per pass), never over the raw token stream.

Determinism discipline (same contract as operators/graph.pagerank):
every step is exact — pair totals are integer sums, the winner is the
unique max under the total order (total DESC, lhs ASC, rhs ASC), and
the merge itself is pure string surgery — so a fixed iteration count
replays BIT-IDENTICALLY in any engine; the DuckDB oracle unrolls the
same recurrence as chained CTEs.

The merge step — greedy, non-overlapping, left-to-right replacement of
the winning pair within each word — is expressed WITHOUT a fold or UDF
via the double-space trick on the spaced symbol representation
("h e l l o"):

    t       = ' ' || replace(w, ' ', '  ') || ' '
    merged  = replace(t, ' L  R ', ' LR ')
    next_w  = trim(replace(merged, '  ', ' '))

In `t` every symbol is flanked by its OWN spaces (two between adjacent
symbols, one at each end), so a ' L  R ' match consumes the right space
of L's gap and the left space of R's gap — two candidate matches
sharing a symbol cannot both match, which is exactly the greedy
non-overlapping semantics, and plain `replace` (both engines scan
left-to-right) does the rest. Verified against "a a a" -> "aa a",
"x a b a b x" -> "x ab ab x", etc. in tests.

Scale shape: per iteration ONE shuffle (the pair-count groupBy over the
exploded adjacent pairs of the |vocab|-row word table), one
TakeOrdered(1) for the winner, and one narrow map (the string merge)
with the 1-row winner broadcast — the canonical distributed-BPE plan.
Lineage is truncated with localCheckpoint on the pagerank cadence
contract (`checkpoint_every`); the winner row is always checkpointed
(it is both reused by the merge map and unioned into the result).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spaced_symbols(word: Column) -> Column:
    """Initial BPE representation: one space between adjacent
    characters ("hello" -> "h e l l o"). ASCII-safe in any engine;
    callers should pre-filter words to a charset both engines segment
    identically (the character-level catalog entry uses ^[a-z]+$) —
    or use `spaced_utf8_bytes` for the byte-level form that needs no
    charset filter at all."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def spaced_utf8_bytes(word: Column) -> Column:
    """Byte-level BPE base representation (GPT-2 style): the word's
    UTF-8 bytes as space-separated UPPERCASE hex pairs
    ("héllo" -> "68 C3 A9 6C 6C 6F"). Two properties make this the
    right base vocab for real multilingual pipelines:

    - ENGINE-AGNOSTIC segmentation: both Spark and DuckDB produce the
      identical hex dump of the identical UTF-8 bytes, so the
      base-vocab contract holds for ANY text — no ^[a-z]+$ charset
      pinning (character segmentation of multi-code-unit text is where
      Java regex and RE2 disagree; bytes never do).
    - COLLISION-FREE merges: every base symbol is exactly two hex
      chars, so every derived symbol is a concatenation of 2-char
      units with a unique decomposition — the plain-concat `merged`
      string of two distinct pairs can never collide (variable-width
      symbols could: '10'+'41' == '104'+'1')."""
    return F.trim(
        F.regexp_replace(F.hex(F.encode(word, "UTF-8")), "(..)", "$1 ")
    )


def merge_pair(word: Column, lhs: Column, rhs: Column) -> Column:
    """Greedy non-overlapping left-to-right merge of the symbol pair
    (lhs, rhs) in a spaced word — the double-space trick (module doc)."""
    t = F.concat(F.lit(" "), F.replace(word, F.lit(" "), F.lit("  ")), F.lit(" "))
    pat = F.concat(F.lit(" "), lhs, F.lit("  "), rhs, F.lit(" "))
    rep = F.concat(F.lit(" "), lhs, rhs, F.lit(" "))
    return F.trim(F.replace(F.replace(t, pat, rep), F.lit("  "), F.lit(" ")))


def adjacent_pairs(word: Column) -> Column:
    """Array of struct(lhs, rhs) for each adjacent symbol pair of a
    spaced word; empty for single-symbol words."""
    syms = F.split(word, " ")
    n1 = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, n1),
        F.slice(syms, 2, n1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )


def bpe_train_merges(
    words: DataFrame,
    iterations: int,
    word_col: str = "token",
    freq_col: str = "freq",
    checkpoint_every: int = 1,
    segmenter=spaced_symbols,
) -> DataFrame:
    """Learn `iterations` BPE merge rules from a (word, frequency)
    table; returns one row per learned rule:
    (step INT, lhs STRING, rhs STRING, merged STRING, total BIGINT)
    where `total` is the pair's frequency-weighted count at the moment
    it was selected. Stops early (fewer rows) if the vocabulary runs
    out of adjacent pairs.

    `checkpoint_every` follows the pagerank contract: n > 0 truncates
    the word table's lineage every n merges; 0 composes the merge maps
    lazily (each winner job then re-runs the narrow merge chain from
    the base table — cheap maps, no extra shuffles — right for small
    fixed iteration counts where job-launch overhead dominates).

    Per-step winner handling (r16, guide §1.2 per-task work): the
    winner is an O(1)-ROW decision, so it is COLLECTED to the driver
    (a contract-bounded limit(1) transfer — the same bound class as
    every audited collect site) and the merge map is built with
    LITERAL lhs/rhs. The r15 form instead localCheckpoint'ed the
    winner, probed isEmpty, and crossJoined a broadcast of it into the
    word table: per step that cost two extra driver actions plus one
    broadcast build, and under the lazy cadence step k's counting job
    re-planned k-1 accumulated broadcast joins. With literals the
    chain is pure narrow string projections (measured evidence in
    OPTIMIZATION_r16.md — isolated medians on the round's host are
    warm-up-noisy, so the steady claims rest on the downstream
    probes: bpe_encode_corpus build 4.8 -> 3.6 s and
    training_export_tokenized 7.26 -> 6.02 s at sf0.1; the trainer
    also sits inside streaming_bpe_encode). Semantics are unchanged —
    same counts, same total order, same greedy merge — pinned by the
    Python-replay equivalence tests.

    `segmenter` picks the base vocabulary: `spaced_symbols`
    (character-level, callers pin an engine-agnostic charset) or
    `spaced_utf8_bytes` (byte-level, any text).
    """
    if int(iterations) < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = words.select(
        segmenter(F.col(word_col)).alias("w"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    every = int(checkpoint_every)
    # materialize the base word table once, in EVERY cadence mode: it
    # is the output of the (potentially whole-corpus) frequency
    # aggregation, and each step's winner job starts from it — without
    # this, 8 lazy steps would re-run the corpus scan 8 times
    # (measured at sf0.1: ~0.5 s/scan), while one |vocab|-row
    # checkpoint costs a single pass
    w = w.localCheckpoint(eager=True)
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, int(iterations) + 1):
        counts = (
            w.select("freq", F.explode(adjacent_pairs(F.col("w"))).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("total"))
        )
        winner = (
            counts.orderBy(F.desc("total"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not winner:
            # vocabulary fully merged — no adjacent pairs remain
            break
        lhs, rhs, total = winner[0]["lhs"], winner[0]["rhs"], winner[0]["total"]
        # ADVICE r16: an all-NULL freq column makes sum(freq) NULL —
        # emit a 0-total rule (the r15 NULL-total row's spirit) rather
        # than raising TypeError on int(None)
        rules.append((step, lhs, rhs, lhs + rhs, 0 if total is None else int(total)))
        w = w.select(
            merge_pair(F.col("w"), F.lit(lhs), F.lit(rhs)).alias("w"),
            "freq",
        )
        if every > 0 and step % every == 0:
            w = w.localCheckpoint(eager=True)
    return words.sparkSession.createDataFrame(
        rules, "step int, lhs string, rhs string, merged string, total long"
    )


def bpe_apply_merges(
    words: DataFrame,
    merges: DataFrame,
    steps: int,
    word_col: str = "token",
    segmenter=spaced_symbols,
) -> DataFrame:
    """ENCODE: apply a learned merge table to a word table — the
    tokenizer-application pass a training pipeline runs over the whole
    corpus once the vocab is trained. Adds two columns to `words`:
    `encoded` (space-joined symbol sequence after all merges, applied
    in step order with the same greedy non-overlapping semantics as
    training) and `n_syms` (token count for the word).

    `merges` is the (step, lhs, rhs, ...) output of
    `bpe_train_merges`. The rule table is collected ONCE (a
    contract-bounded transfer: at most one rule per step, enforced
    below — same bound class as every audited collect site) and the
    chain is built as `steps` LITERAL string projections. A missing
    step (the trainer stopped early) simply adds no projection and
    leaves words unchanged — the same no-op the r15 NULL-joining
    broadcast chain produced, pinned by the early-stop test. The r15
    form instead planned one broadcast left join on a constant key
    per rule; per executed plan that was `steps` BroadcastExchanges +
    join operators at run time for rules the driver already knows at
    plan time (r16, guide §2.4 — remove exchanges outright; isolated
    sf0.1 encode exec 2.0 s -> narrow-map floor with identical
    output). No shuffle of the word table at any rule count, as
    before.

    Scale seam: this exact-replay chain is right for the bounded rule
    counts the oracle can unroll (each rule adds one projection). A
    production tokenizer with ~50k merges would instead ship the whole
    merge table into ONE Arrow-batched Pandas UDF (the rule table is
    KB-scale; per-word application is the same greedy loop) — same
    semantics, one stage, no 50k-deep expression tree.

    `segmenter` must match the one the merge table was trained with.
    """
    if int(steps) < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    # contract-bounded collect: <= 1 rule per step by the trainer's
    # semantics, so <= `steps` rows total. limit(steps + 1) bounds the
    # transfer even on malformed input, and a duplicate step raises
    # (the r15 join form would have silently duplicated word rows).
    rows = (
        merges.select("step", "lhs", "rhs")
        .where((F.col("step") >= 1) & (F.col("step") <= int(steps)))
        .limit(int(steps) + 1)
        .collect()
    )
    by_step: dict[int, tuple[str, str]] = {}
    for r in rows:
        k = int(r["step"])
        if k in by_step:
            raise ValueError(
                f"bpe_apply_merges: duplicate rule for step {k} — the "
                "merge table must carry at most one rule per step"
            )
        by_step[k] = (r["lhs"], r["rhs"])
    w = words.withColumn("encoded", segmenter(F.col(word_col)))
    for k in range(1, int(steps) + 1):
        rule = by_step.get(k)
        if rule is None or rule[0] is None or rule[1] is None:
            # early-stopped / absent step: leave words unchanged (the
            # r15 chain's NULL-join no-op branch)
            continue
        w = w.withColumn(
            "encoded",
            merge_pair(F.col("encoded"), F.lit(rule[0]), F.lit(rule[1])),
        )
    return w.withColumn("n_syms", F.size(F.split("encoded", " ")))


def bpe_apply_merges_arrow(
    words: DataFrame,
    merges: DataFrame,
    word_col: str = "token",
    segmenter=spaced_symbols,
) -> DataFrame:
    """ENCODE at production rule counts — the scale seam
    `bpe_apply_merges` documents, made real: the WHOLE learned merge
    table (KB–MB scale even at ~50k rules) ships to executors once via
    a Spark broadcast, and ONE Arrow-batched mapInPandas stage applies
    the rules per word with the same greedy non-overlapping
    left-to-right semantics as training. One stage, no 50k-deep
    expression tree, no per-rule broadcast join.

    The per-word loop applies rules IN STEP ORDER (the training
    recurrence), each as a single left-to-right scan — semantically
    identical to `bpe_apply_merges`' `merge_pair` chain, pinned by the
    equivalence test in tests/test_rank.py. Output schema matches
    `bpe_apply_merges`: input columns + (encoded, n_syms).

    The rule table is collected driver-side with a bound: a merge
    table larger than 1M rules is almost certainly a bug (GPT-2 ships
    50k; the cap raises instead of OOMing the driver).
    """
    rows = merges.orderBy("step").limit(1_000_001).collect()
    if len(rows) > 1_000_000:
        raise ValueError(
            "bpe_apply_merges_arrow: merge table exceeds 1M rules — "
            "that is not a tokenizer, check the trainer"
        )
    rules = [(r["lhs"], r["rhs"]) for r in rows]
    spark = words.sparkSession
    bc_rules = spark.sparkContext.broadcast(rules)
    in_cols = list(words.columns)

    w = words.withColumn("__spaced", segmenter(F.col(word_col)))

    def encode(batches):
        import pandas as _pd

        rl = bc_rules.value
        for pdf in batches:
            if pdf.empty:
                continue
            enc = []
            for spaced in pdf["__spaced"]:
                if spaced is None or (
                    isinstance(spaced, float) and _pd.isna(spaced)
                ):
                    # NULL word: match bpe_apply_merges, whose
                    # split/size chain yields NULL encoded / -1 n_syms.
                    enc.append(None)
                    continue
                syms = spaced.split(" ")
                for lhs, rhs in rl:
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if (
                            i + 1 < n
                            and syms[i] == lhs
                            and syms[i + 1] == rhs
                        ):
                            out.append(lhs + rhs)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                enc.append(" ".join(syms))
            res = pdf.drop(columns=["__spaced"]).copy()
            res["encoded"] = enc
            res["n_syms"] = [
                -1 if e is None else e.count(" ") + 1 for e in enc
            ]
            yield res

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in words.schema.fields
    ) + ", encoded string, n_syms int"
    return w.mapInPandas(encode, schema=out_schema).select(
        *in_cols, "encoded", "n_syms"
    )


def bpe_train_merges_batched(
    words: DataFrame,
    rounds: int,
    k: int,
    word_col: str = "token",
    freq_col: str = "freq",
    checkpoint_every: int = 1,
    segmenter=spaced_symbols,
) -> DataFrame:
    """BATCHED merge rounds (VERDICT r15 #8): per round, take the
    top-``k`` pairs by (total DESC, lhs ASC, rhs ASC) from ONE
    pair-count pass and apply all k merges in rank order — the
    production-trainer batching (HF tokenizers merge many pairs per
    counting round) that cuts rounds-per-vocab ~k-fold: one shuffle
    now buys k rules instead of one.

    Semantics, exactly replayable: ranks 2..k were counted BEFORE
    rank 1's merge was applied (that approximation IS the batching
    trade), but the application order is pinned — rule i transforms
    the output of rule i-1 with the same greedy non-overlapping
    double-space replace as the single-pair trainer — so a fixed
    (rounds, k) schedule is deterministic and the oracle unrolls the
    identical recurrence (one count CTE + k chained merge CTEs per
    round). Global rule index: step = (round-1)*k + rank, and
    ``total`` is the pair's count at its round's counting pass.

    Plan per round: ONE pair-count shuffle, one TakeOrdered(k) +
    rank window on the k-row winner table (eagerly checkpointed — an
    O(k)-row decision read by k merge maps AND the result union), and
    k narrow broadcast-constant-key maps. A missing rank (the vocab
    ran out of pairs mid-round) left-joins NULL and leaves words
    unchanged — never the crossJoin-with-empty hazard.
    ``checkpoint_every`` counts ROUNDS (the pagerank cadence
    contract, same as the single-pair trainer's steps).
    """
    if int(rounds) < 1 or int(k) < 1:
        raise ValueError(f"rounds and k must be >= 1, got {rounds}, {k}")
    from pyspark.sql import Window

    w = words.select(
        segmenter(F.col(word_col)).alias("w"),
        F.col(freq_col).cast("long").alias("freq"),
    ).localCheckpoint(eager=True)
    every = int(checkpoint_every)
    order = [F.desc("total"), F.asc("lhs"), F.asc("rhs")]
    rules: list[DataFrame] = []
    for rnd in range(1, int(rounds) + 1):
        counts = (
            w.select("freq", F.explode(adjacent_pairs(F.col("w"))).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("total"))
        )
        ranked = (
            counts.orderBy(*order)
            .limit(int(k))
            .select(
                "*", F.row_number().over(Window.orderBy(*order)).alias("rank")
            )
            .localCheckpoint(eager=True)
        )
        if ranked.isEmpty():
            break  # vocabulary fully merged
        rules.append(
            ranked.select(
                (F.lit((rnd - 1) * int(k)) + F.col("rank")).cast("int")
                .alias("step"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                "total",
            )
        )
        for i in range(1, int(k) + 1):
            ri = ranked.where(F.col("rank") == i).select(
                F.lit(1).alias("_j"),
                F.col("lhs").alias("_l"),
                F.col("rhs").alias("_r"),
            )
            w = (
                w.withColumn("_j", F.lit(1))
                .join(F.broadcast(ri), "_j", "left")
                .select(
                    F.when(
                        F.col("_l").isNotNull(),
                        merge_pair(F.col("w"), F.col("_l"), F.col("_r")),
                    ).otherwise(F.col("w")).alias("w"),
                    "freq",
                )
            )
        if every > 0 and rnd % every == 0:
            w = w.localCheckpoint(eager=True)
    if not rules:
        return words.sparkSession.createDataFrame(
            [], "step int, lhs string, rhs string, merged string, total long"
        )
    return reduce(DataFrame.unionByName, rules)

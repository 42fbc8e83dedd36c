"""Randomized (seeded) parity of the late-r3 corpus operators against
independent pure-Python references — small vocabularies force heavy gram
collisions, duplicate lines, and revisiting walks, the regimes where an
off-by-one survives hand-picked examples."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# --- pure-Python references -------------------------------------------------


def py_duplicate_spans(texts, k, min_docs):
    grams = {}
    for d, t in texts.items():
        toks = t.split(" ")
        grams[d] = [
            (" ".join(toks[i : i + k]), i + 1)
            for i in range(len(toks) - k + 1)
        ]
    df = Counter()
    for d, gs in grams.items():
        for g in {g for g, _ in gs}:
            df[g] += 1
    dup = {g for g, n in df.items() if n >= min_docs}
    out = set()
    for d, gs in grams.items():
        pos = sorted(p for g, p in gs if g in dup)
        ivs = []
        for p in pos:
            if ivs and p <= ivs[-1][1] + 1:
                ivs[-1] = (ivs[-1][0], p + k - 1)
            else:
                ivs.append((p, p + k - 1))
        for s, e in ivs:
            out.add((d, s, e, e - s + 1))
    return out


def py_boilerplate(texts, min_docs):
    df = Counter()
    for t in texts.values():
        for line in set(t.split("\n")):
            df[line] += 1
    boiler = {ln for ln, n in df.items() if n >= min_docs}
    out = {}
    for d, t in texts.items():
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        out[d] = (
            len(lines),
            sum(1 for ln in lines if ln in boiler),
            "\n".join(kept),
        )
    return out


def py_skipgram(walks, window):
    by_walk = {}
    for start, k, step, node in walks:
        by_walk.setdefault((start, k), []).append((step, node))
    pairs = Counter()
    for seq in by_walk.values():
        seq = [n for _, n in sorted(seq)]
        for i, ci in enumerate(seq):
            for j, cj in enumerate(seq):
                if i != j and abs(i - j) <= window:
                    pairs[(ci, cj)] += 1
    return dict(pairs)


# --- parity tests ------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_spans_matches_python_reference(spark, seed):
    from node_feedparser_spark.operators.dedupe import duplicate_spans

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(6)]  # tiny vocab -> many shared grams
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25)))
        for d in range(30)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.start_tok, r.end_tok, r.span_tokens)
        for r in duplicate_spans(docs, k=3, min_docs=2).collect()
    }
    assert got == py_duplicate_spans(texts, k=3, min_docs=2)


@pytest.mark.parametrize("seed", [0, 1])
def test_boilerplate_scrub_matches_python_reference(spark, seed):
    from node_feedparser_spark.operators.curation import boilerplate_scrub

    rng = random.Random(seed)
    lines_pool = [f"line {i}" for i in range(8)]
    texts = {
        d: "\n".join(
            rng.choice(lines_pool) for _ in range(rng.randint(1, 6))
        )
        for d in range(25)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lines, r.n_boilerplate, r.clean_text)
        for r in boilerplate_scrub(docs, min_docs=4).collect()
    }
    assert got == py_boilerplate(texts, min_docs=4)


@pytest.mark.parametrize("seed,window", [(0, 1), (1, 2), (2, 3)])
def test_skipgram_matches_python_reference(spark, seed, window):
    from node_feedparser_spark.operators.graph_algo import skipgram_pairs

    rng = random.Random(seed)
    rows = []
    for start in range(8):
        for k in range(2):
            length = rng.randint(0, 5)
            for step in range(length + 1):
                rows.append((f"s{start}", k, step, f"n{rng.randrange(4)}"))
    walks = spark.createDataFrame(
        rows, "start_node string, walk_k long, step long, node string"
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=window).collect()
    }
    assert got == py_skipgram(rows, window)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_walks_every_step_is_a_real_edge(spark, seed):
    """Structural invariant on random graphs: every consecutive (step t-1,
    step t) pair of every walk is an edge of the simple directed graph."""
    from node_feedparser_spark.operators.graph_algo import random_walks

    rng = random.Random(seed)
    pairs = list({
        (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}") for _ in range(35)
    })
    pairs = [(a, b) for a, b in pairs if a != b]
    e = spark.createDataFrame(pairs, "src_id string, dst_id string")
    rows = random_walks(e, walk_len=4, walks_per_node=2, seed=seed).collect()
    eset = set(pairs)
    walks = {}
    for r in rows:
        walks.setdefault((r.start_node, r.walk_k), {})[r.step] = r.node
    for (start, k), seq in walks.items():
        assert seq[0] == start
        # steps are a contiguous prefix 0..m (walks never skip a step)
        assert set(seq) == set(range(len(seq)))
        for t in range(1, len(seq)):
            assert (seq[t - 1], seq[t]) in eset

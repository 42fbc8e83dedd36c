"""cluster_quality: B-cubed / pairwise / ARI from the contingency table,
pinned against an independent pure-Python item-level computation (which
evaluates B-cubed per item and pairs by enumeration — no shared formula)."""

import itertools
import random
from collections import Counter

from node_feedparser_spark.operators.cluster_eval import cluster_quality


def _ref(labels):
    """labels: list of (pred, true). Item-level / pair-enumeration spec."""
    n = len(labels)
    # B-cubed per item
    b3p = b3r = 0.0
    for i, (p, t) in enumerate(labels):
        same_p = [j for j, (p2, _) in enumerate(labels) if p2 == p]
        same_t = [j for j, (_, t2) in enumerate(labels) if t2 == t]
        both = [j for j in same_p if labels[j][1] == t]
        b3p += len(both) / len(same_p)
        b3r += len(both) / len(same_t)
    b3p, b3r = b3p / n, b3r / n
    # pairwise by enumeration
    tp = fp = fn = 0
    for i, j in itertools.combinations(range(n), 2):
        sp = labels[i][0] == labels[j][0]
        st = labels[i][1] == labels[j][1]
        tp += sp and st
        fp += sp and not st
        fn += st and not sp
    pp = tp / (tp + fp) if tp + fp else 0.0
    pr = tp / (tp + fn) if tp + fn else 0.0
    # ARI from contingency counts
    npt = Counter(labels)
    np_ = Counter(p for p, _ in labels)
    nt_ = Counter(t for _, t in labels)
    c2 = lambda v: v * (v - 1) / 2  # noqa: E731
    sum_pt = sum(c2(v) for v in npt.values())
    sum_p = sum(c2(v) for v in np_.values())
    sum_t = sum(c2(v) for v in nt_.values())
    exp = sum_p * sum_t / c2(n) if c2(n) else 0.0
    den = (sum_p + sum_t) / 2 - exp
    ari = (sum_pt - exp) / den if den != 0 else 0.0
    f1 = lambda a, b: 2 * a * b / (a + b) if a + b else 0.0  # noqa: E731
    return {
        "n_items": n,
        "n_pred_clusters": len(np_),
        "n_true_clusters": len(nt_),
        "b3_precision": b3p, "b3_recall": b3r, "b3_f1": f1(b3p, b3r),
        "pair_precision": pp, "pair_recall": pr, "pair_f1": f1(pp, pr),
        "ari": ari,
    }


def _run(spark, labels):
    df = spark.createDataFrame(
        labels, "pred_cluster string, true_cluster string"
    )
    row = cluster_quality(df).collect()[0].asDict()
    return row


def _close(got, want):
    for k, v in want.items():
        g = got[k]
        if isinstance(v, float):
            assert abs(g - v) < 2e-6, (k, g, v)
        else:
            assert g == v, (k, g, v)


def test_perfect_clustering(spark):
    labels = [("a", "x")] * 3 + [("b", "y")] * 2 + [("c", "z")]
    got = _run(spark, labels)
    for k in ("b3_precision", "b3_recall", "b3_f1",
              "pair_precision", "pair_recall", "pair_f1", "ari"):
        assert got[k] == 1.0, k
    assert got["n_items"] == 6


def test_hand_example(spark):
    # classic B-cubed example: one merge error, one split error
    labels = [("a", "x"), ("a", "x"), ("a", "y"),
              ("b", "y"), ("c", "z"), ("c", "z")]
    _close(_run(spark, labels), _ref(labels))


def test_all_singletons_ari_zero_convention(spark):
    labels = [(f"p{i}", f"t{i}") for i in range(5)]
    got = _run(spark, labels)
    # no pairs anywhere: precision/recall fall back to 0, ARI 0/0 -> 0
    assert got["pair_precision"] == 0.0
    assert got["ari"] == 0.0
    assert got["b3_precision"] == 1.0  # every item alone is pure


def test_one_big_predicted_cluster(spark):
    labels = [("a", f"t{i % 3}") for i in range(9)]
    _close(_run(spark, labels), _ref(labels))


def test_random_parity(spark):
    rng = random.Random(23)
    for trial in range(3):
        labels = [
            (f"p{rng.randrange(4)}", f"t{rng.randrange(3)}")
            for _ in range(rng.randrange(8, 30))
        ]
        _close(_run(spark, labels), _ref(labels))

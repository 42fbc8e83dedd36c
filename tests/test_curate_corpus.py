"""End-to-end curation funnel (plans/curate.py): a planted corpus hits
every drop stage exactly once-or-more, and the survivors ship scrubbed,
split, and partitioned."""

import os

from pyspark.sql import functions as F

from node_feedparser_spark.plans.curate import curate_corpus

LONG = " ".join(f"w{i}" for i in range(30))  # 30 distinct tokens


def _write(spark, tmp_path, rows, name="docs"):
    p = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(p)
    return p


def test_funnel_hits_every_stage(spark, tmp_path):
    rows = [
        (1, LONG, "en", "s0"),                       # kept (near-dup keeper)
        (2, LONG, "en", "s0"),                       # exact_dup of 1
        (3, LONG + " extra", "en", "s0"),            # near_dup of 1 (J=27/28)
        (4, "one two three", "en", "s0"),            # too_short (< 5 tokens)
        (5, "x x x x x x x x x x", "en", "s0"),      # repetitive (dup 3-grams)
        (6, ",a. ,b. ,c. ,d. ,e.", "en", "s0"),      # low_quality (punct)
        (7, "alpha beta gamma delta epsilon zeta", "en", "s0"),  # contaminated
        (8, "please contact me at bob@example.com for more info", "en", "s1"),
        (9, "der die das und nicht ist ein wort hier lang", "de", "s1"),
        (10, "completely unrelated clean sentence about spark engines", "en", "s1"),
    ]
    eval_p = _write(
        spark, tmp_path,
        [(100, "xx beta gamma delta yy", "en", "ev")], name="eval",
    )
    docs_p = _write(spark, tmp_path, rows)
    out = str(tmp_path / "out")
    s = curate_corpus(
        spark, docs_p, out, eval_path=eval_p, min_tokens=5, min_quality=0.2,
    )
    assert s["input_docs"] == 10
    f = s["funnel"]
    assert f["exact_dup"] == 1       # doc 2 (doc 1 is the keeper)
    assert f["near_dup"] == 1        # doc 3
    assert f["too_short"] == 1       # doc 4
    assert f["repetitive"] == 1      # doc 5
    assert f["low_quality"] == 1     # doc 6
    assert f["contaminated"] == 1    # doc 7
    assert f["over_budget"] == 0     # no budget set
    assert s["output_docs"] == 4     # docs 1, 8, 9, 10
    assert s["pii_redactions"] >= 1  # doc 8's email
    assert sum(s["splits"].values()) == 4

    cur = spark.read.parquet(os.path.join(out, "curated"))
    kept = {r.doc_id: r for r in cur.collect()}
    assert set(kept) == {1, 8, 9, 10}
    assert "<EMAIL>" in kept[8].text and "bob@example.com" not in kept[8].text
    assert set(cur.columns) >= {"doc_id", "text", "split", "n_tokens",
                                "quality_score", "strat_lang"}
    # split column is the physical partition (hive layout)
    assert any(
        d.startswith("split=") for d in os.listdir(os.path.join(out, "curated"))
    )


def test_budget_drops_survivors_deterministically(spark, tmp_path):
    rows = [
        (i, f"unique sentence number {i} with token t{i} inside here ok", "en", "s0")
        for i in range(20)
    ]
    docs_p = _write(spark, tmp_path, rows)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    a = curate_corpus(spark, docs_p, out1, budget=50, min_quality=-1.0)
    b = curate_corpus(spark, docs_p, out2, budget=50, min_quality=-1.0)
    assert a["funnel"]["over_budget"] > 0
    assert a["output_docs"] + a["funnel"]["over_budget"] == 20
    ka = {r.doc_id for r in spark.read.parquet(os.path.join(out1, "curated")).collect()}
    kb = {r.doc_id for r in spark.read.parquet(os.path.join(out2, "curated")).collect()}
    assert ka == kb  # hash-priority sampling is run-stable


def test_boilerplate_scrub_feeds_the_gates(spark, tmp_path):
    """A shared banner line is removed BEFORE the length gate: a doc whose
    only content beyond the banner is 3 tokens must drop as too_short."""
    banner = "subscribe to our newsletter today please"
    rows = [
        (1, f"{banner}\nreal unique content sentence number one here", "en", "s0"),
        (2, f"{banner}\njust three tokens", "en", "s0"),
        (3, f"{banner}\nanother genuinely long unique sentence lives here", "en", "s0"),
    ]
    docs_p = _write(spark, tmp_path, rows)
    s = curate_corpus(
        spark, docs_p, str(tmp_path / "out"),
        boiler_min_docs=2, min_tokens=5, min_quality=-1.0,
    )
    assert s["boilerplate_lines_removed"] == 3
    assert s["funnel"]["too_short"] == 1      # doc 2 after the scrub
    assert s["output_docs"] == 2
    cur = spark.read.parquet(str(tmp_path / "out" / "curated"))
    assert all(banner not in r.text for r in cur.collect())

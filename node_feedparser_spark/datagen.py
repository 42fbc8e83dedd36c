"""Deterministic synthetic transcript corpus.

Schema fixed by BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int32, role string, text string,
                tool string, ts timestamp)

Fixture classes mirror the reference's edge-case corpus
(/root/reference/test/feeds, 29 files; see FIXTURES.md): each conv_id prefix
encodes one hostile-input class.  Everything is seeded — same seed =>
byte-identical corpus at any scale, which is what makes the two-parallelism
bench apples-to-apples (SURVEY.md §7 'two-level determinism').
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "bash", "python", "browser", "sql")

# Alias groups: surface forms that must collapse to one canonical entity
# (FIXTURES.md `alias-` class; reference analog: many ns URIs -> one prefix,
# lib/constants.js:7-38).  Group[0] is the intended canonical form; the rest
# are static-table aliases, case variants, and typo variants (fuzzy path).
ENTITY_GROUPS: list[list[str]] = [
    # [canonical, static-table aliases..., case variants..., typo variants...]
    # static-table forms resolve via constants.ALIAS_TABLE (exact key);
    # case variants resolve via key normalization (casefold);
    # typo variants (doubled letters) resolve via the fuzzy LSH path —
    # all keep 3-gram Jaccard >= 0.57 to canonical while every cross-group
    # pair stays <= 0.34 (verified separability; FUZZY_JACCARD = 0.55).
    ["Kubernetes", "K8s", "Kube", "KUBERNETES", "Kuberrnetes", "Kubernetess"],
    ["PostgreSQL", "Postgres", "PG", "Postgresql", "Posstgresql"],
    ["JavaScript", "JS", "Javascript", "Javasscript"],
    ["TypeScript", "TS", "Typescript", "Typescriptt"],
    ["Python", "Py", "PYTHON", "Pythonn"],
    ["Terraform", "TF", "Terraforrm"],
    ["GitHub", "GH", "Github", "Githubb"],
    ["Elasticsearch", "ES", "ElasticSearch", "Elasticsearchh"],
    ["NumPy", "NP", "Numpy", "Numppy"],
    ["Pandas", "PD", "Panddas"],
    ["Apache Spark", "Spark", "Apache Sparkk"],
    ["Apache Kafka", "Kafka", "Apache Kafkaa"],
    ["Docker", "Doccker"],
    ["Redis", "Rediss"],
    ["Prometheus", "Promettheus"],
]

PLAIN_ENTITIES = [
    "Platform", "Database", "Scheduler", "Compiler", "Runtime",
    "Pipeline", "Container", "Load Balancer", "Query Engine",
    "Message Queue", "Object Store", "Control Plane",
]

# (template, predicate) — templates match constants.RELATION_PATTERNS.
SENTENCE_TEMPLATES = [
    ("{a} is a {b}", "is_a"),
    ("{a} is part of {b}", "part_of"),
    ("{a} uses {b}", "uses"),
    ("{a} created {b}", "created"),
    ("{a} runs on {b}", "runs_on"),
    ("{a} depends on {b}", "depends_on"),
    ("{a} connects to {b}", "connects_to"),
    ("{a} maintains {b}", "maintains"),
]

FILLER = (
    "we should check the logs and retry the deploy because the previous "
    "attempt failed with a timeout after the config change"
).split()

HTML_NOISE = [
    '<div class="flare"><a href="http://example.com/a">share</a></div>',
    "<p style=\"color: red\" title=\"1 > 0\">note</p>",
    "<!-- tracking pixel --><img src='http://example.com/t.gif'>",
    "<script>var x = 1;</script>",
]
JSON_NOISE = [
    '{"status": "error", "code": 500, "retries": 3}',
    '{"result": [1, 2, 3], "elapsed_ms": 141}',
]
TRACE_NOISE = [
    'Traceback (most recent call last):\n  File "job.py", line 10\nValueError: bad input',
]
ANGLE_TEXTS = [
    "the inequality 1 < 2 always holds and 3 > 2 too",
    "read <<<Tutorial>>> before starting",
    "the element <foo> is not HTML and must survive",
    "use x < y && y > z in the predicate",
]

_EPOCH = datetime(2025, 1, 6, 9, 0, 0)


class _ConvBuilder:
    def __init__(self, rng: random.Random, conv_id: str):
        self.rng = rng
        self.conv_id = conv_id
        self.rows: list[dict] = []
        self.ts = _EPOCH + timedelta(seconds=rng.randrange(0, 10_000_000))

    def add(self, text, tool=None, role=None, turn_idx=None):
        self.ts += timedelta(seconds=self.rng.randrange(5, 600))
        self.rows.append(
            {
                "conv_id": self.conv_id,
                "turn_idx": len(self.rows) if turn_idx is None else turn_idx,
                "role": role or ROLES[len(self.rows) % 2],
                "text": text,
                "tool": tool,
                "ts": self.ts,
            }
        )


def _sentence(rng: random.Random) -> str:
    """One filler-padded relation sentence over the entity pool."""
    grp_a = rng.choice(ENTITY_GROUPS)
    a = rng.choice(grp_a)
    b = rng.choice(PLAIN_ENTITIES) if rng.random() < 0.5 else rng.choice(
        rng.choice(ENTITY_GROUPS)
    )
    tmpl, _ = rng.choice(SENTENCE_TEMPLATES)
    core = tmpl.format(a=a, b=b)
    pre = " ".join(rng.choices(FILLER, k=rng.randrange(0, 6)))
    post = " ".join(rng.choices(FILLER, k=rng.randrange(0, 6)))
    return f"{pre} {core} {post}".strip() + "."


def _clean_conv(rng, b: _ConvBuilder, n_turns: int) -> None:
    for _ in range(n_turns):
        if rng.random() < 0.2:
            b.add(f"running {rng.choice(TOOLS)} now", tool=rng.choice(TOOLS), role="tool")
        else:
            b.add(" ".join(_sentence(rng) for _ in range(rng.randrange(1, 3))))


def _mojibake(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def generate_transcripts(seed: int = 42, scale: float = 1.0) -> pd.DataFrame:
    """Build the full fixture corpus.  scale multiplies conversation counts
    (scale=1.0 ~= 3.3k rows; bench uses scale>=100)."""
    rng = random.Random(seed)
    convs: list[_ConvBuilder] = []

    def new(prefix: str, i: int) -> _ConvBuilder:
        b = _ConvBuilder(rng, f"{prefix}{i:05d}")
        convs.append(b)
        return b

    n = max(1, int(20 * scale))

    for i in range(n):  # clean-: happy path
        _clean_conv(rng, new("clean-", i), rng.randrange(4, 12))

    for i in range(max(1, n // 4)):  # trunc-: truncated turns mid-sentence
        b = new("trunc-", i)
        _clean_conv(rng, b, 3)
        s = _sentence(rng)
        b.add(s[: max(3, len(s) // 2)] + "�")
        _clean_conv(rng, b, 2)  # later turns must still produce triples

    for i in range(max(1, n // 4)):  # enc-: mojibake / invalid bytes
        b = new("enc-", i)
        b.add(_mojibake(f"café résumé naïve — {_sentence(rng)}"))
        b.add("touch\x00ed by \x07 control bytes " + _sentence(rng))
        _clean_conv(rng, b, 2)

    for i in range(max(1, n // 4)):  # noise-: HTML/JSON/trace noise
        b = new("noise-", i)
        b.add(f"{rng.choice(HTML_NOISE)} {_sentence(rng)} {rng.choice(HTML_NOISE)}")
        b.add(f"{rng.choice(JSON_NOISE)}\n{_sentence(rng)}")
        b.add(rng.choice(TRACE_NOISE), tool="python", role="tool")
        _clean_conv(rng, b, 2)

    for i in range(max(1, n // 4)):  # nest-: duplicate (conv_id, turn_idx)
        b = new("nest-", i)
        _clean_conv(rng, b, 3)
        b.add(_sentence(rng), turn_idx=1)  # duplicate key, later ts -> loses
        b.add("turn <turn idx=2> nested inside </turn> " + _sentence(rng))

    for i in range(max(1, n // 4)):  # dupe-: repeated mentions
        b = new("dupe-", i)
        g = rng.choice(ENTITY_GROUPS)
        e = g[0]
        b.add(f"{e} uses {e} and {e} again plus {rng.choice(g)}")
        b.add(f"{e} is a {rng.choice(PLAIN_ENTITIES)}. {e} is a {rng.choice(PLAIN_ENTITIES)}")

    for i in range(max(1, n // 4)):  # late-: conversation-level fact last
        b = new("late-", i)
        _clean_conv(rng, b, 4)
        b.add(f"summary: Topic is a {rng.choice(PLAIN_ENTITIES)}")

    for i in range(n):  # alias-: same entity, many surface forms
        b = new("alias-", i)
        g = rng.choice(ENTITY_GROUPS)
        for form in rng.sample(g, k=min(3, len(g))):
            b.add(f"{form} runs on {rng.choice(PLAIN_ENTITIES)}")

    for i in range(max(1, n // 4)):  # order-: physically shuffled rows
        _clean_conv(rng, new("order-", i), 8)

    # mega-: one conversation with ~100x the median turn count (skew clause)
    b = new("mega-", 0)
    _clean_conv(rng, b, int(800 * max(1.0, scale ** 0.5)))

    for i in range(max(1, n // 4)):  # empty-: null/empty/whitespace text
        b = new("empty-", i)
        b.add(None)
        b.add("")
        b.add("   \t  ")
        b.add(None, role="user")

    for i in range(max(1, n // 4)):  # angle-: literal angle brackets survive
        b = new("angle-", i)
        for t in ANGLE_TEXTS:
            b.add(t)

    rows: list[dict] = []
    for c in convs:
        rs = c.rows
        if c.conv_id.startswith("order-"):
            rs = rs[:]
            rng.shuffle(rs)  # physical order != logical order
        rows.extend(rs)
    # global interleave so no fixture class is file-contiguous
    order = list(range(len(rows)))
    rng.shuffle(order)
    rows = [rows[i] for i in order]

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"])
    return df


def write_transcripts(path: str, seed: int = 42, scale: float = 1.0) -> int:
    """Write the corpus as parquet (several row groups so Spark gets multiple
    input splits).  Returns row count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    df = generate_transcripts(seed=seed, scale=scale)
    # microsecond timestamps: Spark's vectorized parquet reader rejects the
    # nanosecond INT64 physical type pandas defaults to
    df = df.assign(ts=df["ts"].astype("datetime64[us]"))
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path, row_group_size=max(4096, len(df) // 16))
    return len(df)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="write a synthetic transcript corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    n = write_transcripts(args.out, seed=args.seed, scale=args.scale)
    print(f"wrote {n} rows to {args.out}")

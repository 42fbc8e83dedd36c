"""JVM fast-path triple extraction — whole-stage-codegen for the clean 95%.

The mapInPandas extractor (operators/extract.py) is exact but pays the
Arrow exchange plus ~36 µs/row of Python.  Most turns don't need Python at
all: the only parts of `normalize_text` that regexes can't express are the
whitelist HTML strip (text containing '<'), mojibake repair (marker chars),
control-char removal, and Python's unicode-aware strip (exotic whitespace).
Rows exhibiting NONE of those — the overwhelming majority of real text —
normalize to a plain trim, and the extraction grammar itself
(constants.RELATION_PATTERN_STRINGS / ENTITY_RE_STRING) is pure-ASCII
regex on which java.util.regex and Python `re` agree match-for-match.

So `extract_triples_hybrid` screens rows:

  clean -> one JVM projection: per-pattern `regexp_extract_all` pairs,
           tool triple, mention scan — concatenated into ONE array of
           triple structs per turn, `array_distinct` for the within-turn
           keep-first dedupe (order inside the array reproduces the spec's
           emission order per class), then explode.  No shuffle, no Python,
           full codegen.
  dirty -> the existing mapInPandas spec path (exact by construction).

Equality of the two paths on the triple SET is guaranteed because the
dedupe key (conv_id, turn_idx, subj, pred, obj) determines the score
(pattern/tool/mention triples are structurally disjoint shapes), so
emission order can only affect which *identical* row survives.  Pinned by
tests/test_extract_jvm.py on the full fixture corpus plus adversarial rows.

Reference analog: this is the reference's own fast/slow split — sax's
fast character scan with an escape hatch to expensive handling only where
markup demands it (/root/reference/lib/feedparser.js:82-101).

MEASURED VERDICT (round 1, local[32], 4.7M turns): the Arrow-batched
Python path runs this grammar FASTER than Spark's Java-regex expressions
(10.3 s vs 18.7 s end-to-end) — 9 full-text `regexp_extract_all` scans per
row cost more in the JVM than the whole per-row Python extractor.  The
pipeline therefore defaults to `operators.extract.extract_triples`; this
module stays as the tested escape hatch for deployments where Python
workers are the constrained resource (e.g. memory-starved executors),
NOT as a throughput win.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import (
    ENTITY_RE_STRING,
    MOJIBAKE_MARKERS,
    RELATION_PATTERN_STRINGS,
    SCORE_MENTION,
    SCORE_PATTERN,
    SCORE_TOOL,
)
from ..reference_extract import STOPWORDS
from ..schemas import TRIPLES_RAW
from .extract import extract_triples

# Rows containing any of these need the Python path:
#   control chars (normalize strips them), '<' (whitelist HTML strip),
#   exotic unicode whitespace (Python str.strip vs Java \s), DEL.
_DIRTY_TEXT_RE = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f<"
    "\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"
)
_STOPWORD_LIST = sorted(STOPWORDS)


def _is_dirty(text: Column, tool: Column) -> Column:
    marker = None
    for m in MOJIBAKE_MARKERS:
        c = text.contains(m)
        marker = c if marker is None else (marker | c)
    return (
        (text.isNotNull() & (text.rlike(_DIRTY_TEXT_RE) | marker))
        | (tool.isNotNull() & tool.rlike(_DIRTY_TEXT_RE))
    )


def _entity_ok(c: Column) -> Column:
    """Spec `_is_entity`: multi-word always; single capitalized function
    words (STOPWORDS) are not entities."""
    return c.contains(" ") | ~c.isin(*_STOPWORD_LIST)


def _triple_struct(subj: Column, pred: Column, obj: Column, score: float) -> Column:
    return F.struct(
        subj.alias("subj"), pred.alias("pred"), obj.alias("obj"),
        F.lit(score).alias("score"),
    )


def extract_triples_jvm(turns: DataFrame) -> DataFrame:
    """Pure-JVM extraction for pre-screened clean rows.  One projection:
    build every candidate triple into a single array per turn, dedupe with
    array_distinct (keep-first), explode."""
    # Python str.strip() on clean rows strips {space, \t, \n, \r} (rows
    # with \x0b/\x0c or unicode spaces are screened to the Python path);
    # Java \s covers exactly those for clean rows.  Spark F.trim strips
    # spaces only, hence the regexp strip.
    norm = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), r"^\s+|\s+$", ""
    )

    def _span_maker(p: str, raw: str):
        # one full-text scan per pattern (group 0); subject/object then come
        # from re-matching the SHORT matched span — two tiny scans per match
        # instead of two more full-text passes (17 -> 9 full scans total)
        return lambda m: _triple_struct(
            F.regexp_extract(m, raw, 1), F.lit(p),
            F.regexp_extract(m, raw, 2), SCORE_PATTERN,
        )

    parts = []
    for pred, raw in RELATION_PATTERN_STRINGS:
        spans = F.regexp_extract_all(norm, F.lit(raw), 0)
        z = F.transform(spans, _span_maker(pred, raw))
        parts.append(
            F.filter(z, lambda t: _entity_ok(t["subj"]) & _entity_ok(t["obj"]))
        )

    conv_ent = F.concat(F.lit("conv:"), F.col("conv_id"))
    # the spec is Python str(tool).strip(); F.trim strips ONLY spaces, so a
    # tool padded with \t/\n/\r would keep its padding (and a whitespace-only
    # tool would emit a spurious triple).  Java \s = [ \t\n\x0B\f\r] covers
    # exactly the whitespace a clean row can contain (\x0b/\x0c and all
    # exotic unicode spaces are screened to the Python path by _is_dirty).
    tool_trim = F.regexp_replace(F.col("tool"), r"^\s+|\s+$", "")
    # singleton array filtered by a row-level predicate: avoids typing an
    # empty-array literal in the otherwise branch
    tool_part = F.filter(
        F.array(
            _triple_struct(
                conv_ent, F.lit("invokes"),
                F.concat(F.lit("tool:"), tool_trim), SCORE_TOOL,
            )
        ),
        lambda _t: F.col("tool").isNotNull() & (tool_trim != ""),
    )

    mentions = F.transform(
        F.filter(
            F.regexp_extract_all(norm, F.lit(ENTITY_RE_STRING), 0), _entity_ok
        ),
        lambda m: _triple_struct(conv_ent, F.lit("mentions"), m, SCORE_MENTION),
    )

    candidates = F.array_distinct(F.concat(*parts, tool_part, mentions))
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            F.explode(candidates).alias("t"),
        )
        .select(
            "conv_id", "turn_idx",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.score").alias("score"),
        )
    )


def extract_triples_hybrid(turns: DataFrame) -> DataFrame:
    """Screened hybrid: JVM projection for clean rows, mapInPandas spec
    path for rows with markup / mojibake / control chars / exotic
    whitespace.  Identical output to extract_triples on any input."""
    dirty = _is_dirty(F.col("text"), F.col("tool"))
    jvm = extract_triples_jvm(turns.filter(~dirty))
    py = extract_triples(turns.filter(dirty))
    out = jvm.unionByName(py)
    # pin the contract schema (types identical to TRIPLES_RAW)
    return out.select(
        F.col("conv_id").cast(TRIPLES_RAW["conv_id"].dataType),
        F.col("turn_idx").cast(TRIPLES_RAW["turn_idx"].dataType),
        "subj", "pred", "obj",
        F.col("score").cast("double"),
    )

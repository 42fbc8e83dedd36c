"""reference_extract — the pure-Python *spec* for triple extraction.

The reference (node-feedparser) is its own specification: its normalized
output contract is defined by its implementation plus its fixture suite.
This module plays the same role for the KG pipeline: it defines, in plain
single-threaded Python, exactly which (subj, pred, obj) triples a turn
yields and how surface forms canonicalize.  Tests compare the Spark
pipeline's distributed output against this oracle (P/R >= 0.95 gate,
BASELINE.json north_rule); the Spark path shares the same normalization
functions so per-turn text equality holds by construction.

Semantics mirrored from the reference (re-specified, never translated):

- first-wins on duplicate keys: duplicate (conv_id, turn_idx) rows keep the
  first by (ts, text) order — the analog of 'first guid/link/title wins'
  (lib/feedparser.js:538,555; test/bad.js:26-46).
- document-order emission: triples are ordered by (conv_id, turn_idx)
  (lib/feedparser.js:366; test/xmlbase.js:63-66).
- error containment: a turn that fails extraction is recorded and skipped,
  the conversation continues (lib/feedparser.js:140-154; test/bad.js:71-121).
- within-turn dedupe keep-first: duplicate (subj, pred, obj) within a turn
  collapse, first occurrence wins (enclosure dedupe-by-key,
  lib/feedparser.js:905-907).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from .constants import (
    ENTITY_RE,
    RELATION_PATTERNS,
    SCORE_MENTION,
    SCORE_PATTERN,
    SCORE_TOOL,
)
from .functions.normalize import (
    canonical_alias,
    char_shingles,
    entity_hash,
    jaccard,
    normalize_entity_key,
    normalize_text,
)

# Capitalized function words never treated as (single-word) entities.
STOPWORDS = frozenset(
    "The A An I It This That If In On At And Or But We You He She They Not "
    "Is Was Are Be To Of For With From By As So Do Did Done".split()
)

# Jaccard threshold for fuzzy alias merging (3-gram shingles).  Applies only
# to *mention* entities; pseudo-entities ('conv:', 'tool:') merge by exact
# key only — fuzzy-merging conv IDs would collapse distinct conversations.
FUZZY_JACCARD = 0.55


def _is_entity(surface: str) -> bool:
    return not (" " not in surface and surface in STOPWORDS)


def extract_turn(conv_id, turn_idx, role, text, tool, normalize=True):
    """Extract triples from one turn.  Returns (triples, normalized_text).

    Each triple is a dict {conv_id, turn_idx, subj, pred, obj, score}.
    Emission order: pattern triples (document order), tool triple, mention
    triples (first-occurrence order); exact (subj,pred,obj) dupes keep first.

    normalize=False is the reference's `normalize: false` option
    (/root/reference/lib/feedparser.js:77, test/api.js:51 — raw fields
    exposed, no canonical repair): the grammar runs over the raw trimmed
    text with no encoding repair / HTML strip / whitespace folding.
    """
    norm = normalize_text(text) if normalize else ("" if text is None else str(text)).strip()
    triples = []
    seen: set[tuple[str, str, str]] = set()

    def emit(subj: str, pred: str, obj: str, score: float) -> None:
        key = (subj, pred, obj)
        if key not in seen:
            seen.add(key)
            triples.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "score": score,
                }
            )

    if norm:
        matches = []
        for pred, pattern in RELATION_PATTERNS:
            for m in pattern.finditer(norm):
                matches.append((m.start(), pred, m.group(1), m.group(2)))
        matches.sort(key=lambda t: t[0])
        for _, pred, subj, obj in matches:
            if _is_entity(subj) and _is_entity(obj):
                emit(subj, pred, obj, SCORE_PATTERN)

    if tool is not None and str(tool).strip():
        emit(f"conv:{conv_id}", "invokes", f"tool:{str(tool).strip()}", SCORE_TOOL)

    if norm:
        for m in ENTITY_RE.finditer(norm):
            surface = m.group(0)
            if _is_entity(surface):
                emit(f"conv:{conv_id}", "mentions", surface, SCORE_MENTION)

    return triples, norm


def dedupe_turns(rows: list[dict]) -> list[dict]:
    """First-wins dedupe of duplicate (conv_id, turn_idx) keys.

    'First' is defined by (ts, text) ascending — a deterministic total order
    reproducible under any Spark partitioning (SURVEY.md A2; the reference's
    document order does not survive distribution, so the spec pins an
    explicit tiebreak).  None ts/text sort first.
    """
    def sort_key(r):
        ts = r.get("ts")
        return (
            r["conv_id"],
            r["turn_idx"],
            (ts is not None, ts),
            (r.get("text") is not None, r.get("text") or ""),
        )

    out = []
    for (_, _), grp in itertools.groupby(
        sorted(rows, key=sort_key), key=lambda r: (r["conv_id"], r["turn_idx"])
    ):
        out.append(next(grp))
    return out


@dataclass
class ExtractResult:
    triples: list[dict] = field(default_factory=list)
    normalized: dict = field(default_factory=dict)  # (conv_id, turn_idx) -> text
    n_turns: int = 0
    n_errors: int = 0
    n_empty: int = 0


def extract_corpus(rows: list[dict]) -> ExtractResult:
    """Run the spec extractor over a list of transcript-row dicts
    (conv_id, turn_idx, role, text, tool, ts), in (conv_id, turn_idx) order
    after first-wins dedupe."""
    res = ExtractResult()
    for row in dedupe_turns(rows):
        res.n_turns += 1
        try:
            triples, norm = extract_turn(
                row["conv_id"],
                row["turn_idx"],
                row.get("role"),
                row.get("text"),
                row.get("tool"),
            )
        except Exception:  # error containment: record, continue
            res.n_errors += 1
            continue
        res.normalized[(row["conv_id"], row["turn_idx"])] = norm
        if not triples:
            res.n_empty += 1
        res.triples.extend(triples)
    return res


# ---------------------------------------------------------------------------
# Canonicalization oracle (exact O(n^2) — fixture scale only).
# The Spark pipeline approximates this with MinHash-LSH blocking + iterative
# connected components (SURVEY.md A7/A8); this exact version defines the
# target grouping.
# ---------------------------------------------------------------------------


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic root: smaller entity_hash wins
            if entity_hash(ra) <= entity_hash(rb):
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def canonicalize_entities(triples: list[dict]):
    """Assign canonical entity IDs to every surface form in the triples.

    Steps (mirrored by the distributed version):
      1. surface -> normalized key (casefold, non-alnum collapse),
      2. static alias table lookup (reference ns canonicalization, J1),
      3. fuzzy merge: 3-gram Jaccard >= FUZZY_JACCARD between mention keys
         (pseudo-entities exact-only),
      4. union-find -> component; entity_id = min(entity_hash(key)) over the
         component; canonical_name = most-mentioned surface form
         (count desc, name asc).

    Returns (entity_id_by_surface, vertices) where vertices is a list of
    {entity_id, canonical_name, aliases, n_mentions}.
    """
    counts: dict[str, int] = {}
    for t in triples:
        for s in (t["subj"], t["obj"]):
            counts[s] = counts.get(s, 0) + 1

    key_of = {
        s: canonical_alias(normalize_entity_key(s)) or normalize_entity_key(s) or s
        for s in counts
    }
    uf = _UnionFind()
    for s, k in key_of.items():
        uf.union(s, f"key::{k}")  # exact-key merge via key sentinel node

    mention_keys = sorted(
        {k for s, k in key_of.items() if not s.startswith(("conv:", "tool:"))}
    )
    shingle = {k: char_shingles(k) for k in mention_keys}
    for i, a in enumerate(mention_keys):
        for b in mention_keys[i + 1 :]:
            if jaccard(shingle[a], shingle[b]) >= FUZZY_JACCARD:
                uf.union(f"key::{a}", f"key::{b}")

    comp_members: dict[str, list[str]] = {}
    for s in counts:
        comp_members.setdefault(uf.find(s), []).append(s)

    entity_id_by_surface: dict[str, int] = {}
    vertices = []
    for members in comp_members.values():
        eid = min(entity_hash(key_of[m]) for m in members)
        canonical = min(members, key=lambda m: (-counts[m], m))
        for m in members:
            entity_id_by_surface[m] = eid
        vertices.append(
            {
                "entity_id": eid,
                "canonical_name": canonical,
                "aliases": sorted(set(members)),
                "n_mentions": sum(counts[m] for m in members),
            }
        )
    return entity_id_by_surface, vertices


def build_edges(triples: list[dict], entity_id_by_surface: dict[str, int]):
    """Aggregate canonical edges: (src_id, pred, dst_id) with weight =
    sum(score) over supporting triples (SURVEY.md A1/J2 keyed merge)."""
    weights: dict[tuple[int, str, int], float] = {}
    for t in triples:
        k = (
            entity_id_by_surface[t["subj"]],
            t["pred"],
            entity_id_by_surface[t["obj"]],
        )
        weights[k] = weights.get(k, 0.0) + t["score"]
    return [
        {"src_id": s, "pred": p, "dst_id": d, "weight": w}
        for (s, p, d), w in sorted(weights.items())
    ]

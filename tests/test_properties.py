"""Property-based invariants (hypothesis) for the pure-Python spec layer —
the reference's table-driven test/utils.js style, generalized to random
inputs.  No SparkSession needed: these pin the semantics the distributed
path inherits."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from node_feedparser_spark.functions.normalize import (
    char_shingles,
    entity_hash,
    jaccard,
    normalize_entity_key,
    normalize_text,
    strip_html,
)
from node_feedparser_spark.reference_extract import dedupe_turns, extract_turn

text_st = st.text(max_size=300)


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_normalize_text_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.text(alphabet=st.characters(blacklist_characters="<"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_strip_html_no_markup_is_identity(s):
    assert strip_html(s) == s


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_strip_html_never_longer(s):
    assert len(strip_html(s)) <= len(s)


@given(st.text(alphabet=st.characters(blacklist_characters="<"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_unknown_tags_survive(s):
    # '<foo>' is not whitelisted HTML: must pass through verbatim.  The
    # payload must not itself contain '<': a partial WHITELISTED tag like
    # '<I' scans to the next unquoted '>' and swallows the wrapper's close
    # tag — reference readMarkupAt semantics, pinned below.
    wrapped = f"<foo>{s}</foo>"
    assert strip_html(wrapped) == wrapped


def test_unterminated_whitelisted_tag_consumes_to_gt():
    # hypothesis-found edge (s='<I'): the markup scan starts at '<I', the
    # tag name 'i' IS whitelisted, and the scan runs to the next unquoted
    # '>' (the one closing '</foo') — so the whole span strips, exactly as
    # the reference's readMarkupAt + stripHtml would
    # (/root/reference/lib/utils.js:227-274,367-382).
    assert strip_html("<foo><I</foo>") == "<foo>"
    # a non-whitelisted partial tag survives untouched
    assert strip_html("<foo>a<Ib</foo>") == "<foo>a<Ib</foo>"


@given(text_st, text_st)
@settings(max_examples=200, deadline=None)
def test_jaccard_properties(a, b):
    ka, kb = normalize_entity_key(a), normalize_entity_key(b)
    sa, sb = char_shingles(ka), char_shingles(kb)
    j = jaccard(sa, sb)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(sb, sa)
    assert jaccard(sa, sa) == 1.0


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_entity_key_idempotent_and_hash_stable(s):
    k = normalize_entity_key(s)
    assert normalize_entity_key(k) == k
    assert entity_hash(k) == entity_hash(k)
    assert -(2**63) <= entity_hash(k) < 2**63


@given(
    st.text(max_size=120),
    st.one_of(st.none(), st.text(max_size=20)),
)
@settings(max_examples=200, deadline=None)
def test_extract_turn_deterministic_and_contained(text, tool):
    t1, n1 = extract_turn("c", 0, "user", text, tool)
    t2, n2 = extract_turn("c", 0, "user", text, tool)
    assert t1 == t2 and n1 == n2
    keys = [(t["subj"], t["pred"], t["obj"]) for t in t1]
    assert len(keys) == len(set(keys))  # within-turn dedupe holds


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_dedupe_order_invariant(seed):
    rng = random.Random(seed)
    rows = []
    for i in range(30):
        rows.append(
            {
                "conv_id": f"c{rng.randrange(3)}",
                "turn_idx": rng.randrange(5),
                "ts": rng.choice([None, rng.randrange(100)]),
                "text": rng.choice([None, f"t{rng.randrange(4)}"]),
            }
        )
    a = dedupe_turns(list(rows))
    shuffled = list(rows)
    rng.shuffle(shuffled)
    b = dedupe_turns(shuffled)
    assert a == b  # first-wins is a function of the data, not arrival order

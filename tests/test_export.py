"""to_ntriples: spec escaping of every ECHAR, IRI percent-encoding
reversibility, NULL-object contract, W3C line-shape validation, and a
Python unescape roundtrip on gnarly strings."""

import re

from node_feedparser_spark.operators.export import to_ntriples

NT_LINE = re.compile(
    r'^<urn:kg:e:(?P<s>[^<>"{}|^`\\\s]*)> '
    r'<urn:kg:p:(?P<p>[^<>"{}|^`\\\s]*)> '
    r'"(?P<o>(?:[^"\\]|\\[\\"nrt])*)" \.$'
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _lines(spark, rows):
    return [r.line for r in to_ntriples(_df(spark, rows)).collect()]


def _unescape_literal(s):
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\":
            out.append({"\\": "\\", '"': '"', "n": "\n", "r": "\r",
                        "t": "\t"}[s[i + 1]])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _unescape_iri(s):
    for enc, raw in [("%5C", "\\"), ("%20", " "), ("%3C", "<"),
                     ("%3E", ">"), ("%22", '"'), ("%7B", "{"),
                     ("%7D", "}"), ("%7C", "|"), ("%5E", "^"),
                     ("%60", "`")]:
        s = s.replace(enc, raw)
    return s.replace("%25", "%")


def test_plain_triple(spark):
    assert _lines(spark, [("e1", "knows", "v")]) == [
        '<urn:kg:e:e1> <urn:kg:p:knows> "v" .'
    ]


def test_every_echar_escapes(spark):
    obj = 'a\\b"c\nd\re\tf'
    [line] = _lines(spark, [("e", "p", obj)])
    assert line == '<urn:kg:e:e> <urn:kg:p:p> "a\\\\b\\"c\\nd\\re\\tf" .'
    m = NT_LINE.match(line)
    assert m and _unescape_literal(m.group("o")) == obj


def test_iri_component_encoding_roundtrip(spark):
    subj = 'we ird<>"{}|^`\\%name'
    [line] = _lines(spark, [(subj, "p", "o")])
    m = NT_LINE.match(line)
    assert m, line
    assert _unescape_iri(m.group("s")) == subj


def test_null_object_is_empty_literal(spark):
    assert _lines(spark, [("e", "p", None)]) == [
        '<urn:kg:e:e> <urn:kg:p:p> "" .'
    ]


def test_roundtrip_random_corpus(spark):
    rows = [
        (f"e{i}", "says", f'line{i}\\ "quote"\n\ttab % {i}')
        for i in range(25)
    ]
    lines = _lines(spark, rows)
    parsed = set()
    for line in lines:
        m = NT_LINE.match(line)
        assert m, line
        parsed.add(
            (
                _unescape_iri(m.group("s")),
                _unescape_iri(m.group("p")),
                _unescape_literal(m.group("o")),
            )
        )
    assert parsed == set(rows)

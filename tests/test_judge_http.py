"""Round-5 proof of the pluggable judge-client seam beyond the md5 fake:
judge_scores driven by a REAL batched HTTP client against a local
endpoint — parity with the offline fake while the server is up, and A6
error containment (error rows, job completes, full row accounting) when
the endpoint dies mid-run or hangs past the client timeout.

The operator contract under test (operators/judge.py): one HTTP call per
Arrow-batch x criterion (never per row), and a batched client fails
batched — the whole batch's rows for that criterion carry the error.
"""

import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from node_feedparser_spark.operators.judge import fake_judge, judge_scores

_TWO_POW_60 = float(1 << 60)


def _server_score(text: str, criterion: str) -> float:
    # the endpoint's own scoring — same discipline as the offline fake so
    # the HTTP path is value-comparable to it
    h = int(hashlib.md5(f"{criterion}:{text}".encode()).hexdigest()[:15], 16)
    return h / _TWO_POW_60


class _JudgeHandler(BaseHTTPRequestHandler):
    die_after: int | None = None  # class-level knobs set per fixture
    slow_criterion: str | None = None
    count = 0
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802 — http.server API
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if body["criterion"] == self.slow_criterion:
            time.sleep(3)
        scores = [_server_score(t, body["criterion"]) for t in body["texts"]]
        payload = json.dumps({"scores": scores}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)
        with _JudgeHandler.lock:
            _JudgeHandler.count += 1
            if self.die_after is not None and _JudgeHandler.count >= self.die_after:
                # kill the endpoint mid-run: close the listening socket so
                # every later connect is refused, then shut the loop down
                self.server.socket.close()
                threading.Thread(target=self.server.shutdown, daemon=True).start()

    def log_message(self, *a):  # silence request logging
        pass


def _start_server(die_after=None, slow_criterion=None):
    _JudgeHandler.die_after = die_after
    _JudgeHandler.slow_criterion = slow_criterion
    _JudgeHandler.count = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _JudgeHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/score"


def _http_judge(url: str, timeout: float = 5.0):
    """A real batched HTTP client with the judge_fn signature — one POST
    per (batch, criterion), shipped to the workers by closure."""

    def judge(texts, criterion):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            url,
            data=_json.dumps({"texts": list(texts), "criterion": criterion}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return _json.loads(r.read())["scores"]

    return judge


@pytest.fixture()
def docs(spark):
    rows = [(i, f"document body {i}") for i in range(40)] + [(40, None)]
    # ONE partition -> the worker issues its HTTP calls sequentially
    # (per criterion), making the mid-run death deterministic
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)


def _by_key(df):
    return {(r.doc_id, r.criterion): (r.score, r.error) for r in df.collect()}


def test_http_client_matches_offline_fake(spark, docs):
    srv, url = _start_server()
    try:
        got = _by_key(
            judge_scores(docs, criteria=("help", "fact"), judge_fn=_http_judge(url))
        )
        want = _by_key(judge_scores(docs, criteria=("help", "fact")))
        assert got == want  # same scores, same null-text error rows
        assert got[(40, "help")] == (None, "null text")
    finally:
        srv.shutdown()


def test_endpoint_death_mid_run_is_contained(spark, docs):
    # 1 batch x 4 criteria = 4 sequential calls; the endpoint dies after
    # serving 2 -> criteria 3 and 4 fail batched, as error rows
    srv, url = _start_server(die_after=2)
    out = judge_scores(
        docs, criteria=("c1", "c2", "c3", "c4"), judge_fn=_http_judge(url)
    )
    rows = _by_key(out)
    assert len(rows) == 41 * 4  # full row accounting: the job completed
    scored = {c for (_, c), (s, e) in rows.items() if s is not None}
    errored = {c for (_, c), (s, e) in rows.items() if e and e != "null text"}
    assert scored == {"c1", "c2"}
    assert errored == {"c3", "c4"}
    for (d, c), (s, e) in rows.items():
        if c in errored and d != 40:
            assert s is None and e.startswith("judge error:")
    fake = _by_key(judge_scores(docs, criteria=("c1", "c2")))
    for (d, c), (s, e) in rows.items():
        if c in scored:  # pre-death scores are real scores, not junk
            assert (s, e) == fake[(d, c)]


def test_endpoint_hang_past_timeout_is_contained(spark, docs):
    srv, url = _start_server(slow_criterion="slow")
    try:
        rows = _by_key(
            judge_scores(
                docs,
                criteria=("fast", "slow"),
                judge_fn=_http_judge(url, timeout=0.5),
            )
        )
        assert len(rows) == 41 * 2
        assert rows[(0, "fast")][0] is not None
        s, e = rows[(0, "slow")]
        assert s is None and e.startswith("judge error:") and "timed out" in e
    finally:
        srv.shutdown()

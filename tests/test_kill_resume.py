"""End-to-end crash-resume: SIGKILL the whole pipeline process group
(driver + JVM + Python workers) mid-run, rerun to completion, and assert
the final graph equals a clean one-shot build.

This is the integration twin of tests/test_crash_recovery.py's
fault-injected rename windows: instead of choosing a crash point, the kill
lands wherever the wall clock says — extraction, the triples write, the
aggregate writes, or the metrics commit — and the invariant is that the
RERUN converges to byte-identical triples and identical vertex/edge
aggregates no matter where the first attempt died (north-rule resumability:
'resumable from checkpoint with per-partition lineage + metrics').
"""

import os
import signal
import subprocess
import sys
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
from node_feedparser_spark.session import get_spark
from node_feedparser_spark.plans.pipeline import build_kg
spark = get_spark(app="kill-child", master="local[4]", shuffle_partitions=8)
s = build_kg(spark, sys.argv[1], sys.argv[2], n_buckets=4)
print("CHILD_DONE", s["n_triples"], flush=True)
"""


def _spawn(corpus: str, out: str) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=_REPO)
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD, corpus, out],
        cwd=_REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: killpg nukes the JVM too
    )


def _run_to_done(corpus: str, out: str) -> float:
    t0 = time.monotonic()
    p = _spawn(corpus, out)
    stdout, _ = p.communicate(timeout=600)
    assert p.returncode == 0 and "CHILD_DONE" in stdout, stdout
    return time.monotonic() - t0


def _kill_after(corpus: str, out: str, delay_s: float) -> None:
    p = _spawn(corpus, out)
    time.sleep(delay_s)
    if p.poll() is None:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait(timeout=60)


def _table(spark, path, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in spark.read.parquet(path).collect()
    )


def test_sigkill_midrun_resume_converges(spark, tmp_path):
    from node_feedparser_spark.datagen import write_transcripts

    corpus = str(tmp_path / "transcripts.parquet")
    write_transcripts(corpus, seed=42, scale=0.4)

    # clean one-shot reference (also measures the wall for kill offsets)
    ref_out = str(tmp_path / "kg_ref")
    wall = _run_to_done(corpus, ref_out)

    ref_triples = _table(
        spark,
        os.path.join(ref_out, "triples"),
        ["conv_id", "turn_idx", "subj", "pred", "obj", "subj_id", "obj_id"],
    )
    ref_vertices = _table(
        spark,
        os.path.join(ref_out, "vertices"),
        ["entity_id", "canonical_name", "n_mentions"],
    )
    ref_edges = _table(
        spark,
        os.path.join(ref_out, "edges"),
        ["src_id", "pred", "dst_id", "weight"],
    )
    assert ref_triples and ref_vertices and ref_edges

    # two kill points: one early (extraction / first writes), one late
    # (aggregate writes / metrics commit window)
    for frac in (0.45, 0.85):
        out = str(tmp_path / f"kg_kill_{int(frac * 100)}")
        _kill_after(corpus, out, frac * wall)
        # rerun to completion — resume must converge, not refuse or duplicate
        _run_to_done(corpus, out)
        assert (
            _table(
                spark,
                os.path.join(out, "triples"),
                [
                    "conv_id", "turn_idx", "subj", "pred", "obj",
                    "subj_id", "obj_id",
                ],
            )
            == ref_triples
        ), f"triples diverged after kill at {frac:.0%}"
        assert (
            _table(
                spark,
                os.path.join(out, "vertices"),
                ["entity_id", "canonical_name", "n_mentions"],
            )
            == ref_vertices
        ), f"vertices diverged after kill at {frac:.0%}"
        assert (
            _table(
                spark,
                os.path.join(out, "edges"),
                ["src_id", "pred", "dst_id", "weight"],
            )
            == ref_edges
        ), f"edges diverged after kill at {frac:.0%}"


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))

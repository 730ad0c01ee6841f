"""No-change bench-drift gate (round-6 VERDICT #8, instrumented round 9).

Compares two bench artifacts (``BENCH_detail.json`` shape: full per-query
steady medians, or a ``BENCH_r{N}.json`` driver record whose ``parsed``
block holds the 20 slowest) and FAILS when identical (or
intended-identical) code drifted more than the measured noise floor:

    total drift   > 5%                     -> fail
    per-query     > 15% AND > 0.3s abs     -> fail (floor masks sub-second
                                              JIT jitter — round-5 noise
                                              study: ~3/4 of queries stay
                                              within 15%, run-level JIT/heap
                                              mode shifts small queries 1.5x)

Machine-load triage (rounds 6-8): driver reruns on a loaded machine drift
+10-20% ONE-DIRECTIONALLY (every exceeder slower, none faster). Artifacts
written by ``bench.py`` carry ``loadavg_start``/``loadavg_end``; when the
drift is one-directional AND the new run's load exceeds the old's, this
gate says so explicitly instead of each round re-litigating it by hand.
``bench.py`` itself imports :func:`gate_queries` to embed the
committed-vs-run verdict INTO the artifact it writes (``drift_gate`` key).

Usage:
    python scripts/bench_drift.py OLD.json NEW.json [--max-total PCT]
        [--max-query PCT] [--abs-floor SEC]

Exit 0 = within tolerance, 1 = drift, 2 = unusable inputs.
Only queries present in BOTH artifacts are compared (the registry grows
every round); the total is recomputed over the common set so growth
doesn't read as drift.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_artifact(path: str) -> dict:
    """Full artifact dict; driver records unwrap their ``parsed`` block."""
    with open(path) as fh:
        d = json.load(fh)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def load_queries(path: str) -> dict[str, float]:
    d = load_artifact(path)
    qs = d.get("queries")
    if not isinstance(qs, dict) or not qs:
        raise ValueError(f"{path}: no per-query medians found")
    return {k: float(v) for k, v in qs.items()}


def gate_queries(
    old: dict[str, float],
    new: dict[str, float],
    max_total: float = 5.0,
    max_query: float = 15.0,
    abs_floor: float = 0.3,
) -> dict:
    """Pure drift-gate verdict over two per-query median maps.

    Returns a JSON-serializable dict (the shape ``bench.py`` embeds as
    ``drift_gate``): common-set totals, the exceeder list, slower/faster
    direction counts, a ``one_directional`` flag, and ``pass``.
    """
    common = sorted(set(old) & set(new))
    if not common:
        return {"common": 0, "pass": None, "verdict": "no common queries"}
    to = round(sum(old[q] for q in common), 4)
    tn = round(sum(new[q] for q in common), 4)
    total_pct = round(100.0 * (tn - to) / to, 2) if to else 0.0
    exceeders = []
    for q in common:
        o, n = old[q], new[q]
        if o <= 0:
            continue
        pct = 100.0 * (n - o) / o
        if abs(pct) > max_query and abs(n - o) > abs_floor:
            exceeders.append(
                {"query": q, "old": o, "new": n, "pct": round(pct, 1)}
            )
    exceeders.sort(key=lambda e: -abs(e["pct"]))
    slower = sum(1 for e in exceeders if e["pct"] > 0)
    faster = len(exceeders) - slower
    ok = abs(total_pct) <= max_total and not exceeders
    # >=90% dominance, not strict zero-in-one-direction: real loaded-machine
    # runs still show 1-2 noise-flipped fasters among dozens of slowers
    # (round-8 driver run: 36 slower / 2 faster)
    dom = max(slower, faster) / len(exceeders) if exceeders else 0.0
    return {
        "common": len(common),
        "total_old": to,
        "total_new": tn,
        "total_pct": total_pct,
        "exceeders": exceeders,
        "slower": slower,
        "faster": faster,
        "one_directional": bool(exceeders) and dom >= 0.9,
        "pass": ok,
        "verdict": "pass" if ok else "drift",
    }


def _load_note(g: dict, old_art: dict, new_art: dict) -> str | None:
    """The machine-load signature, stated when the evidence supports it:
    one-directional slowdowns + the new run's 1-min loadavg above the
    old's. Informational — the gate result is unchanged."""
    lo = old_art.get("loadavg_start")
    ln = new_art.get("loadavg_start")
    if not (g.get("one_directional") and g.get("slower", 0) > 0 and lo and ln):
        return None
    if ln[0] <= lo[0]:
        return None
    return (
        f"machine-load signature: {g['slower']} slower / {g['faster']} "
        f"faster with loadavg {ln[0]:.2f} (new) vs {lo[0]:.2f} (old) — "
        "consistent with a loaded machine, not a code regression"
    )


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-total", type=float, default=5.0, help="total drift %%")
    ap.add_argument("--max-query", type=float, default=15.0, help="per-query drift %%")
    ap.add_argument(
        "--abs-floor", type=float, default=0.3,
        help="ignore per-query drift below this many seconds absolute",
    )
    args = ap.parse_args(argv)
    try:
        old_art, new_art = load_artifact(args.old), load_artifact(args.new)
        old = {k: float(v) for k, v in (old_art.get("queries") or {}).items()}
        new = {k: float(v) for k, v in (new_art.get("queries") or {}).items()}
        if not old or not new:
            raise ValueError("no per-query medians found")
    except (OSError, ValueError, json.JSONDecodeError) as exc:
        print(f"bench_drift: {exc}", file=sys.stderr)
        return 2
    g = gate_queries(
        old, new,
        max_total=args.max_total,
        max_query=args.max_query,
        abs_floor=args.abs_floor,
    )
    if g["common"] == 0:
        print("bench_drift: no common queries", file=sys.stderr)
        return 2
    print(
        f"common={g['common']} total {g['total_old']:.1f}s -> "
        f"{g['total_new']:.1f}s ({g['total_pct']:+.1f}%, gate ±{args.max_total}%)"
    )
    for la, art in (("old", old_art), ("new", new_art)):
        if art.get("loadavg_start"):
            print(
                f"  loadavg[{la}] start={art['loadavg_start']} "
                f"end={art.get('loadavg_end')}"
            )
    for e in g["exceeders"]:
        print(
            f"  DRIFT {e['query']}: {e['old']:.2f}s -> {e['new']:.2f}s "
            f"({e['pct']:+.0f}%)"
        )
    note = _load_note(g, old_art, new_art)
    if note:
        print(f"  NOTE {note}")
    print("PASS" if g["pass"] else "FAIL")
    return 0 if g["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

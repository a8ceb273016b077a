#!/usr/bin/env python3
"""Cross-round bench comparison in the MIN domain, era-normalized.

The methodology SCALE.md's host-era note prescribes (and every round
had re-derived by hand until r17):

  * This host's ambient load shifts WHOLE SWEEPS by a uniform factor
    (measured ×1.1-1.14 between "eras") that the pure-CPU canary is
    blind to — so raw cross-round per-query deltas are meaningless.
  * Two same-era sweeps agree per-query to median ratio ~1.002, so the
    MEDIAN PER-QUERY RATIO over shared lines IS the era factor; after
    dividing it out, genuine per-query movement survives and uniform
    host drift cancels.
  * Sweep MEDIANS of an individual query are bimodal under ambient
    (r16's a3d read median 2.6 s with min 1.77 = its idle anchor): the
    comparison domain is the per-query MIN across each artifact's
    passes (`queries_min`), falling back to `queries` for artifacts
    that predate the min field.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--flag 1.35]

Each side may be a comma-separated list of artifacts from the same
code state (e.g. twin idle anchors, or idle + driver sweep): the tool
takes the per-query MIN across the listed files, which is exactly how
the r16 verdict collapsed its two sweeps before judging "fleet-wide
flat" — one artifact's min can still carry a per-line ambient spike
that a second sweep's min removes.

Prints a human table to stderr and ONE JSON object to stdout:
  {"era_factor": …, "shared": N, "flagged": [{name, old, new, ratio,
    residual, median_residual}…], "median_only_suspects": [...],
    "failed_old": [...], "failed_new": [...], "one_sided": [...]}

A query that FAILED in a sweep (Bench's -1.0 sentinel) is excluded
from the ratio/era math and surfaced in failed_old/failed_new; a query
measured on only one side appears in one_sided — a new hard failure is
loud, never silently "flat".

`flagged` = era-normalized residual > --flag (default 1.35) in the min
domain — real movement to adjudicate. `median_only_suspects` = lines
whose MEDIAN residual exceeds the flag while their MIN residual does
not — the bimodal-statistic signature, listed so nobody chases them as
regressions.
"""
import argparse
import json
import statistics
import sys


def load(spec):
    """Per-query (min, median, failed) across a comma-separated artifact
    list — min of mins, median map from the FIRST artifact (medians
    across sweeps aren't poolable; the first file is the canonical
    anchor). Bench writes -1.0 sentinels for queries that FAILED in a
    sweep; pooling min(valid, -1) would mask a sibling's real reading
    and a negative ratio would silently skew the era median, so
    sentinels are excluded from both maps and collected into `failed`
    (a query is failed only if NO listed artifact has a valid time)."""
    mins, meds, failed = {}, {}, set()
    for path in spec.split(","):
        with open(path) as f:
            d = json.load(f)
        m = d.get("queries_min") or d.get("queries") or {}
        for q, v in m.items():
            if v < 0:
                failed.add(q)
            else:
                mins[q] = min(mins.get(q, float("inf")), v)
        if not meds:
            meds = {q: v for q, v in (d.get("queries") or {}).items()
                    if v >= 0}
    return mins, meds, failed - set(mins)


def main():
    ap = argparse.ArgumentParser(
        description="Cross-round bench comparison in the MIN domain, "
                    "era-normalized (see module docstring).")
    ap.add_argument("old", help="old artifact(s), comma-separated")
    ap.add_argument("new", help="new artifact(s), comma-separated")
    ap.add_argument("--flag", type=float, default=1.35,
                    help="era-normalized residual threshold (default 1.35)")
    ns = ap.parse_args()
    old_path, new_path, flag = ns.old, ns.new, ns.flag
    old_min, old_med, old_failed = load(old_path)
    new_min, new_med, new_failed = load(new_path)

    shared = sorted(set(old_min) & set(new_min))
    if not shared:
        sys.exit("no shared query lines between the two artifacts")
    ratios = {q: new_min[q] / old_min[q] for q in shared
              if old_min[q] > 0 and new_min[q] > 0}
    if not ratios:
        # every shared line filtered by the >0 guards (e.g. an artifact
        # of all-zero timings) — a diagnostic beats a StatisticsError
        # traceback out of statistics.median
        sys.exit("no positive shared timings to normalize (all shared "
                 "lines have a non-positive min on at least one side)")
    era = statistics.median(ratios.values())
    # a query valid on one side only (typically: failed in the new
    # artifact) is invisible to the ratio table — a NEW hard failure
    # must never read as "fleet-wide flat", so report them explicitly
    one_sided = sorted(set(old_min) ^ set(new_min))

    flagged, median_only = [], []
    for q in shared:
        if q not in ratios:
            continue
        resid = ratios[q] / era
        med_resid = None
        if q in old_med and q in new_med and old_med[q] > 0:
            med_resid = (new_med[q] / old_med[q]) / era
        row = {
            "name": q,
            "old_min": round(old_min[q], 3),
            "new_min": round(new_min[q], 3),
            "ratio": round(ratios[q], 3),
            "residual": round(resid, 3),
            "median_residual":
                round(med_resid, 3) if med_resid is not None else None,
        }
        if resid > flag:
            flagged.append(row)
        elif med_resid is not None and med_resid > flag:
            median_only.append(row)

    flagged.sort(key=lambda r: -r["residual"])
    median_only.sort(key=lambda r: -(r["median_residual"] or 0))

    print(f"[bench_compare] {old_path} -> {new_path}", file=sys.stderr)
    print(f"[bench_compare] shared lines: {len(shared)}  "
          f"era factor (median min-ratio): {era:.3f}", file=sys.stderr)
    if flagged:
        print(f"[bench_compare] REAL movement (min-domain residual > "
              f"{flag}):", file=sys.stderr)
        for r in flagged:
            print(f"  {r['name']:36s} {r['old_min']:7.3f} -> "
                  f"{r['new_min']:7.3f}  residual {r['residual']:.2f}",
                  file=sys.stderr)
    else:
        print(f"[bench_compare] no min-domain residual exceeds {flag} — "
              f"fleet-wide flat after era normalization", file=sys.stderr)
    for q in sorted(new_failed):
        print(f"  FAILED in new artifact(s): {q}", file=sys.stderr)
    for q in sorted(old_failed):
        print(f"  (failed in old artifact(s): {q})", file=sys.stderr)
    for q in one_sided:
        print(f"  one-sided (present on one side only): {q}",
              file=sys.stderr)
    for r in median_only:
        print(f"  (median-only, likely bimodal ambient — NOT a "
              f"regression) {r['name']}: median residual "
              f"{r['median_residual']:.2f}, min residual "
              f"{r['residual']:.2f}", file=sys.stderr)

    json.dump({
        "old": old_path, "new": new_path, "shared": len(shared),
        "era_factor": round(era, 4), "flag_threshold": flag,
        "flagged": flagged, "median_only_suspects": median_only,
        "failed_old": sorted(old_failed), "failed_new": sorted(new_failed),
        "one_sided": one_sided,
    }, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()

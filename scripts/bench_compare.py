#!/usr/bin/env python3
"""Calibration-normalized bench comparison.

Cross-epoch BENCH records are not directly comparable: the shared
host's effective speed drifts between rounds (round 17 measured the
same code 1.3x slower than round 16's record on the same data). Each
BENCH record since r17 carries `calib_sec` — a fixed single-threaded
JVM probe timed at record start — so two records can be read on one
scale: normalized_t = t / (calib_new / calib_old) projects the NEW
record onto the OLD record's host epoch.

Usage: bench_compare.py OLD.json NEW.json [threshold]
Prints per-query ratios (normalized when both records carry
calib_sec, raw otherwise) and flags regressions above `threshold`
(default 1.5x). Exit code 1 if any flagged regression.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    calib_old = old.get("calib_sec")
    calib_new = new.get("calib_sec")
    if calib_old and calib_new:
        ratio = calib_new / calib_old
        print(f"calib: old={calib_old} new={calib_new} "
              f"host-epoch ratio={ratio:.3f} (normalizing)")
    else:
        ratio = 1.0
        print("calib: missing in one record — RAW comparison "
              "(cross-epoch drift not removed)")

    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))

    rows = []
    for q in common:
        t_old, t_new = qo[q], qn[q]
        if not isinstance(t_old, (int, float)) or not isinstance(t_new, (int, float)):
            continue
        norm = t_new / ratio
        rows.append((norm / t_old if t_old > 0 else float("inf"),
                     q, t_old, t_new, norm))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] > bar]
    print(f"\n{len(common)} common queries; "
          f"old-only: {only_old or '—'}; new-only: {only_new or '—'}")
    tot_old = sum(r[2] for r in rows)
    tot_norm = sum(r[4] for r in rows)
    if not rows or tot_old <= 0:
        print("no comparable numeric queries in common — nothing to rate")
        return 0
    med = sorted(r[0] for r in rows)[len(rows) // 2]
    print(f"common-set total: {tot_old:.1f}s old vs {tot_norm:.1f}s "
          f"new-normalized ({tot_norm / tot_old:.2f}x); "
          f"median per-query ratio {med:.2f}")

    print(f"\n{'ratio':>6}  {'old_s':>8}  {'new_s':>8}  {'norm_s':>8}  query")
    for r, q, t_old, t_new, norm in rows[:15]:
        mark = " <-- REGRESSION" if r > bar else ""
        print(f"{r:6.2f}  {t_old:8.2f}  {t_new:8.2f}  {norm:8.2f}  {q}{mark}")

    if flagged:
        print(f"\n{len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} "
              f"above the {bar}x bar")
        return 1
    print(f"\nno regression above the {bar}x bar")
    return 0


if __name__ == "__main__":
    sys.exit(main())

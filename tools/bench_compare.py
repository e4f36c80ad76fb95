#!/usr/bin/env python3
"""Compare two bench_out.json files with calibration normalization.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Host contention on the shared bench box exceeds round-over-round code
deltas (identical code has varied +/-20% same-day and 1.37x uniformly
across rounds), so raw per-query times do not compare across runs. Each
bench emits `calibration_s` (q01 timed min-of-3 before the query loop);
dividing every per-query time by its own run's calibration cancels the
host factor. This script prints, for queries present in both files, the
NORMALIZED ratio new/old and flags |log-ratio| above the threshold
(default 1.3x) — those are signal; everything else is host noise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    calib = d.get("calibration_s")
    qs = d.get("queries", {})
    return d, calib, qs


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    do, co, qo = load(old_path)
    dn, cn, qn = load(new_path)
    print(f"old: total={do.get('value', 0):.1f}s n={do.get('n_queries')} "
          f"calib={co if co is not None else 'n/a'}")
    print(f"new: total={dn.get('value', 0):.1f}s n={dn.get('n_queries')} "
          f"calib={cn if cn is not None else 'n/a'}")
    if not co or not cn:
        print("WARNING: a file lacks calibration_s (pre-round-10 bench) — "
              "falling back to RAW ratios; treat flags as suggestive only")
        co = co or 1.0
        cn = cn or 1.0
    shared = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    flagged = []
    for q in shared:
        o, n = qo[q] / co, qn[q] / cn
        if o <= 0 or n <= 0:
            continue
        r = n / o
        if r > threshold or r < 1.0 / threshold:
            flagged.append((r, q, qo[q], qn[q]))
    flagged.sort(reverse=True)
    print(f"\nshared={len(shared)} added={len(added)} removed={len(removed)} "
          f"flagged(normalized ratio beyond {threshold}x)={len(flagged)}")
    # a sub-second calibration query carries its own noise: when most of
    # the shared surface flags in ONE direction, that is the calibration
    # (or a host-wide shift) over-correcting, not per-query signal —
    # compare the median-normalized view instead
    if flagged and len(flagged) > len(shared) // 3:
        same_dir = all(r > 1 for r, *_ in flagged) or \
            all(r < 1 for r, *_ in flagged)
        if same_dir:
            med_o = sorted(qo[q] for q in shared)[len(shared) // 2]
            med_n = sorted(qn[q] for q in shared)[len(shared) // 2]
            print("NOTE: uniform one-directional shift across most queries "
                  "— calibration noise or host-wide effect, NOT per-query "
                  f"signal. Median-normalized check: old_med={med_o:.3f}s "
                  f"new_med={med_n:.3f}s (x{med_n / med_o:.2f}); re-read "
                  "the flags against that factor.")
    for r, q, o, n in flagged:
        direction = "SLOWER" if r > 1 else "faster"
        print(f"  {q:40s} {o:7.2f}s -> {n:7.2f}s  norm x{r:５.2f} {direction}"
              .replace("５", ""))
    if added:
        print("added:", ", ".join(f"{q} ({qn[q]:.2f}s)" for q in added))
    if removed:
        print("removed:", ", ".join(removed))
    # normalized shared-sum comparison: the honest round-over-round number
    so = sum(qo[q] for q in shared) / co
    sn = sum(qn[q] for q in shared) / cn
    print(f"\nshared-query normalized sums: old={so:.1f} new={sn:.1f} "
          f"(x{sn / so:.3f})" if so else "")


if __name__ == "__main__":
    main()

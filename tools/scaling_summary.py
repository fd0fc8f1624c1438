"""Summarize round scaling JSONs (bench.py --scaling output) into the
BASELINE.md table: per-level paired dist/control medians, the
control-normalized headline efficiency, raw efficiencies, and the
cross-run reproducibility spread for the independent repeat runs.

Usage: python tools/scaling_summary.py bench_results/scaling_*_r4*.json
"""

import json
import sys


def main() -> None:
    heads = []
    for path in sys.argv[1:]:
        with open(path) as f:
            d = json.load(f)
        print(f"== {path}")
        print(f"   metric: {d.get('metric')}")
        print(f"   headline paired control-normalized efficiency: "
              f"{d.get('paired_control_normalized_efficiency')}")
        print(f"   raw dist eff (median/best): {d.get('raw_dist_efficiency_median')} / "
              f"{d.get('raw_dist_efficiency_best')}   control eff best: "
              f"{d.get('control_efficiency_best')}")
        for r in d.get("runs", []):
            print(f"   n={r['num_cpus']:>2} attempts={r.get('attempts')} "
                  f"paired={r.get('paired_dist_over_control')} "
                  f"median={r.get('paired_median')} "
                  f"dist_rates={r.get('dist_rates')}")
        if "crawl_adaptive_scaling_efficiency" in d:
            print(f"   adaptive crawl eff: {d['crawl_adaptive_scaling_efficiency']} "
                  f"extract eff: {d['extract_scaling_efficiency']}")
        heads.append((path, d.get("paired_control_normalized_efficiency")))
    if len(heads) >= 2:
        vals = [h for _, h in heads if isinstance(h, (int, float))]
        if len(vals) >= 2:
            lo, hi = min(vals), max(vals)
            mid = (lo + hi) / 2
            print(f"\nreproducibility: headlines {vals} -> spread "
                  f"{(hi - lo):.3f} ({(hi - lo) / mid * 100:.1f}% of midpoint)")


if __name__ == "__main__":
    main()

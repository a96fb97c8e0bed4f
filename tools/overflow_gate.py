#!/usr/bin/env python3
"""Standing BIGINT-overflow gate (dev tooling, not shipped).

The integer-arithmetic entries carry exactness claims ("every value an
exact integer") whose headroom was proven once, by hand, at sf0.1 in
round 11.  This script makes that proof STANDING: it re-runs Verify +
the DuckDB oracle compare at sf0.1 (100x the per-round gate's data) for
every entry whose arithmetic multiplies counts into fixed-point scales,
so a new entry that silently overflows past 2^63 at one decade up fails
HERE, not in production at the next decade.

Family (and why each is integer-critical):
  p121 HLL register packing       p153 rolling HLL merge
  p155 KMV kth-min arithmetic     p159 chi^2 multiply-through
  p161 surprisal millibits        p169 Benford digit-census milli
  p187 KS cross-multiplied ranks  p205 Zipf log-rank fixed point
  p259 geometric-noise DP release p262 stream quantile buckets
(p259/p262 added round 14 -- the round-13 verdict flagged them as
outside the checked family.)

Usage: python3 tools/overflow_gate.py [sfDir] [outDir]
Defaults: /root/testdata/sf0.1  /tmp/overflow_gate_out
Exit 0 iff every entry hash-matches the oracle at sf0.1.
"""
import subprocess, sys, os

FAMILY = [
    "p121_portable_hll", "p153_rolling_hll", "p155_kmv_sketch",
    "p159_ab_chi2", "p161_unigram_surprisal", "p169_benford_audit",
    "p187_ks_census", "p205_zipf_fit",
    "p259_dp_count_release", "p262_stream_quantiles",
]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/overflow_gate_out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = ",".join(FAMILY)
    print(f"[overflow_gate] Verify {len(FAMILY)} integer-critical entries at {sfdir}")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir} {names}"],
        cwd=repo)
    if r.returncode != 0:
        print("[overflow_gate] Verify FAILED"); sys.exit(1)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "selfcheck.py"),
         sfdir, outdir], cwd=repo)
    if r.returncode != 0:
        print("[overflow_gate] oracle compare FAILED"); sys.exit(1)
    print("[overflow_gate] PASS: integer family exact at sf0.1")

if __name__ == "__main__":
    main()

"""Parse leaderboard/recipe logs into the RESULTS.md hermetic-DER table.

Reads the `threshold X: DER ...` sweep lines and `best threshold` summaries
printed by `cli infer --threshold-sweep --ref`, one block per family, from
the logs written by recipes/hermetic_leaderboard.sh and
recipes/hermetic_streaming_and_eda.sh.

Usage: python scripts/leaderboard_table.py logs/leaderboard.log [more logs...]
"""

import re
import sys

FAMILY_RE = re.compile(r"=== leaderboard family: (\w+) ===")
BEST_RE = re.compile(r"best threshold ([0-9.]+) \(DER ([0-9.]+)%\)")
SWEEP_RE = re.compile(
    r"threshold ([0-9.]+): DER ([0-9.]+)%, MS ([0-9.]+)%, FA ([0-9.]+)%, SC ([0-9.]+)%"
)
DONE_RE = re.compile(r"=== family (\w+) (DONE|FAILED)")
# streaming/eda/mamba2 log has no family markers; tag blocks by infer out path
OUT_RE = re.compile(r"test_hyp_(\w+)\.rttm")


def parse(paths):
    rows = []
    for path in paths:
        fam = None
        sweeps = {}
        status = {}
        order = []
        with open(path) as f:
            for line in f:
                m = FAMILY_RE.search(line)
                if m:
                    fam = m.group(1)
                    if fam not in order:
                        order.append(fam)
                    continue
                m = OUT_RE.search(line)
                if m and FAMILY_RE.pattern not in line:
                    fam = m.group(1)
                    if fam not in order:
                        order.append(fam)
                m = SWEEP_RE.search(line)
                if m and fam:
                    th, der, ms, fa, sc = (float(x) for x in m.groups())
                    best = sweeps.get(fam)
                    if best is None or der < best[1]:
                        sweeps[fam] = (th, der, ms, fa, sc)
                m = DONE_RE.search(line)
                if m:
                    status[m.group(1)] = m.group(2)
        for fam in order:
            if fam in sweeps:
                th, der, ms, fa, sc = sweeps[fam]
                rows.append((fam, th, der, ms, fa, sc, status.get(fam, "DONE")))
            elif fam in status:
                rows.append((fam, None, None, None, None, None, status[fam]))
    return rows


def main():
    rows = parse(sys.argv[1:])
    print("| Family | best thr | DER | MS | FA | SC |")
    print("|---|---|---|---|---|---|")
    for fam, th, der, ms, fa, sc, st in rows:
        if der is None:
            print(f"| {fam} | — | {st} | | | |")
        else:
            print(f"| {fam} | {th:.2f} | **{der:.2f}%** | {ms:.2f} | {fa:.2f} | {sc:.2f} |")


if __name__ == "__main__":
    main()

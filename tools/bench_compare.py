"""Calibration-normalized round-over-round bench comparison
(VERDICT r8 #2/#3): compare two BENCH_DETAIL captures on their common
query set, raw and normalized by each capture's cpu_calibration_sec
(best-of-3 whole-stage-codegen range-sum — data-independent, so the
cal ratio isolates shared-box CPU drift from plan drift).

    python tools/bench_compare.py <old.json|git:REF:PATH> <new.json|git:REF:PATH>

Prints a JSON doc whose HEADLINE is ``median_per_op_ratio`` — the
median over common queries of new/old seconds.  ROADMAP r9 argues (and
a VERDICT r9 re-run demonstrated: raw 0.91x vs probe-normalized 1.38x
for the same capture pair, purely because one start probe landed in a
CPU burst) that probe-based normalization is unreliable on a bursty
shared box, while the per-op median is robust to both a few genuinely
changed ops and a burst window hitting a contiguous registry slice.
The raw and cal-normalized sums plus every query whose NORMALIZED
ratio exceeds 1.3x (the VERDICT r8 #3 re-run threshold) are kept as
supporting detail.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(spec: str) -> dict:
    if spec.startswith("git:"):
        _, ref, path = spec.split(":", 2)
        out = subprocess.run(
            ["git", "show", f"{ref}:{path}"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    with open(spec) as fh:
        return json.load(fh)


def compare(old: dict, new: dict) -> dict:
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so = sum(qo[q] for q in common)
    sn = sum(qn[q] for q in common)
    raw = sn / so if so else float("nan")

    # Like-for-like probe comparison (ADVICE r9): pre-r10 artifacts
    # carry 1-2 probes while r10+ carry 3, so averaging "whatever each
    # side has" compares an avg-of-1 to an avg-of-3 on a bursty box.
    # Use only the probe keys PRESENT IN BOTH docs; `is not None` so a
    # legitimate 0.0 probe isn't dropped.
    probe_keys = [
        k
        for k in (
            "cpu_calibration_sec",
            "cpu_calibration_mid_sec",
            "cpu_calibration_end_sec",
        )
        if old.get(k) is not None and new.get(k) is not None
    ]

    def _cal(doc: dict) -> float | None:
        probes = [doc[k] for k in probe_keys]
        return sum(probes) / len(probes) if probes else None

    cal_o, cal_n = _cal(old), _cal(new)
    drift = (cal_n / cal_o) if (cal_o and cal_n) else None
    norm = raw / drift if drift else None
    # HEADLINE: median per-op ratio — robust to bursts (a burst inflates
    # a contiguous slice, not the median) and to a handful of genuinely
    # changed ops.  The >=0.2s variant screens out sub-200ms ops whose
    # ratios are scheduling noise.
    ratios = sorted(qn[q] / qo[q] for q in common if qo[q])
    ratios_big = sorted(
        qn[q] / qo[q] for q in common if qo[q] and max(qo[q], qn[q]) >= 0.2
    )

    def _median(xs: list[float]) -> float | None:
        if not xs:
            return None
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    slow, fast = {}, {}
    for q in common:
        r = qn[q] / qo[q] if qo[q] else float("inf")
        rn = r / drift if drift else r
        # VERDICT r8 #3: only normalized >1.3x with non-trivial absolute
        # cost demands a quiet-box re-run + root cause
        if rn > 1.3 and qn[q] > 0.5:
            slow[q] = {"old": qo[q], "new": qn[q], "norm_ratio": round(rn, 3)}
        elif rn < 1 / 1.3 and qo[q] > 0.5:
            fast[q] = {"old": qo[q], "new": qn[q], "norm_ratio": round(rn, 3)}
    med, med_big = _median(ratios), _median(ratios_big)
    return {
        # the trustworthy trend estimator — quote THIS in round claims
        "median_per_op_ratio": round(med, 4) if med is not None else None,
        "median_per_op_ratio_ge_200ms": (
            round(med_big, 4) if med_big is not None else None
        ),
        "n_common": len(common),
        "old_sum_sec": round(so, 3),
        "new_sum_sec": round(sn, 3),
        "raw_ratio": round(raw, 4),
        "cal_old": cal_o,
        "cal_new": cal_n,
        "box_drift": round(drift, 4) if drift else None,
        "normalized_ratio": round(norm, 4) if norm else None,
        "regressions_norm_gt_1.3x": slow,
        "improvements_norm_lt_0.77x": fast,
    }


def main() -> None:
    old = _load(sys.argv[1] if len(sys.argv) > 1 else "git:HEAD:BENCH_DETAIL.json")
    new = _load(sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_DETAIL.json"))
    print(json.dumps(compare(old, new), indent=1))


if __name__ == "__main__":
    main()

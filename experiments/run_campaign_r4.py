#!/usr/bin/env python
"""Round-4 quality campaign WITH the paired regression gate
(VERDICT round-3 item 4).

Reruns the same 8 configs (3 scenes x 2-3 seeds, active sampling, pc
bounds — the round2e_active protocol) on the current engine, then prints
a PAIRED per-config delta table against the committed results of the
previous campaigns (round2e_active = round 2 engine, round3_campaign =
round 3 engine). Seeds are shared across campaigns, so each delta is the
same (scene, seed) under two engines: systematic drift shows up as
deltas sharing a sign, run noise as deltas straddling zero.

Verdict rule (printed): with n=8 paired deltas, call it DRIFT when
>= 7/8 share a sign (two-sided sign-test p = 2*(1+8)/256 = 0.07) or
|mean delta| > 2 * sem(deltas); otherwise NOISE.

Usage: python experiments/run_campaign_r4.py [out_root]
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = (sys.argv[1] if len(sys.argv) > 1
       else "/root/repo/experiments/round4_campaign")
SRC = "/root/repo/experiments/round2e_active"
BASELINES = [("round2", "/root/repo/experiments/round2e_active"),
             ("round3", "/root/repo/experiments/round3_campaign")]


def final_cm(run_dir):
    r = json.load(open(os.path.join(run_dir, "res.json")))
    ev = r["sdf_eval"]
    last = ev[sorted(ev.keys(), key=float)[-1]]
    return last["rays"]["av_l1"] * 100


def paired_verdict(deltas):
    import numpy as np
    d = np.asarray(deltas, float)
    n = len(d)
    pos = int((d > 0).sum())
    neg = int((d < 0).sum())
    sem = d.std(ddof=1) / np.sqrt(n) if n > 1 else float("inf")
    drift = (max(pos, neg) >= n - 1 and n >= 6) or abs(d.mean()) > 2 * sem
    return (f"mean {d.mean():+.2f} cm (sem {sem:.2f}), "
            f"sign {pos}+/{neg}- -> "
            + ("DRIFT" if drift else "NOISE (deltas straddle zero or "
               "mean within 2 sem)"))


def main():
    import numpy as np

    from isdf_tpu.train.batch import run_jobs

    jobs = []
    for d in sorted(glob.glob(os.path.join(SRC, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        cfg = json.load(open(os.path.join(d, "config.json")))
        jobs.append((cfg, name))
    assert jobs, f"no configs under {SRC}"
    run_jobs(jobs, OUT)

    print("=== round-4 campaign: paired regression gate ===")
    names = [name for _, name in jobs]
    new = {}
    for name in names:
        try:
            new[name] = final_cm(os.path.join(OUT, name))
        except Exception as e:
            print(f"{name}: FAILED ({e!r})")
    finals = list(new.values())
    print(f"round4: mean {np.mean(finals):.2f} cm, "
          f"max {np.max(finals):.2f} cm, "
          f"runs<=6cm: {sum(f <= 6.0 for f in finals)}/{len(finals)}")

    for label, root in BASELINES:
        rows, deltas = [], []
        for name in names:
            if name not in new:
                continue
            try:
                old = final_cm(os.path.join(root, name))
            except Exception:
                continue
            delta = new[name] - old
            deltas.append(delta)
            rows.append(f"  {name}: {old:.2f} -> {new[name]:.2f} "
                        f"({delta:+.2f})")
        if not deltas:
            continue
        print(f"--- paired vs {label} ({root}) ---")
        print("\n".join(rows))
        print("  verdict:", paired_verdict(deltas))

    with open(os.path.join(OUT, "paired_summary.json"), "w") as f:
        json.dump({"round4": new}, f, indent=2)


if __name__ == "__main__":
    main()

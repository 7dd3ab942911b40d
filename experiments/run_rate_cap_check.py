#!/usr/bin/env python
"""Spot-check the SHIPPED `tpu.step_rate_cap` knob on the real TPU clock.

The quality-vs-compute curve (run_quality_compute_curve.py) was measured
with the sim clock PINNED (_per_step_device_s = 1/rate, _bill_exact).
The shipped knob instead floors the REAL calibrated billing at
n/step_rate_cap per bundle — on a chip faster than the cap the floor
always binds, so the trajectory should reproduce the pinned protocol's
cells. The unit test proves that under _bill_exact
(tests/test_engine.py::test_step_rate_cap_bills_floor_and_matches_pinned_clock);
this runner closes the loop on the production path: real device-time
calibration, real tunnel walls, cfg-only configuration (no private
knobs), compared against the committed pinned cells.

Usage: python experiments/run_rate_cap_check.py [--configs room_a_0,room_c_0]
                [--cap 123]
Writes experiments/rate_cap_check/summary.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SOLO = "/root/repo/experiments/round4_campaign"
CELLS = "/root/repo/experiments/quality_compute_curve/cells.json"
OUT = "/root/repo/experiments/rate_cap_check"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="room_a_0,room_c_0")
    ap.add_argument("--cap", type=float, default=123.0)
    args = ap.parse_args()

    from isdf_tpu.engine.loop import train_loop
    from isdf_tpu.engine.trainer import Trainer
    from isdf_tpu.eval.protocol import eval_sdf
    from isdf_tpu.utils.config import config_from_dict

    pinned = json.load(open(CELLS))
    os.makedirs(OUT, exist_ok=True)
    out_path = os.path.join(OUT, "summary.json")
    out = (json.load(open(out_path)) if os.path.exists(out_path)
           else {"cap": args.cap, "runs": {}})

    for name in args.configs.split(","):
        if name in out["runs"]:
            print(f"skip {name} (done)", flush=True)
            continue
        cfg_d = json.load(open(os.path.join(SOLO, name, "config.json")))
        cfg = config_from_dict(cfg_d).replace(
            do_eval=False, step_rate_cap=args.cap)
        tr = Trainer(cfg, seed=int(cfg_d["seed"]))
        # NO clock pinning: real calibrated device-time billing with the
        # cfg floor — exactly what a user setting tpu.step_rate_cap gets
        res = train_loop(tr, log_fn=None)
        ev = eval_sdf(tr, visible_region=True,
                      seed=int(tr.tot_step_time * 1e3))
        cm = float(ev["av_l1"]) * 100
        cell = pinned.get(f"{name}@{int(args.cap)}", {})
        out["runs"][name] = {
            "capped_cm": round(cm, 3),
            "capped_steps": res.steps,
            "t_sim_s": round(tr.tot_step_time, 2),
            "pinned_cm": cell.get("cm"),
            "pinned_steps": cell.get("steps"),
        }
        print(f"{name}: capped {cm:.2f} cm / {res.steps} steps  "
              f"(pinned cell: {cell.get('cm')} cm / "
              f"{cell.get('steps')} steps)", flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        del tr
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

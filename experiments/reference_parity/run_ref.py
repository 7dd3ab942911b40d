#!/usr/bin/env python
"""Run the PyTorch REFERENCE trainer (isdf/modules/trainer.py) on a
synthetic scene, clock-free, scoring with the shared external Evaluator.

The reference code executed here: Trainer.__init__ (set_params/set_cam/
set_directions/load_data with its own ReplicaDataset reading the exported
sequence), get_data, add_frame, check_keyframe_latest/is_keyframe,
select_keyframes, and step() (sample_points -> sdf_eval_and_loss ->
backward -> AdamW) — i.e. the complete training path of
isdf/train/batch_train/batch_utils.py:14-201, with only:
  * the trimesh scene-mesh load replaced by setting the bounds transform
    directly from the scene metadata (same normalisation our engine
    uses; trimesh is absent from this image), followed by the reference's
    own load_networks();
  * tot_step_time OVERWRITTEN after every step with steps * FIXED_DT
    (clock-free step budget).

Usage: python run_ref.py <preset> <seed> <out_json> [--eval-every-s S]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("seed", type=int)
    ap.add_argument("out_json")
    ap.add_argument("--eval-every-s", type=float, default=1.0)
    ap.add_argument("--data-dir",
                    default="/tmp/ref_parity_small")
    ap.add_argument("--bounds-method", default="pc")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="smoke-test cap (0 = run the full sequence)")
    args = ap.parse_args()

    # keep jax (used by the synthetic renderer/evaluator) off the TPU
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch
    from common import (FIXED_DT, FPS, DEPTH_SCALE, H, W, FX, FY,
                        PARITY_MODEL, PARITY_SAMPLE, TAIL_STEPS,
                        Evaluator, export_replica_format, run_summary)
    from ref_oracle import load_reference

    REF = load_reference()
    seq_dir = export_replica_format(args.preset, args.data_dir)
    meta = json.load(open(os.path.join(seq_dir, "meta.json")))

    # reference-schema config: the shipped replicaCAD.json hyperparams
    # (loss/optimiser/model/sample sections), synthetic dataset section
    ref_cfg = json.load(open("/root/reference/isdf/train/configs/"
                             "replicaCAD.json"))
    ref_cfg["dataset"] = {
        "format": "replica", "depth_scale": DEPTH_SCALE, "fps": FPS,
        "camera": {"w": W, "h": H, "fx": FX, "fy": FY,
                   "cx": meta["cx"], "cy": meta["cy"]},
        "seq_dir": seq_dir + "/",
    }
    ref_cfg["eval"] = {"do_vox_comparison": 0, "do_eval": 0,
                       "eval_freq_s": 1, "sdf_eval": 0, "mesh_eval": 0}
    ref_cfg["save"] = {"save_period": 10000, "save_checkpoints": 0,
                       "save_slices": 0, "save_meshes": 0}
    ref_cfg["loss"]["bounds_method"] = args.bounds_method
    ref_cfg["trainer"]["steps"] = 100000
    ref_cfg["sample"].update(PARITY_SAMPLE)     # parity-small workload
    ref_cfg["model"].update(PARITY_MODEL)
    # ReplicaDataset joins seq_dir + "results" internally via ims_file
    cfg_path = os.path.join(args.data_dir, f"ref_{args.preset}.json")
    with open(cfg_path, "w") as f:
        json.dump(ref_cfg, f, indent=2)

    np.random.seed(args.seed)
    torch.manual_seed(args.seed)
    torch.set_num_threads(max(os.cpu_count() - 2, 1))

    tr = REF.trainer.Trainer("cpu", cfg_path, incremental=True)

    # scene-bounds normalisation for the PE, from the same metadata our
    # engine derives it from (replaces the trimesh oriented-bounds path,
    # trainer.py:103-155); then the reference's own network/optim init
    bounds_T = np.array(meta["bounds_T"], np.float32)
    tr.inv_bounds_transform = torch.from_numpy(
        np.linalg.inv(bounds_T).astype(np.float32))
    tr.scene_center = bounds_T[:3, 3]
    torch.manual_seed(args.seed)  # same init RNG regardless of ingestion
    tr.load_networks()
    tr.sdf_map.train()

    ev = Evaluator(args.preset)

    def sdf_fn(pts):
        with torch.no_grad():
            out = []
            t_pts = torch.from_numpy(np.asarray(pts, np.float32))
            for ch in torch.split(t_pts, 100000):
                out.append(tr.sdf_map(ch).numpy())
        return np.concatenate(out)

    size_dataset = len(tr.scene_dataset)
    curve = []
    last_eval = -1e9
    break_at = -1
    t0 = time.perf_counter()
    t = 0
    while True:
        if t == break_at or (args.max_steps and t >= args.max_steps):
            break
        finish_optim = tr.steps_since_frame == tr.optim_frames
        if finish_optim or t == 0:
            add_new_frame = True if t == 0 else tr.check_keyframe_latest()
            if add_new_frame:
                new_frame_id = tr.get_latest_frame_id()
                if new_frame_id >= size_dataset and break_at < 0:
                    break_at = t + TAIL_STEPS
                    print(f"end of sequence at step {t}")
                elif new_frame_id < size_dataset:
                    frame_data = tr.get_data([new_frame_id])
                    tr.add_frame(frame_data)
                    if t == 0:
                        tr.last_is_keyframe = True
                        tr.optim_frames = 200

        losses, _ = tr.step()
        t += 1
        # clock-free: fixed per-step billing
        tr.tot_step_time = t * FIXED_DT

        if tr.tot_step_time - last_eval >= args.eval_every_s:
            last_eval = tr.tot_step_time
            entry = ev.score(sdf_fn, tr.tot_step_time)
            entry["step"] = t
            entry["total_loss"] = float(losses["total_loss"])
            curve.append(entry)
            print(f"step {t} t_sim={tr.tot_step_time:.2f} "
                  f"vis={entry['vis_mae']*100:.2f}cm "
                  f"vol={entry['vol_mae']*100:.2f}cm "
                  f"loss={entry['total_loss']:.4f} "
                  f"[{time.perf_counter()-t0:.0f}s wall]")

    # final eval after the 400-step tail
    entry = ev.score(sdf_fn, tr.tot_step_time)
    entry["step"] = t
    curve.append(entry)

    out = {"system": "reference", "preset": args.preset, "seed": args.seed,
           "bounds_method": args.bounds_method, "steps": t,
           "kf_ids": [int(i) for i in tr.frames.frame_id[:-1]],
           "wall_s": time.perf_counter() - t0,
           "curve": curve, **run_summary(curve)}
    os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=2)
    print("final:", run_summary(curve))


if __name__ == "__main__":
    main()

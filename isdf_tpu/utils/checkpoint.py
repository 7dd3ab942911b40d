"""Checkpoint / resume.

The reference saves {step, model_state_dict, optimizer_state_dict, loss}
at sim-time marks and restores weights only (train/train.py:207-219,
trainer.py:441-444 — optimiser restore commented out, no buffer/clock
resume). Here a checkpoint is the COMPLETE training state: params,
optimiser state, the keyframe arena, host frame metadata and the simulated
clock — so a restored run continues exactly.

Format: a single .npz of flattened pytree leaves + a JSON sidecar dict
inside the archive (no orbax dependency; loadable anywhere).
Reference-compat: ``load_reference_state_dict`` maps a torch
SDFMap.state_dict() (saved with torch.save) onto our param pytree.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return ({f"{prefix}{i}": np.asarray(l) for i, l in enumerate(leaves)},
            treedef)


def save_checkpoint(path: str, trainer, step: int = 0):
    arrs = {}
    m = trainer.model
    meta: Dict[str, Any] = {"step": int(step),
                            "tot_step_time": float(trainer.tot_step_time),
                            "steps_since_frame": int(trainer.steps_since_frame),
                            # global step counter: indexes the bundle RNG
                            # stream (engine/step.py fold_in(key, step)),
                            # so resume replays the exact random sequence
                            "steps_taken": int(trainer.steps_taken),
                            "bundle_key": np.asarray(
                                trainer._bundle_key).tolist(),
                            "optim_frames": int(trainer.optim_frames),
                            "noise_std": float(trainer.noise_std),
                            "last_is_keyframe": bool(trainer.last_is_keyframe),
                            # scene domain: refit post-init in no-GT-scene
                            # incremental mode (update_scene_bounds_from_
                            # observations), so it is part of the state —
                            # params are meaningless under another transform
                            "bounds_transform":
                                trainer.bounds_transform_np.tolist(),
                            "scene_extents":
                                trainer.scene_extents_np.tolist(),
                            # model description: makes the archive loadable
                            # WITHOUT the training config (serve.py)
                            "model": {
                                "embedding_size": m.embedding_size,
                                "hidden_size": m.hidden_size,
                                "hidden_layers_block": m.hidden_layers_block,
                                "scale_output": m.scale_output,
                                "scale_input": m.scale_input,
                                "min_deg": m.min_deg,
                                "max_deg": m.max_deg,
                                "gauss_embed": m.gauss_embed,
                                "gauss_embed_std": m.gauss_embed_std,
                                "compute_dtype": ("bfloat16"
                                                  if m.compute_dtype
                                                  == jnp.bfloat16
                                                  else "float32"),
                                "mm_precision": m.mm_precision,
                            }}

    for name, tree in [("params", trainer.params),
                       ("opt", trainer.opt_state),
                       ("buf", trainer.buffer),
                       ("frozen", trainer.frozen_params)]:
        d, _ = _flatten(tree, name + "/")
        arrs.update(d)

    # host frame metadata (images omitted; depth/poses live in the arena)
    meta["frames"] = [{"frame_id": f.frame_id} for f in trainer.frames.frames]
    arrs["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    # write to the EXACT path given: np.savez on a str appends ".npz"
    # when the extension differs (a "step_4.ckpt" request silently
    # lands as step_4.ckpt.npz); a file object bypasses that
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrs)


def load_checkpoint(path: str, trainer) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())

        def _unflatten(tree, prefix):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            new = []
            for i, ref in enumerate(leaves):
                a = jnp.asarray(z[f"{prefix}{i}"])
                if a.shape != ref.shape:
                    raise ValueError(
                        f"checkpoint leaf {prefix}{i} has shape {a.shape}"
                        f", expected {ref.shape} (different engine/"
                        f"optimiser-state layout?)")
                new.append(a)
            return jax.tree_util.tree_unflatten(treedef, new)

        trainer.params = _unflatten(trainer.params, "params/")
        try:
            trainer.opt_state = _unflatten(trainer.opt_state, "opt/")
        except (KeyError, ValueError) as e:
            # checkpoint written under a different optimiser-state layout
            # (e.g. before the packed-plane training state): the weights
            # above still restore exactly; restart the moments fresh
            print(f"[checkpoint] optimiser state not restored ({e}); "
                  "re-initialising moments")
            trainer.opt_state = trainer.fns.optimiser.init(trainer.params)
            meta["opt_state_reinitialised"] = True
        trainer.buffer = _unflatten(trainer.buffer, "buf/")
        trainer.frozen_params = _unflatten(trainer.frozen_params, "frozen/")

    trainer.tot_step_time = meta["tot_step_time"]
    trainer.steps_since_frame = meta["steps_since_frame"]
    if "steps_taken" in meta:  # absent in pre-round-5 archives
        trainer.steps_taken = meta["steps_taken"]
        trainer._bundle_key = jnp.asarray(meta["bundle_key"],
                                          jnp.uint32)
    trainer.optim_frames = meta["optim_frames"]
    trainer.noise_std = meta["noise_std"]
    trainer.last_is_keyframe = meta["last_is_keyframe"]
    if "bounds_transform" in meta:  # absent in pre-round-3 archives
        trainer.set_scene_properties(
            np.asarray(meta["bounds_transform"], np.float32),
            np.asarray(meta["scene_extents"], np.float32))
    return meta


def load_reference_state_dict(path_or_dict, params):
    """Map a reference torch checkpoint onto our param pytree.

    Accepts a path to a torch .pth file (reference train/train.py:207-219)
    or an already-loaded state_dict. Layer mapping (reference
    fc_map.py:63-111 -> models/sdf_mlp.py): in_layer.0 -> in,
    mid1.k.0 -> mid1[k], cat_layer.0 -> cat, mid2.k.0 -> mid2[k],
    out_alpha -> out. Torch Linear stores weight as [out, in] — transposed
    on the way in.
    """
    if isinstance(path_or_dict, str):
        import torch
        ck = torch.load(path_or_dict, map_location="cpu",
                        weights_only=False)
        sd = ck.get("model_state_dict", ck)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_dict.items()}

    def _lin(torch_prefix):
        return {"w": jnp.asarray(sd[torch_prefix + ".weight"].T),
                "b": jnp.asarray(sd[torch_prefix + ".bias"])}

    out = dict(params)
    out["in"] = _lin("in_layer.0")
    out["mid1"] = [_lin(f"mid1.{k}.0") for k in range(len(params["mid1"]))]
    out["cat"] = _lin("cat_layer.0")
    out["mid2"] = [_lin(f"mid2.{k}.0") for k in range(len(params["mid2"]))]
    out["out"] = _lin("out_alpha")
    return out


def save_reference_checkpoint(path_or_none, params, step: int = 0,
                              loss: float = 0.0):
    """Export our param pytree as a reference-schema torch checkpoint.

    Inverse of ``load_reference_state_dict``: writes the exact dict the
    reference saves (train/train.py:207-219 — {step, model_state_dict,
    optimizer_state_dict, loss}) so the reference's own tooling
    (eval/plot_utils.py:17-60 load_model / sdf render scripts) can
    consume a map trained here. Torch Linear stores weight as
    [out, in] — transposed on the way out. Returns the checkpoint dict;
    writes it with torch.save when a path is given.
    """
    import torch

    def _lin(prefix, p):
        return {prefix + ".weight": torch.from_numpy(
                    np.asarray(p["w"], dtype=np.float32).T.copy()),
                prefix + ".bias": torch.from_numpy(
                    np.asarray(p["b"], dtype=np.float32).copy())}

    sd: Dict[str, Any] = {}
    sd.update(_lin("in_layer.0", params["in"]))
    for k, p in enumerate(params["mid1"]):
        sd.update(_lin(f"mid1.{k}.0", p))
    sd.update(_lin("cat_layer.0", params["cat"]))
    for k, p in enumerate(params["mid2"]):
        sd.update(_lin(f"mid2.{k}.0", p))
    sd.update(_lin("out_alpha", params["out"]))

    ck = {"step": int(step), "model_state_dict": sd,
          "optimizer_state_dict": {}, "loss": float(loss)}
    if path_or_none is not None:
        torch.save(ck, path_or_none)
    return ck

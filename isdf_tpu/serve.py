"""Standalone SDF query service (map serving for planners).

The reference's downstream use-case is robot planning: the learned SDF is
queried for values/gradients (reference isdf/modules/trainer.py:2066-2078,
``sdf_fn``/``grad_fn``) and turned into CHOMP/linear collision costs
(reference isdf/eval/metrics.py:95-113). The reference only exercises those
queries inside its own eval scripts; this module ships them as a product:

* :class:`SDFQueryEngine` — batched device queries against a trained map,
  built from a live :class:`Trainer` or a checkpoint archive alone (the
  .npz stores the model description and scene transform since round 3, so
  no training config or dataset is needed to serve a saved map).
* :class:`SDFQueryServer` — a threaded stdlib-HTTP JSON API (POST /sdf,
  /grad, /query, /collision) a planner process can call; plus a CLI
  (``python -m isdf_tpu.serve --checkpoint map.npz``). Repeating
  ``--checkpoint [NAME=]PATH`` serves a FLEET of maps (e.g.
  train_multi's per-scene checkpoints) under ``/scene/<NAME>/<route>``
  from one process — the natural partner of multi-scene training
  (parallel/multi_scene.py: K robots, one chip).

TPU notes: queries run as fixed-shape jitted chunks (pow2-bucketed chunk
counts, one dispatch+fetch per request — same discipline as
Trainer._chunked_eval); the MLP forward is pure MXU work and the gradient
is one VJP per chunk. A served map owns a SNAPSHOT of the params (the
train bundle donates its buffers, so sharing the live pytree would dangle);
``refresh_from_trainer`` swaps in a new snapshot atomically.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.models import sdf_mlp as M

# hard cap per request: 16 chunks x 64k = 1M points (~12 MB of f32 xyz);
# bigger batches should stream multiple requests
MAX_POINTS = 1 << 20


def _build_query_fns(model: M.SDFModel):
    """Jitted single-chunk and lax.map multi-chunk query executors
    (mirrors engine/step.py eval_sdf*; kept local so a checkpoint-only
    service never builds the training step)."""

    @jax.jit
    def sdf_one(params, pts, transform):  # [K,3] -> [K]
        return M.apply(params, pts, model, transform=transform)

    @jax.jit
    def grad_one(params, pts, transform):  # [K,3] -> [K,3]
        _, g = M.sdf_and_grad(params, pts, model, transform=transform)
        return g

    @jax.jit
    def sdf_many(params, pts, transform):  # [C,K,3] -> [C,K]
        return jax.lax.map(
            lambda p: M.apply(params, p, model, transform=transform), pts)

    @jax.jit
    def grad_many(params, pts, transform):
        def one(p):
            _, g = M.sdf_and_grad(params, p, model, transform=transform)
            return g
        return jax.lax.map(one, pts)

    return sdf_one, grad_one, sdf_many, grad_many


@dataclass
class SDFQueryEngine:
    """Batched SDF/gradient/cost queries against a trained map."""

    params: Any
    model: M.SDFModel
    transform: jnp.ndarray          # inv bounds transform (world -> box)
    chunk_size: int = 1 << 16
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self._lock = threading.Lock()
        (self._sdf_one, self._grad_one,
         self._sdf_many, self._grad_many) = _build_query_fns(self.model)

    # ------------------------------------------------------------- build
    @staticmethod
    def _snapshot(tree):
        # the train bundle DONATES the params buffers (engine/step.py), so
        # a served map must own copies — a shared reference would be
        # invalidated by the next run_steps
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      tree)

    @classmethod
    def from_trainer(cls, trainer, chunk_size: int = 1 << 16):
        return cls(params=cls._snapshot(trainer.params),
                   model=trainer.model,
                   transform=trainer.transform_dev, chunk_size=chunk_size,
                   meta={"source": "trainer"})

    @classmethod
    def from_checkpoint(cls, path: str, config=None,
                        chunk_size: int = 1 << 16):
        """Load a map from a checkpoint archive alone.

        ``config`` (a utils.config.Config) overrides the archive's model
        description when given; archives written before the description
        was stored require it.
        """
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
            if config is not None:
                model = M.SDFModel(
                    embedding_size=config.embedding_size,
                    hidden_size=config.hidden_feature_size,
                    hidden_layers_block=config.hidden_layers_block,
                    scale_output=config.scale_output,
                    scale_input=config.scale_input,
                    min_deg=0, max_deg=config.n_embed_funcs,
                    gauss_embed=config.gauss_embed,
                    gauss_embed_std=config.gauss_embed_std,
                    compute_dtype=(jnp.bfloat16
                                   if config.compute_dtype == "bfloat16"
                                   else jnp.float32),
                    mm_precision=config.mm_precision)
            elif "model" in meta:
                desc = dict(meta["model"])
                # compute_dtype is stored as a string (it is not JSON-
                # serialisable); pre-round-4 archives omit it -> f32,
                # matching their training default
                desc["compute_dtype"] = (
                    jnp.bfloat16
                    if desc.get("compute_dtype") == "bfloat16"
                    else jnp.float32)
                model = M.SDFModel(**desc)
            else:
                raise ValueError(
                    f"{path} predates the stored model description; pass "
                    "the training config")
            template = M.init_params(jax.random.PRNGKey(0), model)
            leaves, treedef = jax.tree_util.tree_flatten(template)
            new = []
            for i, ref in enumerate(leaves):
                a = jnp.asarray(z[f"params/{i}"])
                if a.shape != ref.shape:
                    raise ValueError(
                        f"checkpoint leaf params/{i} has shape {a.shape}, "
                        f"expected {ref.shape} (model mismatch?)")
                new.append(a)
            params = jax.tree_util.tree_unflatten(treedef, new)
            if "bounds_transform" in meta:
                transform = jnp.asarray(np.linalg.inv(
                    np.asarray(meta["bounds_transform"], np.float32)))
            else:
                transform = jnp.eye(4)
        return cls(params=params, model=model, transform=transform,
                   chunk_size=chunk_size,
                   meta={"source": path, "step": meta.get("step"),
                         "sim_time_s": meta.get("tot_step_time")})

    def refresh_from_trainer(self, trainer):
        """Atomically swap in a snapshot of the trainer's current params
        (live serving next to a training loop; snapshots are immutable so
        readers see either the old or the new map, never a mix)."""
        p = self._snapshot(trainer.params)
        with self._lock:
            self.params = p
            self.transform = trainer.transform_dev

    # ------------------------------------------------------------ queries
    def _chunked(self, pts: np.ndarray, one, many, out_tail):
        pts = np.ascontiguousarray(pts, np.float32)
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise ValueError(f"points must be [N,3], got {pts.shape}")
        n = pts.shape[0]
        if n > MAX_POINTS:
            raise ValueError(f"{n} points exceeds the {MAX_POINTS} cap; "
                             "stream multiple requests")
        if not np.isfinite(pts).all():
            # JSON NaN/Infinity tokens parse but would propagate through
            # the MLP and serialise back as bare NaN, which strict JSON
            # parsers in planner clients reject
            raise ValueError("points contain non-finite values")
        with self._lock:
            params, transform = self.params, self.transform
        K = self.chunk_size
        if n <= K:
            chunk = np.zeros((K, 3), np.float32)
            chunk[:n] = pts
            return np.asarray(one(params, jnp.asarray(chunk),
                                  transform))[:n]
        C = (n + K - 1) // K
        C = 1 << (C - 1).bit_length()  # pow2 buckets bound compile count
        padded = np.zeros((C * K, 3), np.float32)
        padded[:n] = pts
        r = many(params, jnp.asarray(padded.reshape(C, K, 3)), transform)
        return np.asarray(r).reshape((C * K,) + out_tail)[:n]

    def sdf(self, pts) -> np.ndarray:
        """SDF values [N] (metres) at world points [N,3]."""
        return self._chunked(pts, self._sdf_one, self._sdf_many, ())

    def grad(self, pts) -> np.ndarray:
        """Spatial SDF gradients [N,3] at world points [N,3]."""
        return self._chunked(pts, self._grad_one, self._grad_many, (3,))

    def chomp_cost(self, pts, epsilon: float = 2.0) -> np.ndarray:
        """Per-point CHOMP obstacle cost (reference metrics.py:95-104)."""
        from isdf_tpu.eval.metrics import chomp_cost
        return np.asarray(chomp_cost(self.sdf(pts), epsilon=epsilon))

    def linear_cost(self, pts, epsilon: float = 1.5) -> np.ndarray:
        """Hinge cost max(epsilon - sdf, 0) (reference metrics.py:107-113)."""
        from isdf_tpu.eval.metrics import linear_cost
        return np.asarray(linear_cost(self.sdf(pts), epsilon=epsilon))

    def collision(self, pts, margin: float = 0.0) -> Dict[str, Any]:
        """Batch collision check: does any query point sit within
        ``margin`` metres of (or inside) the surface?"""
        sdf = self.sdf(pts)
        below = sdf <= margin
        return {"min_sdf": float(sdf.min()) if sdf.size else float("inf"),
                "argmin": int(sdf.argmin()) if sdf.size else -1,
                "n_below": int(below.sum()),
                "collides": bool(below.any())}

    def info(self) -> Dict[str, Any]:
        return {"ok": True,
                "param_count": M.param_count(self.params),
                "embedding_size": self.model.embedding_size,
                "hidden_size": self.model.hidden_size,
                "chunk_size": self.chunk_size,
                "max_points": MAX_POINTS,
                "device": str(jax.devices()[0]),
                **self.meta}


class EnsembleEngine:
    """Average the predictions of N member engines (same scene,
    independent seeds). Motivated by experiments/run_ensemble_quality:
    two seeds trained jointly on one chip (parallel/multi_scene.py)
    cost the hardware of ONE reference GPU run, and their averaged SDF
    consistently beats the members' mean. Implements the
    SDFQueryEngine query interface, so it drops into SDFQueryServer
    and the /scene routes unchanged."""

    def __init__(self, members):
        if len(members) < 1:
            raise ValueError("ensemble needs at least one member")
        self.members = list(members)

    def sdf(self, pts) -> np.ndarray:
        return np.mean([m.sdf(pts) for m in self.members], axis=0)

    def grad(self, pts) -> np.ndarray:
        # gradient of the mean = mean of the gradients
        return np.mean([m.grad(pts) for m in self.members], axis=0)

    def collision(self, pts, margin: float = 0.0) -> Dict[str, Any]:
        sdf = self.sdf(pts)
        below = sdf <= margin
        return {"min_sdf": float(sdf.min()) if sdf.size else float("inf"),
                "argmin": int(sdf.argmin()) if sdf.size else -1,
                "n_below": int(below.sum()),
                "collides": bool(below.any())}

    def info(self) -> Dict[str, Any]:
        return {"ok": True, "ensemble": len(self.members),
                "members": [m.info() for m in self.members]}


# --------------------------------------------------------------------- http
class _QueryHandler(BaseHTTPRequestHandler):
    engines: Dict[str, SDFQueryEngine] = None  # bound by SDFQueryServer

    def log_message(self, *a):  # quiet
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _resolve(self):
        """Map the request path to (engine, route). Multi-map routes are
        /scene/<name>/<route> (one service fronts a fleet of maps, e.g.
        train_multi's per-scene checkpoints); the bare routes keep
        serving when exactly one map is loaded."""
        p = self.path.rstrip("/")
        if p.startswith("/scene/"):
            parts = p.split("/", 3)  # '', 'scene', name, route...
            name = parts[2] if len(parts) > 2 else ""
            e = self.engines.get(name)
            if e is None:
                return None, None, {"error": f"unknown scene {name!r}",
                                    "scenes": sorted(self.engines)}
            return e, ("/" + parts[3] if len(parts) > 3 else ""), None
        if len(self.engines) == 1:
            return next(iter(self.engines.values())), p, None
        return None, None, {"error": "multiple scenes loaded; use "
                                     "/scene/<name>/<route>",
                            "scenes": sorted(self.engines)}

    def do_GET(self):  # noqa: N802 (stdlib API)
        p = self.path.rstrip("/")
        if p in ("", "/healthz"):
            if len(self.engines) == 1:
                return self._send(next(iter(
                    self.engines.values())).info())
            return self._send({"scenes": {
                k: e.info() for k, e in sorted(self.engines.items())}})
        e, route, err = self._resolve()
        if err:
            return self._send(err, 404)
        if route in ("", "/healthz"):
            return self._send(e.info())
        self._send({"error": "not found"}, 404)

    def do_POST(self):  # noqa: N802 (stdlib API)
        try:
            n = int(self.headers.get("Content-Length", 0))
            if n > 64 * MAX_POINTS:  # ~64 B/point of JSON is generous
                # the body is left unread: close the connection so the
                # client sees the 413 (not a RST from the kernel) and the
                # keep-alive stream is never desynchronised
                self.close_connection = True
                self.send_response(413)
                self.send_header("Content-Type", "application/json")
                self.send_header("Connection", "close")
                body = json.dumps({"error": "request too large"}).encode()
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            req = json.loads(self.rfile.read(n) or b"{}")
            pts = np.asarray(req.get("points", []), np.float32)
            if pts.size == 0:
                return self._send({"error": "no points"}, 400)
            e, p, err = self._resolve()
            if err:
                return self._send(err, 404)
            if p == "/sdf":
                return self._send({"sdf": e.sdf(pts).tolist()})
            if p == "/grad":
                return self._send({"grad": e.grad(pts).tolist()})
            if p == "/collision":
                return self._send(
                    e.collision(pts, margin=float(req.get("margin", 0.0))))
            if p == "/query":
                eps = float(req.get("epsilon", 2.0))
                sdf = e.sdf(pts)
                from isdf_tpu.eval.metrics import chomp_cost
                out = {"sdf": sdf.tolist(),
                       "chomp_cost": np.asarray(
                           chomp_cost(sdf, epsilon=eps)).tolist()}
                if req.get("grad", True):
                    out["grad"] = e.grad(pts).tolist()
                return self._send(out)
            self._send({"error": "not found"}, 404)
        except BrokenPipeError:
            pass
        except (ValueError, json.JSONDecodeError) as err:
            self._send({"error": str(err)}, 400)
        except Exception as err:  # keep serving
            self._send({"error": repr(err)}, 500)


class SDFQueryServer:
    """Threaded HTTP JSON API around one or more SDFQueryEngines.

    Pass one engine for the classic single-map service (bare /sdf,
    /grad, ... routes), or a {name: engine} dict to front a fleet of
    maps under /scene/<name>/<route> (e.g. train_multi's per-scene
    checkpoints)."""

    def __init__(self, engine, port: int = 0, host: str = "127.0.0.1"):
        engines = (dict(engine) if isinstance(engine, dict)
                   else {"0": engine})
        handler = type("Handler", (_QueryHandler,), {"engines": engines})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        self.engines = engines
        self.engine = next(iter(engines.values()))  # back-compat
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Serve one or more trained SDF maps over HTTP")
    ap.add_argument("--checkpoint", required=True, action="append",
                    dest="checkpoints", metavar="[NAME=]PATH[+PATH...]",
                    help="checkpoint written by utils/checkpoint.py; "
                         "repeat to serve a fleet of maps under "
                         "/scene/<NAME>/ (NAME defaults to the index); "
                         "'+'-join several paths to serve their "
                         "prediction-averaged ENSEMBLE as one map")
    ap.add_argument("--config", default=None,
                    help="training config JSON (only needed for archives "
                         "that predate the stored model description)")
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--chunk", type=int, default=1 << 16)
    args = ap.parse_args(argv)

    cfg = None
    if args.config:
        from isdf_tpu.utils.config import load_config
        cfg = load_config(args.config)
    engines = {}
    for i, spec in enumerate(args.checkpoints):
        name, _, paths = spec.rpartition("=")
        name = name or str(i)
        members = [SDFQueryEngine.from_checkpoint(
            p, config=cfg, chunk_size=args.chunk)
            for p in paths.split("+")]
        engines[name] = (members[0] if len(members) == 1
                         else EnsembleEngine(members))
        # warm the single-chunk path so the first planner call is not a
        # compile (engines share model shape -> shared jit cache)
        engines[name].sdf(np.zeros((1, 3), np.float32))
    srv = SDFQueryServer(engines if len(engines) > 1
                         else next(iter(engines.values())),
                         port=args.port, host=args.host).start()
    def _desc(e):
        i = e.info()
        return (f"ensemble of {i['ensemble']}" if "ensemble" in i
                else f"{i['param_count']} params")

    print(f"serving {len(engines)} map(s) on http://{args.host}:"
          f"{srv.port} " + " ".join(
              f"[{k}: {_desc(e)}]" for k, e in engines.items()))
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()

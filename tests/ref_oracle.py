"""Load the PyTorch reference implementation (/root/reference/isdf) as a
numerical ORACLE for golden-value tests and step-budget quality A/Bs.

The reference's package __init__ files eagerly import GUI/mesh libraries
that are absent from this image (trimesh, pyglet, open3d, imgviz,
skimage, torchvision).  None of those touch the MATH we want to drive —
the op modules (embedding/fc_map/sample/loss/render), the geometry
layer, the datasets readers and the Trainer's training path — so this
loader:

  1. installs inert stub modules for the missing libraries (plus a
     functional ``torchvision.transforms.Compose``, which the reference
     actually uses on the data path);
  2. creates synthetic ``isdf.*`` package modules, BYPASSING the
     reference's ``__init__.py`` files;
  3. loads the needed leaf modules directly from the reference tree in
     dependency order.

Everything is loaded read-only from /root/reference; nothing is copied.
Used by tests/test_reference_golden.py and experiments/reference_parity.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"

_STUB_MODULES = [
    "trimesh", "trimesh.exchange", "trimesh.exchange.load",
    "trimesh.transformations", "trimesh.viewer", "trimesh.bounds",
    "trimesh.creation", "trimesh.visual",
    "pyglet", "pyglet.gl",
    "open3d", "open3d.core", "open3d.visualization",
    "open3d.visualization.gui", "open3d.visualization.rendering",
    "imgviz",
    "skimage", "skimage.measure",
]


class _Compose:
    """Functional replacement for torchvision.transforms.Compose (the
    only torchvision symbol the reference's data path calls)."""

    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


def _install_stubs():
    for name in _STUB_MODULES:
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            mod.__path__ = []  # mark as package so submodule imports work
            sys.modules[name] = mod
            if "." in name:
                parent, leaf = name.rsplit(".", 1)
                if parent in sys.modules:
                    setattr(sys.modules[parent], leaf, mod)
    if "torchvision" not in sys.modules:
        try:
            __import__("torchvision")
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.__path__ = []
            tr = types.ModuleType("torchvision.transforms")
            tr.Compose = _Compose
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr


def _synth_pkg(name):
    mod = types.ModuleType(name)
    mod.__path__ = []
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        setattr(sys.modules[parent], leaf, mod)
    return mod


def _load(name, relpath):
    path = os.path.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    parent, leaf = name.rsplit(".", 1)
    setattr(sys.modules[parent], leaf, mod)
    spec.loader.exec_module(mod)
    return mod


_ns = None


def load_reference():
    """Import the reference's math/data/trainer modules; returns a
    namespace with attributes transform, frustum, embedding, fc_map,
    sample, render, loss, image_transforms, data_util, dataset,
    sdf_util, metrics, eval_pts, trainer."""
    global _ns
    if _ns is not None:
        return _ns
    if not os.path.isdir(os.path.join(REF_ROOT, "isdf")):
        raise RuntimeError(f"reference tree not found at {REF_ROOT}")
    os.environ.setdefault("MPLBACKEND", "Agg")

    _install_stubs()

    # synthetic packages bypassing the reference __init__ files
    _synth_pkg("isdf")
    _synth_pkg("isdf.geometry")
    _synth_pkg("isdf.modules")
    _synth_pkg("isdf.datasets")
    _synth_pkg("isdf.eval")
    vis = _synth_pkg("isdf.visualisation")
    # trainer does `from isdf.visualisation import draw, draw3D` at
    # import time; the vis functions are only CALLED from methods the
    # oracle never exercises
    vis.draw = types.ModuleType("isdf.visualisation.draw")
    vis.draw3D = types.ModuleType("isdf.visualisation.draw3D")

    ns = types.SimpleNamespace()
    ns.transform = _load("isdf.geometry.transform",
                         "isdf/geometry/transform.py")
    ns.embedding = _load("isdf.modules.embedding",
                         "isdf/modules/embedding.py")
    ns.fc_map = _load("isdf.modules.fc_map", "isdf/modules/fc_map.py")
    ns.sample = _load("isdf.modules.sample", "isdf/modules/sample.py")
    ns.frustum = _load("isdf.geometry.frustum", "isdf/geometry/frustum.py")
    ns.render = _load("isdf.modules.render", "isdf/modules/render.py")
    ns.loss = _load("isdf.modules.loss", "isdf/modules/loss.py")
    ns.image_transforms = _load("isdf.datasets.image_transforms",
                                "isdf/datasets/image_transforms.py")
    ns.data_util = _load("isdf.datasets.data_util",
                         "isdf/datasets/data_util.py")
    ns.dataset = _load("isdf.datasets.dataset", "isdf/datasets/dataset.py")
    ns.sdf_util = _load("isdf.datasets.sdf_util",
                        "isdf/datasets/sdf_util.py")
    ns.metrics = _load("isdf.eval.metrics", "isdf/eval/metrics.py")
    ns.eval_pts = _load("isdf.eval.eval_pts", "isdf/eval/eval_pts.py")
    ns.trainer = _load("isdf.modules.trainer", "isdf/modules/trainer.py")
    _ns = ns
    return ns


if __name__ == "__main__":
    n = load_reference()
    print("loaded:", sorted(vars(n)))

"""Interactive SDF viewer served over HTTP (stdlib only).

The reference ships an Open3D interactive app (isdf_window.py:29-806) and
a trimesh/pyglet slice viewer (sdf_viewer.py:66-498); neither toolkit is
installable here, and a browser is a better fit for a TPU host anyway —
the model runs on the device, the page is just controls + images. This
module serves the same interactive content:

  * slice scrubbing through the SDF volume (slider / arrow keys), with
    click-to-query: any pixel reports its world point and SDF value
    (sdf_viewer.py's slice mode + the window's "query" affordance);
  * an orbiting shaded mesh render (the GUI's turntable camera);
  * keyframe strip + live training scalars when attached to a Trainer
    (isdf_window.py's keyframe panel and compute-balance label);
  * a refresh action that re-snapshots grid + mesh from the live params.

Programmatic use (e.g. from the train_vis monitor loop):

    viewer = SDFWebViewer(ViewerSource.from_trainer(trainer))
    viewer.start()            # -> http://localhost:<viewer.port>

Offline use on a saved dense grid (``*.npy`` [D,D,D]):

    python -m isdf_tpu.vis.server --grid sdf_grid.npy --port 8787
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


def _png(img_rgb: np.ndarray) -> bytes:
    import cv2
    ok, buf = cv2.imencode(".png", np.asarray(img_rgb)[..., ::-1])
    assert ok
    return buf.tobytes()


class ViewerSource:
    """Snapshot of an SDF volume + optional live hooks.

    grid     : [D, D, D] SDF values
    grid_pc  : [D, D, D, 3] world coordinates of the lattice
    sdf_fn   : exact point queries (falls back to nearest grid value)
    trainer  : enables keyframes / status / refresh
    """

    def __init__(self, grid: np.ndarray, grid_pc: np.ndarray,
                 sdf_fn=None, trainer=None, up_ix: int = 1,
                 loop_attached: bool = False):
        self.trainer = trainer
        self.sdf_fn = sdf_fn
        # True when a RUNNING training loop owns the trainer/device
        # (train_vis --serve): device work must then happen only on the
        # loop's monitor tick, never on HTTP handler threads. False for
        # a standalone server over a checkpointed trainer, where this
        # server is the only device user and inline evals are safe.
        self.loop_attached = loop_attached
        self.up_ix = up_ix
        self._lock = threading.Lock()
        self._mesh_cache = {}
        self.last_request = 0.0   # any HTTP hit bumps this (see _Handler)
        self.last_refresh = 0.0
        self.refresh_requested = False
        # training controls (reference isdf_window.py:546-712: play/pause
        # button, iters-per-step slider, mesh/slices toggles). Written by
        # HTTP threads, read by the training loop between bundles
        # (engine/loop.py control_hook) — plain values, lock-guarded.
        # iters_per_step 0 = the config's own per-frame budget.
        # scene_*: content toggles of the 3D composite scene view
        # (reference isdf_window.py's mesh/keyframe/pointcloud
        # checkboxes over its widget3d scene).
        self.controls = {"paused": False, "iters_per_step": 0,
                         "do_mesh": True, "do_slices": True,
                         "scene_mesh": True, "scene_frustums": True,
                         "scene_traj": True, "scene_pc": False}
        self._set_grid(grid, grid_pc)

    def update_controls(self, d: dict) -> dict:
        """Validated control update from an HTTP thread; unknown keys are
        ignored, values coerced/clamped. Returns the resulting state."""
        with self._lock:
            if "paused" in d:
                self.controls["paused"] = bool(d["paused"])
            if "iters_per_step" in d:
                v = int(d["iters_per_step"])
                self.controls["iters_per_step"] = max(0, min(v, 10000))
            for k in ("do_mesh", "do_slices", "scene_mesh",
                      "scene_frustums", "scene_traj", "scene_pc"):
                if k in d:
                    self.controls[k] = bool(d[k])
            return dict(self.controls)

    def get_controls(self) -> dict:
        with self._lock:
            return dict(self.controls)

    def _set_grid(self, grid, grid_pc):
        grid = np.asarray(grid, np.float32)
        assert grid.ndim == 3, grid.shape
        self.grid = grid
        self.grid_pc = np.asarray(grid_pc, np.float32).reshape(
            grid.shape + (3,))
        self.version = getattr(self, "version", -1) + 1
        lo, hi = float(grid.min()), float(grid.max())
        self.sdf_range = (min(lo, -1e-3), max(hi, 1e-3))
        self._verts = self._faces = None

    # -- constructors --------------------------------------------------
    @classmethod
    def from_trainer(cls, trainer, up_ix: Optional[int] = None,
                     loop_attached: bool = False):
        d = trainer.grid_dim
        return cls(trainer.get_sdf_grid(),
                   np.asarray(trainer.grid_pc).reshape(d, d, d, 3),
                   sdf_fn=trainer.sdf_fn, trainer=trainer,
                   up_ix=getattr(trainer, "up_ix", 1)
                   if up_ix is None else up_ix,
                   loop_attached=loop_attached)

    @classmethod
    def from_grid(cls, grid: np.ndarray, extents=None, centre=(0, 0, 0),
                  sdf_fn=None, up_ix: int = 1):
        grid = np.asarray(grid, np.float32)
        d = grid.shape[0]
        if extents is None:
            extents = (2.0, 2.0, 2.0)
        axes = [np.linspace(c - e / 2, c + e / 2, n) for c, e, n in
                zip(centre, np.broadcast_to(extents, (3,)), grid.shape)]
        pc = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        return cls(grid, pc, sdf_fn=sdf_fn, up_ix=up_ix)

    # -- content -------------------------------------------------------
    def n_slices(self) -> int:
        return self.grid.shape[self.up_ix]

    def slice_png(self, i: int, scale: int = 3) -> bytes:
        from isdf_tpu.vis.slices import sdf_colormap
        i = int(np.clip(i, 0, self.n_slices() - 1))
        img = sdf_colormap(np.take(self.grid, i, axis=self.up_ix),
                           self.sdf_range)
        if scale > 1:
            img = np.repeat(np.repeat(img, scale, 0), scale, 1)
        return _png(img)

    def query(self, i: int, r: int, c: int):
        """Slice-pixel (slice i, row r, col c) -> world point + SDF."""
        other = [a for a in range(3) if a != self.up_ix]
        idx = [0, 0, 0]
        idx[self.up_ix] = int(np.clip(i, 0, self.n_slices() - 1))
        idx[other[0]] = int(np.clip(r, 0, self.grid.shape[other[0]] - 1))
        idx[other[1]] = int(np.clip(c, 0, self.grid.shape[other[1]] - 1))
        pt = self.grid_pc[tuple(idx)]
        if self.sdf_fn is not None and not self.loop_attached:
            sdf = float(np.asarray(
                self.sdf_fn(pt[None].astype(np.float32))).reshape(-1)[0])
        else:
            # loop-attached: the training loop owns the device (the step
            # bundle donates trainer.params — an eval from this HTTP
            # thread can hit a deleted array mid-bundle and bills its
            # dispatch to the run's timed window), so queries read the
            # snapshot grid; exact at lattice points after a refresh
            sdf = float(self.grid[tuple(idx)])
        return {"point": [round(float(v), 4) for v in pt],
                "sdf": round(sdf, 5),
                "grid_sdf": round(float(self.grid[tuple(idx)]), 5)}

    def _ensure_mesh(self):
        if self._faces is None:
            from isdf_tpu.utils import mesh3d
            verts_idx, faces = mesh3d.marching_tetrahedra(self.grid)
            if len(verts_idx):
                # index space -> world via the lattice (trilinear on the
                # grid_pc is exact for an affine lattice)
                lo = self.grid_pc[0, 0, 0]
                hi = self.grid_pc[-1, -1, -1]
                span = (np.asarray(self.grid.shape, np.float32) - 1)
                verts = lo + verts_idx / span * (hi - lo)
            else:
                verts = verts_idx
            self._verts, self._faces = verts, faces

    def render_png(self, azim: float, elev: float) -> bytes:
        key = (self.version, round(azim), round(elev))
        with self._lock:
            png = self._mesh_cache.get(key)
            if png is None:
                self._ensure_mesh()
                if len(self._faces) == 0:
                    img = np.full((480, 480, 3), 32, np.uint8)
                else:
                    from isdf_tpu.vis.viewer import render_mesh_image
                    img = render_mesh_image(self._verts, self._faces,
                                            azim=azim, elev=elev, size=480)
                if len(self._mesh_cache) > 64:
                    self._mesh_cache.clear()
                png = _png(img)
                self._mesh_cache[key] = png
        return png

    def scene_png(self, azim: float, elev: float,
                  zoom: float = 1.0) -> bytes:
        """3D composite scene view (vis/composite.py): reconstructed
        mesh + keyframe frustum wireframes + camera trajectory +
        optional latest depth pointcloud, at an arbitrary azim/elev/
        zoom camera — the navigable scene of the reference GUI
        (isdf_window.py:29-806, draw3D.py:16-108). Reads only the mesh
        cache + the trainer's HOST FrameStore mirrors, so it is safe on
        HTTP threads while the loop owns the device."""
        from isdf_tpu.vis.composite import (composite_from_trainer,
                                            render_composite)
        ctl = self.get_controls()
        n_kf = len(self.trainer.frames) if self.trainer is not None else 0
        key = ("scene", self.version, n_kf, round(azim), round(elev),
               round(float(zoom), 2), ctl["scene_mesh"],
               ctl["scene_frustums"], ctl["scene_traj"], ctl["scene_pc"])
        with self._lock:
            png = self._mesh_cache.get(key)
            if png is None:
                self._ensure_mesh()
                if self.trainer is not None:
                    img = composite_from_trainer(
                        self.trainer, verts=self._verts,
                        faces=self._faces, azim=azim, elev=elev,
                        zoom=zoom, show_mesh=ctl["scene_mesh"],
                        show_frustums=ctl["scene_frustums"],
                        show_traj=ctl["scene_traj"],
                        show_pc=ctl["scene_pc"])
                else:
                    img = render_composite(
                        verts=self._verts if ctl["scene_mesh"] else None,
                        faces=self._faces if ctl["scene_mesh"] else None,
                        azim=azim, elev=elev, zoom=zoom)
                if len(self._mesh_cache) > 64:
                    self._mesh_cache.clear()
                png = _png(img)
                self._mesh_cache[key] = png
        return png

    def keyframes_png(self) -> Optional[bytes]:
        if self.trainer is None or len(self.trainer.frames) == 0:
            return None
        from isdf_tpu.vis.views import keyframe_strip
        return _png(keyframe_strip(self.trainer))

    def status(self):
        out = {"version": self.version, "live": self.trainer is not None}
        out["version"] = self.version  # the page's poll watches this
        if self.trainer is not None:
            out["paused"] = bool(self.controls["paused"])
            out["steps"] = int(self.trainer.steps_taken)
            out["keyframes"] = len(self.trainer.frames)
            out["sim_time_s"] = round(
                float(self.trainer.tot_step_time), 2)
            out.update({k: round(float(v), 4) for k, v in
                        self.trainer.perf_summary().items()})
        return out

    def refresh(self):
        """Re-snapshot grid (and lazily mesh) from the live trainer.

        Must run on the thread that owns the trainer (the training
        loop's monitor hook): the step bundle donates trainer.params,
        so a grid eval from an HTTP handler thread races the donation
        (deleted-array crash) and lands inside the loop's timed window
        (phantom billed time). HTTP refresh requests therefore go
        through request_refresh() and are serviced here on the next
        monitor tick via refresh_if_watched()."""
        if self.trainer is None:
            return {"refreshed": False}
        import time
        with self._lock:
            d = self.trainer.grid_dim
            self._set_grid(
                self.trainer.get_sdf_grid(),
                np.asarray(self.trainer.grid_pc).reshape(d, d, d, 3))
            self.last_refresh = time.time()
            self.refresh_requested = False
        return {"refreshed": True, "version": self.version}

    def request_refresh(self):
        """HTTP-thread entry. Loop-attached: mark a refresh pending for
        the training loop's monitor hook (see refresh()). Standalone
        trainer (checkpoint server): refresh inline — this server is
        the only device user."""
        if self.trainer is None:
            return {"refreshed": False}
        if not self.loop_attached:
            return self.refresh()
        self.refresh_requested = True
        return {"refreshed": False, "pending": True,
                "version": self.version}

    def refresh_if_watched(self):
        """Refresh only when a browser touched the server since the last
        snapshot — an idle viewer must not bill grid evals to the run
        (intended to be called from the training loop's monitor hook)."""
        if self.trainer is not None and (
                self.refresh_requested
                or self.last_request > self.last_refresh):
            return self.refresh()
        return {"refreshed": False}

    def meta(self):
        other = [a for a in range(3) if a != self.up_ix]
        return {"shape": list(self.grid.shape), "up_ix": self.up_ix,
                "n_slices": self.n_slices(),
                "sdf_range": [round(v, 4) for v in self.sdf_range],
                "row_axis": other[0], "col_axis": other[1],
                "live": self.trainer is not None, "version": self.version}


INDEX_HTML = """<!doctype html><html><head><meta charset="utf-8">
<title>isdf_tpu viewer</title><style>
body{background:#14161a;color:#d7dae0;font:14px system-ui;margin:0}
#bar{padding:8px 14px;background:#1d2026;display:flex;gap:18px;
     align-items:center;flex-wrap:wrap}
.panel{display:inline-block;vertical-align:top;margin:14px;text-align:center}
img{image-rendering:pixelated;border:1px solid #333;max-width:42vw}
input[type=range]{width:220px;vertical-align:middle}
button{background:#2d323b;color:#d7dae0;border:1px solid #444;
       padding:4px 12px;border-radius:4px;cursor:pointer}
#q{color:#8fd18f;min-width:260px;display:inline-block}
#status{color:#9ab}
</style></head><body>
<div id="bar"><b>isdf_tpu SDF viewer</b>
 <span>slice <input type=range id=sl min=0 max=0 value=0>
       <span id=sln></span></span>
 <span>azim <input type=range id=az min=0 max=360 value=45 step=15></span>
 <span>elev <input type=range id=el min=-90 max=90 value=25 step=15></span>
 <button id=rf>refresh from model</button>
 <button id=pp style="display:none">pause</button>
 <span id=ipsw style="display:none">iters/step
   <input type=number id=ips min=0 max=10000 value=0 step=10
          style="width:64px" title="0 = config budget"></span>
 <label id=dmw style="display:none"><input type=checkbox id=dm checked>
   mesh</label>
 <label id=dsw style="display:none"><input type=checkbox id=dsl checked>
   slices</label>
 <span id=q>click the slice to query the SDF</span>
 <span id=status></span></div>
<div class=panel><h3>SDF slice</h3><img id=slice></div>
<div class=panel><h3>mesh</h3><img id=mesh></div>
<div class=panel><h3>scene</h3>
  <div style="margin-bottom:6px">
   azim <input type=range id=saz min=0 max=360 value=45 step=15>
   elev <input type=range id=sel min=-90 max=90 value=25 step=15>
   zoom <input type=range id=szm min=0.5 max=4 value=1 step=0.25>
   <label><input type=checkbox id=smesh checked>mesh</label>
   <label><input type=checkbox id=sfru checked>frustums</label>
   <label><input type=checkbox id=straj checked>traj</label>
   <label><input type=checkbox id=spc>pointcloud</label>
  </div><img id=scene></div>
<div class=panel id=kfp style="display:none"><h3>keyframes</h3>
  <img id=kf style="max-width:88vw"></div>
<script>
let meta=null,v=0;
const $=id=>document.getElementById(id);
async function loadMeta(){meta=await (await fetch('api/meta')).json();
  v=meta.version;$('sl').max=meta.n_slices-1;
  if(+$('sl').value==0)$('sl').value=Math.floor(meta.n_slices/2);
  if(meta.live){$('kfp').style.display='inline-block';
    $('kf').src='api/keyframes.png?v='+v;
    for(const id of['pp','ipsw','dmw','dsw'])
      $(id).style.display='inline-block';
    const c=await (await fetch('api/control')).json();applyCtl(c);}
  upd();}
function applyCtl(c){$('pp').textContent=c.paused?'resume':'pause';
  $('ips').value=c.iters_per_step;$('dm').checked=c.do_mesh;
  $('dsl').checked=c.do_slices;
  $('smesh').checked=c.scene_mesh;$('sfru').checked=c.scene_frustums;
  $('straj').checked=c.scene_traj;$('spc').checked=c.scene_pc;}
async function postCtl(d){const c=await (await fetch('api/control',
  {method:'POST',body:JSON.stringify(d)})).json();applyCtl(c);}
$('pp').onclick=()=>postCtl({paused:$('pp').textContent=='pause'});
$('ips').onchange=()=>postCtl({iters_per_step:+$('ips').value});
$('dm').onchange=()=>postCtl({do_mesh:$('dm').checked});
$('dsl').onchange=()=>postCtl({do_slices:$('dsl').checked});
function upd(){const i=$('sl').value;$('sln').textContent=i;
  $('slice').src=`api/slice/${i}.png?v=${v}`;
  $('mesh').src=`api/render.png?azim=${$('az').value}`+
                `&elev=${$('el').value}&v=${v}`;
  $('scene').src=`api/scene.png?azim=${$('saz').value}`+
                 `&elev=${$('sel').value}&zoom=${$('szm').value}&v=${v}`;}
for(const id of['sl','az','el','saz','sel','szm'])$(id).oninput=upd;
for(const[id,k]of[['smesh','scene_mesh'],['sfru','scene_frustums'],
                  ['straj','scene_traj'],['spc','scene_pc']])
  $(id).onchange=async()=>{await postCtl({[k]:$(id).checked});upd();};
document.addEventListener('keydown',e=>{
  if(e.key=='ArrowLeft'||e.key=='ArrowRight'){
    $('sl').value=+$('sl').value+(e.key=='ArrowRight'?1:-1);upd();}});
$('slice').onclick=async e=>{
  const r=e.target.getBoundingClientRect();
  const row=Math.floor(e.offsetY/r.height*meta.shape[meta.row_axis]);
  const col=Math.floor(e.offsetX/r.width*meta.shape[meta.col_axis]);
  const q=await (await fetch(
    `api/query?i=${$('sl').value}&r=${row}&c=${col}`)).json();
  $('q').textContent=`sdf(${q.point.map(x=>x.toFixed(2))}) = ${q.sdf}`;};
$('rf').onclick=async()=>{   // refresh is serviced by the train loop's
  const r=await (await fetch('api/refresh')).json();  // next monitor tick
  if(!r.pending){await loadMeta();return;}
  $('q').textContent='refresh pending…';
  for(let t=0;t<40;t++){await new Promise(d=>setTimeout(d,500));
    const m=await (await fetch('api/meta')).json();
    if(m.version!=v){await loadMeta();
      $('q').textContent='refreshed';return;}}
  $('q').textContent='refresh pending (loop busy)';};
setInterval(async()=>{const s=await (await fetch('api/status')).json();
  $('status').textContent=s.live?
    `step ${s.steps} · ${s.keyframes} kf · t=${s.sim_time_s}s`+
    (s.paused?' · PAUSED':''):'';
  if(s.live&&s.version!=v){v=s.version;upd();}},3000);
loadMeta();
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    source: ViewerSource = None  # set by SDFWebViewer

    def log_message(self, *a):  # quiet
        pass

    def _send(self, body, ctype, code=200):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        try:
            import time
            self.source.last_request = time.time()
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            s = self.source
            p = u.path.rstrip("/") or "/"
            if p == "/":
                return self._send(INDEX_HTML.encode(), "text/html")
            if p == "/api/meta":
                return self._send(json.dumps(s.meta()).encode(),
                                  "application/json")
            if p == "/api/status":
                return self._send(json.dumps(s.status()).encode(),
                                  "application/json")
            if p == "/api/refresh":
                return self._send(
                    json.dumps(s.request_refresh()).encode(),
                    "application/json")
            if p == "/api/control":
                return self._send(
                    json.dumps(s.get_controls()).encode(),
                    "application/json")
            if p == "/api/query":
                out = s.query(int(q.get("i", 0)), int(q.get("r", 0)),
                              int(q.get("c", 0)))
                return self._send(json.dumps(out).encode(),
                                  "application/json")
            if p.startswith("/api/slice/") and p.endswith(".png"):
                i = int(p[len("/api/slice/"):-len(".png")])
                return self._send(s.slice_png(i), "image/png")
            if p == "/api/render.png":
                return self._send(
                    s.render_png(float(q.get("azim", 45)),
                                 float(q.get("elev", 25))), "image/png")
            if p == "/api/scene.png":
                return self._send(
                    s.scene_png(float(q.get("azim", 45)),
                                float(q.get("elev", 25)),
                                float(q.get("zoom", 1.0))), "image/png")
            if p == "/api/keyframes.png":
                body = s.keyframes_png()
                if body is not None:
                    return self._send(body, "image/png")
            self._send(b"not found", "text/plain", 404)
        except BrokenPipeError:  # client went away mid-image
            pass
        except Exception as e:  # surface errors to the client, keep serving
            self._send(json.dumps({"error": repr(e)}).encode(),
                       "application/json", 500)

    def do_POST(self):  # noqa: N802 (stdlib API)
        """Training controls (reference isdf_window.py:546-712: the GUI's
        play/pause button, iters-per-step slider and content toggles).
        POST /api/control {"paused": bool, "iters_per_step": int,
        "do_mesh": bool, "do_slices": bool} — any subset."""
        try:
            import time
            self.source.last_request = time.time()
            p = urlparse(self.path).path.rstrip("/")
            n = int(self.headers.get("Content-Length") or 0)
            if n > 4096:
                self.close_connection = True
                return self._send(b'{"error":"body too large"}',
                                  "application/json", 413)
            body = self.rfile.read(n) if n else b"{}"
            if p == "/api/control":
                try:
                    d = json.loads(body or b"{}")
                    assert isinstance(d, dict)
                    out = self.source.update_controls(d)
                except (ValueError, TypeError, AssertionError) as e:
                    return self._send(
                        json.dumps({"error": repr(e)}).encode(),
                        "application/json", 400)
                return self._send(json.dumps(out).encode(),
                                  "application/json")
            if p == "/api/refresh":
                return self._send(
                    json.dumps(self.source.request_refresh()).encode(),
                    "application/json")
            self._send(b"not found", "text/plain", 404)
        except BrokenPipeError:
            pass
        except Exception as e:
            self._send(json.dumps({"error": repr(e)}).encode(),
                       "application/json", 500)


class SDFWebViewer:
    """Threaded HTTP server around a ViewerSource."""

    def __init__(self, source: ViewerSource, port: int = 0,
                 host: str = "127.0.0.1"):
        handler = type("Handler", (_Handler,), {"source": source})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        self.source = source
        self._thread = None

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
    ap = argparse.ArgumentParser(description="serve an SDF grid/checkpoint")
    ap.add_argument("--grid", type=str, help=".npy dense SDF grid [D,D,D]")
    ap.add_argument("--extents", type=float, nargs=3, default=None,
                    help="world size of the grid box (default 2 2 2)")
    ap.add_argument("--centre", type=float, nargs=3, default=(0, 0, 0))
    ap.add_argument("--config", type=str,
                    help="serve a Trainer built from this config instead")
    ap.add_argument("--load_checkpoint", type=str, default=None)
    ap.add_argument("--grid_dim", type=int, default=128)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--up", type=int, default=1)
    args = ap.parse_args(argv)

    if args.config:
        from isdf_tpu.utils.jax_setup import honor_platform_env
        honor_platform_env()
        from isdf_tpu.engine.trainer import Trainer
        from isdf_tpu.utils.config import load_config
        trainer = Trainer(load_config(args.config),
                          grid_dim=args.grid_dim)
        if args.load_checkpoint:
            trainer.load_checkpoint(args.load_checkpoint)
        src = ViewerSource.from_trainer(trainer, up_ix=args.up)
    else:
        assert args.grid, "--grid or --config required"
        src = ViewerSource.from_grid(np.load(args.grid),
                                     extents=args.extents,
                                     centre=args.centre, up_ix=args.up)
    viewer = SDFWebViewer(src, port=args.port)
    print(f"serving on http://127.0.0.1:{viewer.port}  (ctrl-c to stop)")
    viewer.httpd.serve_forever()


if __name__ == "__main__":
    main()

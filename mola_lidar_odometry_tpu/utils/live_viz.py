"""Live odometry viewer: a periodically-updating HTTP view of a run.

TPU-host analogue of the reference's interactive GUI
(module/src/LidarOdometry.cpp:1637-2077: nanogui window with the decimated
local-map render, trajectory polyline, stats label block, and pause /
resume / save-map controls).  Headless hosts can't open a window, so the
same surface is served over HTTP instead:

  * ``/``              — self-refreshing page: latest snapshot + stats
  * ``/snapshot.png``  — most recent top-down render (in-memory PNG)
  * ``/stats.json``    — the GUI label block as JSON (quality, sigma,
    est. range, Hz, speed — the reference's five stat labels, :1841-1862)
  * ``/pause`` ``/resume``       — viewer-side pause of the driving loop
  * ``/toggle_active``           — the GUI "active" checkbox (:1941-1943):
    inactive discards incoming observations at the module
  * ``/toggle_mapping``          — the GUI "generate map" checkbox
    (:1944-1961): localization-only against the frozen local map
  * ``/save_map?path=...``       — the "save map" button (:2005-2013)
  * ``/save_trajectory?path=...``— the "save trajectory" button
  * ``/reset``                   — the GUI reset button (:1965-1977)

Control requests mirror how the reference marshals GUI mutations onto the
odometry thread (``enqueue_request``, :2216-2245): they only set flags /
enqueue closures; the driving loop calls :meth:`LiveViewer.on_frame`
between scans, which honors the pause flag, drains the request queue, and
re-renders every ``every_n`` frames.

Usage (the offline CLI wires this behind ``--live-viz PORT``)::

    viewer = LiveViewer(lo, every_n=10)
    viewer.start(port=8731)
    for scan in scans:
        lo.on_lidar_scan(...)
        viewer.on_frame()
    viewer.stop()
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

_PAGE = """<!DOCTYPE html>
<html><head><title>mola-lo-tpu live</title>
<style>body{{font-family:monospace;background:#111;color:#ddd;margin:1em}}
img{{max-width:70vw;border:1px solid #444}}
pre{{display:inline-block;vertical-align:top;margin-left:2em}}
a{{color:#8cf}}</style></head>
<body>
<h3>mola_lidar_odometry_tpu &mdash; live run</h3>
<div>
<img id="snap" src="/snapshot.png" alt="waiting for first snapshot...">
<pre id="stats"></pre>
</div>
<p><a href="#" onclick="fetch('/pause');return false">pause</a> |
<a href="#" onclick="fetch('/resume');return false">resume</a> |
<a href="#" onclick="fetch('/toggle_active');return false">toggle active</a> |
<a href="#" onclick="fetch('/toggle_mapping');return false">toggle mapping</a> |
<a href="#" onclick="fetch('/save_map?path=live_map.mm.npz');return false">save map</a> |
<a href="#" onclick="fetch('/save_trajectory?path=live_traj.tum');return false">save trajectory</a> |
<a href="#" onclick="if(confirm('reset odometry?'))fetch('/reset');return false">reset</a></p>
<script>
async function tick() {{
  try {{
    const r = await fetch('/stats.json');
    const s = await r.json();
    document.getElementById('stats').textContent =
        JSON.stringify(s, null, 2);
    document.getElementById('snap').src = '/snapshot.png?t=' + Date.now();
  }} catch (e) {{}}
}}
setInterval(tick, {period_ms});
tick();
</script></body></html>
"""


class LiveViewer:
    """Serve a live view of a running :class:`LidarOdometry` instance."""

    def __init__(self, lo, every_n: int = 10, refresh_ms: int = 1000):
        self.lo = lo
        self.every_n = max(1, int(every_n))
        self.refresh_ms = refresh_ms
        self.paused = threading.Event()
        self._png: Optional[bytes] = None
        self._save_requests: list = []
        self._frames_seen = 0
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self._t0 = time.time()
        self._lock = threading.Lock()

    # ---- host-side driving loop hooks ------------------------------------

    def enqueue_request(self, fn) -> None:
        """Queue a mutation to run on the odometry thread between scans
        (the reference's enqueue_request contract, :2216-2245)."""
        with self._lock:
            self._save_requests.append(fn)

    def on_frame(self) -> None:
        """Call between scans: honors pause, drains queued requests,
        refreshes the snapshot every ``every_n`` frames."""
        while self.paused.is_set():
            time.sleep(0.05)
        with self._lock:
            reqs, self._save_requests = self._save_requests, []
        for fn in reqs:
            fn()
        self._frames_seen += 1
        if self._frames_seen % self.every_n == 0:
            self.render()

    def render(self) -> None:
        """Re-render the top-down snapshot into the in-memory buffer."""
        from mola_lidar_odometry_tpu.utils.viz import render_snapshot

        buf = io.BytesIO()
        render_snapshot(self.lo, buf, title=f"frame {self._frames_seen}")
        self._png = buf.getvalue()

    def stats(self) -> dict:
        import numpy as _np

        c = self.lo.carry
        dt = time.time() - self._t0
        tw = _np.asarray(c.last_twist)
        return {
            "frames": self.lo.frames_processed,
            "dropped": self.lo.frames_dropped,
            "trajectory_poses": len(self.lo.trajectory),
            "icp_quality": round(float(c.last_icp_quality), 4),
            "icp_iterations": int(float(c.last_icp_iters)),
            "sigma_m": round(float(c.sigma), 4),
            "est_sensor_range_m": round(float(c.est_range), 2),
            "speed_mps": round(float(_np.linalg.norm(tw[:3])), 3),
            "speed_kmh": round(float(_np.linalg.norm(tw[:3])) * 3.6, 2),
            "pose_t": [round(float(v), 3) for v in c.pose_t],
            "wall_s": round(dt, 1),
            "hz": round(self.lo.frames_processed / dt, 2) if dt > 0 else 0.0,
            "paused": self.paused.is_set(),
            "active": bool(self.lo.active),
            "mapping": bool(self.lo.mapping_enabled),
        }

    # ---- HTTP server ------------------------------------------------------

    def start(self, port: int = 8731, host: str = "127.0.0.1") -> int:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    page = _PAGE.format(period_ms=viewer.refresh_ms)
                    self._send(200, "text/html", page.encode())
                elif u.path == "/snapshot.png":
                    png = viewer._png
                    if png is None:
                        self._send(503, "text/plain", b"no snapshot yet")
                    else:
                        self._send(200, "image/png", png)
                elif u.path == "/stats.json":
                    self._send(
                        200, "application/json",
                        json.dumps(viewer.stats()).encode(),
                    )
                elif u.path == "/pause":
                    viewer.paused.set()
                    self._send(200, "text/plain", b"paused")
                elif u.path == "/resume":
                    viewer.paused.clear()
                    self._send(200, "text/plain", b"resumed")
                elif u.path == "/toggle_active":
                    # flips immediately (the reference checkbox writes the
                    # module flag under its own mutex, :1941-1943); the
                    # dispatcher reads it per observation
                    viewer.lo.active = not viewer.lo.active
                    self._send(
                        200, "text/plain",
                        f"active={viewer.lo.active}".encode(),
                    )
                elif u.path == "/toggle_mapping":
                    new_state = not viewer.lo.mapping_enabled
                    viewer.enqueue_request(
                        lambda s=new_state: viewer.lo.set_mapping_enabled(s)
                    )
                    self._send(
                        200, "text/plain", f"mapping={new_state} queued".encode()
                    )
                elif u.path == "/save_map":
                    q = parse_qs(u.query)
                    path = q.get("path", ["live_map.mm.npz"])[0]
                    viewer.enqueue_request(
                        lambda p=path: viewer.lo.save_local_map(p)
                    )
                    self._send(200, "text/plain", f"queued: {path}".encode())
                elif u.path == "/save_trajectory":
                    q = parse_qs(u.query)
                    path = q.get("path", ["live_traj.tum"])[0]
                    viewer.enqueue_request(
                        lambda p=path: viewer.lo.save_trajectory_tum(p)
                    )
                    self._send(200, "text/plain", f"queued: {path}".encode())
                elif u.path == "/reset":
                    viewer.enqueue_request(viewer.lo.reset)
                    self._send(200, "text/plain", b"reset queued")
                else:
                    self._send(404, "text/plain", b"not found")

            do_POST = do_GET

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

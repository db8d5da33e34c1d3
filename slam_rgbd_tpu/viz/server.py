"""Web point-cloud viewer — Three.js frontend + stdlib HTTP backend.

Parity with the reference's web app (SURVEY.md §2 C11/C12): the Express
backend shells out to the native binary per request and parses its stdout
(`Youth.App/Youth.Web/BackEnd/server/server.js:7-29`); here a
`http.server` thread serves `GET /pointcloud` straight from the live
session / recording / PLY (no subprocess round-trip), plus an embedded
Three.js page (orbit + zoom, mirroring the GLFW viewer's mouse controls,
`viewerModule.c:416-440`).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

from slam_rgbd_tpu.viz.pointcloud import pointcloud_json

INDEX_HTML = """<!DOCTYPE html>
<html>
<head>
  <title>slam_rgbd_tpu — point cloud</title>
  <style>body { margin: 0; background: #0b0e14; } #hud { position: fixed;
    top: 8px; left: 10px; color: #9fb2c8; font: 12px monospace; }</style>
</head>
<body>
<div id="hud">slam_rgbd_tpu viewer — drag: orbit, wheel: zoom, r: reload</div>
<script src="https://cdn.jsdelivr.net/npm/three@0.128.0/build/three.min.js"></script>
<script>
const scene = new THREE.Scene();
const camera = new THREE.PerspectiveCamera(60, innerWidth/innerHeight, 0.01, 100);
camera.position.set(0, 0, -2);
const renderer = new THREE.WebGLRenderer({antialias: true});
renderer.setSize(innerWidth, innerHeight);
document.body.appendChild(renderer.domElement);
let cloud = null, theta = 0, phi = 0, dist = 2, dragging = false, px = 0, py = 0;

async function load() {
  const r = await fetch('/pointcloud');
  const data = await r.json();
  const geo = new THREE.BufferGeometry();
  geo.setAttribute('position', new THREE.Float32BufferAttribute(data.positions, 3));
  let mat;
  if (data.colors) {
    geo.setAttribute('color', new THREE.Float32BufferAttribute(data.colors, 3));
    mat = new THREE.PointsMaterial({size: 0.01, vertexColors: true});
  } else {
    mat = new THREE.PointsMaterial({size: 0.01, color: 0x88bbff});
  }
  if (cloud) scene.remove(cloud);
  cloud = new THREE.Points(geo, mat);
  // match the native viewer's (-x, -y, -z) presentation (viewerModule.c:351)
  cloud.scale.set(-1, -1, -1);
  scene.add(cloud);
}
addEventListener('mousedown', e => { dragging = true; px = e.clientX; py = e.clientY; });
addEventListener('mouseup', () => dragging = false);
addEventListener('mousemove', e => {
  if (!dragging) return;
  theta += (e.clientX - px) * 0.005; phi += (e.clientY - py) * 0.005;
  px = e.clientX; py = e.clientY;
});
addEventListener('wheel', e => { dist *= e.deltaY > 0 ? 1.1 : 0.9; });
addEventListener('keydown', e => { if (e.key === 'r') load(); });
function animate() {
  requestAnimationFrame(animate);
  camera.position.set(dist*Math.sin(theta)*Math.cos(phi),
                      dist*Math.sin(phi), -dist*Math.cos(theta)*Math.cos(phi));
  camera.lookAt(0, 0, 0);
  renderer.render(scene, camera);
}
load(); animate();
</script>
</body>
</html>
"""


class PointCloudServer:
    """Serves `/` (viewer page) and `/pointcloud` (JSON payload).

    `source` is a zero-arg callable returning (pts (N,3), colors (N,3)|None)
    — evaluated per request so a live session streams its current map.
    """

    def __init__(self, source: Callable, host: str = "127.0.0.1", port: int = 8080):
        self.source = source
        self.host = host
        self.port = port
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "PointCloudServer":
        source = self.source

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path == "/":
                    body = INDEX_HTML.encode()
                    ctype = "text/html"
                elif self.path == "/pointcloud":
                    pts, colors = source()
                    body = pointcloud_json(pts, colors).encode()
                    ctype = "application/json"
                elif self.path == "/healthz":
                    body = b'{"ok": true}'
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="slam-viz-http"
        )
        self._thread.start()
        return self

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=2)

"""Live interactive front-end: stream rendered frames over HTTP.

The reference presents through SDL/OpenGL on a local window; the TPU
engine's presentation contract is arrays, rendered to RGB frames by
render/scene.py. This tool is the windowing layer: a stdlib HTTP server
that MJPEG-streams live frames to a browser and routes browser input back
through pf.inject_* (clicks select / order units, right-drag pans, keys
arm orders) — a real render front-end with no GL and no dependencies.

Usage:
  python tools/live_viewer.py [--port 8642] [--units 64] [--wh 640x384]
Then open http://localhost:8642/
Endpoints: /          viewer page (canvas + input forwarding)
           /stream    multipart MJPEG of live frames
           /frame.png current frame
           /input     POST {type, x, y, button|key|dx,dy} -> pf.inject_*
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, "/root/repo")

PAGE = """<!doctype html><html><head><title>permafrost_engine_tpu</title>
<style>body{margin:0;background:#111;display:flex;flex-direction:column;
align-items:center;color:#ccc;font-family:monospace}
img{image-rendering:pixelated;cursor:crosshair}</style></head><body>
<h3>permafrost_engine_tpu — live</h3>
<img id=v src=/stream draggable=false>
<p>left-click: select / order &nbsp; right-click: move &nbsp;
m: arm move &nbsp; a: arm attack &nbsp; arrows: pan</p>
<script>
const v=document.getElementById('v');
function send(o){fetch('/input',{method:'POST',body:JSON.stringify(o)})}
function pos(e){const r=v.getBoundingClientRect();
 return {x:(e.clientX-r.left)/r.width, y:(e.clientY-r.top)/r.height}}
v.addEventListener('mousedown',e=>{e.preventDefault();
 send({type:'click',...pos(e),button:e.button===2?3:1})});
v.addEventListener('contextmenu',e=>e.preventDefault());
v.addEventListener('mousemove',e=>{send({type:'motion',...pos(e)})});
window.addEventListener('keydown',e=>{
 if(e.key==='ArrowLeft')send({type:'pan',dx:-20,dy:0});
 else if(e.key==='ArrowRight')send({type:'pan',dx:20,dy:0});
 else if(e.key==='ArrowUp')send({type:'pan',dx:0,dy:20});
 else if(e.key==='ArrowDown')send({type:'pan',dx:0,dy:-20});
 else send({type:'key',key:e.key});});
</script></body></html>"""


class LiveServer:
    """Engine-stepping loop + frame producer shared by all HTTP clients."""

    def __init__(self, engine, camera, w: int = 640, h: int = 384,
                 fps: float = 15.0, step_frames: int = 3):
        from permafrost_engine_tpu.render.scene import SceneRenderer
        self.engine = engine
        self.camera = camera
        self.renderer = SceneRenderer(engine, w, h)
        self.fps = fps
        self.step_frames = step_frames
        # streamed frames carry no OS cursor: compose the engine's cursor
        # glyph (pf cursor styling state) into each frame
        try:
            from permafrost_engine_tpu.script import pf
            if pf._context is not None and pf._context.engine is engine:
                pf._context.cursor["compose"] = True
        except Exception:
            pass
        self.lock = threading.Lock()
        self.frame_jpeg = b""
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()

    def stop(self):
        self.running = False

    def _loop(self):
        from PIL import Image
        while self.running:
            t0 = time.time()
            with self.lock:
                self.engine.step(self.step_frames)
                img = self.renderer.render(self.camera)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", quality=85)
            self.frame_jpeg = buf.getvalue()
            dt = time.time() - t0
            time.sleep(max(0.0, 1.0 / self.fps - dt))

    # -- input (browser sends viewport fractions; scale to virtual res) -----

    def handle_input(self, msg: dict):
        from permafrost_engine_tpu.script import pf
        ctx = pf.context()
        vw, vh = ctx.ui.virtual_resolution
        with self.lock:
            t = msg.get("type")
            if t == "click":
                pf.inject_mouse_click(msg["x"] * vw, msg["y"] * vh,
                                      int(msg.get("button", 1)))
            elif t == "motion":
                pf.inject_mouse_motion(msg["x"] * vw, msg["y"] * vh)
            elif t == "pan":
                self.camera.pan(float(msg.get("dx", 0)) * 5,
                                float(msg.get("dy", 0)) * 5)
            elif t == "key":
                k = msg.get("key", "")
                if k == "m":
                    pf.set_move_on_left_click()
                elif k == "a":
                    pf.set_attack_on_left_click()


def make_handler(server: LiveServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/frame.png":
                from PIL import Image
                with server.lock:
                    img = server.renderer.render(server.camera)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                try:
                    while server.running:
                        jpg = server.frame_jpeg
                        if jpg:
                            self.wfile.write(
                                b"--frame\r\nContent-Type: image/jpeg\r\n"
                                b"Content-Length: "
                                + str(len(jpg)).encode() + b"\r\n\r\n"
                                + jpg + b"\r\n")
                        time.sleep(1.0 / server.fps)
                except (BrokenPipeError, ConnectionResetError):
                    pass
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path == "/input":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    msg = json.loads(self.rfile.read(n) or b"{}")
                    server.handle_input(msg)
                    self.send_response(204)
                    self.end_headers()
                except Exception as e:  # noqa: BLE001 — report to client
                    self.send_error(400, str(e))
            else:
                self.send_error(404)

    return Handler


def default_scenario(units: int):
    from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.script import pf

    cfg = EngineConfig(max_ents=2 * units + 32)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)

    h, w = cfg.field_h, cfg.field_w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    heights = 3 + 3 * np.sin(xx / 24) * np.cos(yy / 20)
    heights[(xx - 60) ** 2 + (yy - 190) ** 2 < 900] = -3.0
    eng.heights = heights.astype(np.float32)

    rng = np.random.default_rng(0)
    half = units
    a = eng.spawn_batch(np.stack([rng.uniform(350, 420, half),
                                  rng.uniform(420, 490, half)], 1)
                        .astype(np.float32), faction=0, max_speed=12.0)
    b = eng.spawn_batch(np.stack([rng.uniform(560, 630, half),
                                  rng.uniform(420, 490, half)], 1)
                        .astype(np.float32), faction=1, max_speed=12.0)
    eng.seek_enemies(b)
    ctx = pf.context()
    ctx.engine = eng
    cam = Camera(pos=np.array([490.0, 110.0, 610.0]), pitch=-42.0, yaw=90.0)
    pf.set_active_camera(cam)
    return eng, cam, a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--units", type=int, default=64)
    ap.add_argument("--wh", default="640x384")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (default: CPU)")
    args = ap.parse_args()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    eng, cam, _ = default_scenario(args.units)
    w, h = (int(x) for x in args.wh.split("x"))
    cam.aspect = w / h
    live = LiveServer(eng, cam, w, h)
    live.start()
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(live))
    print(f"live viewer on http://localhost:{args.port}/ "
          f"({w}x{h}, {args.units} units/side)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        live.stop()


if __name__ == "__main__":
    main()

"""Live progressive preview: a ~150-line localhost viewer.

The reference's defining UX is an OpenGL window that refines while you
orbit (reference main.cpp:114-165, base_graphics.cpp:30-102 —
``glDrawPixels`` + ``SwapBuffers`` each frame, left-drag orbit,
right-click focus).  A TPU renderer has no GPU swapchain, so the display
path is a browser: this module serves a multipart ``x-mixed-replace``
PNG stream (the MJPEG idiom) from a :class:`RenderSession` and maps the
reference's interactions onto HTTP —

* arrow keys / a,d,w,s  → orbit (main.cpp:127-143's left-drag)
* click on the image    → focus at that pixel (main.cpp:144-154
  right-click → TraceRange → focal_depth)
* shift held            → fast-render 1-bounce preview (main.cpp:124)

The render loop runs on the streaming thread; input handlers only mutate
the session under a lock, so interaction never blocks a frame in flight.

    python -m fspt_tpu.render.preview <scene-file> [--port 8787]

then open http://127.0.0.1:8787/ .
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

PAGE = b"""<!doctype html>
<html><head><title>fspt preview</title><style>
 body { background:#111; color:#ccc; font-family:monospace; text-align:center }
 img { image-rendering:pixelated; width:70vw; margin-top:2vh; cursor:crosshair }
</style></head><body>
<div>orbit: a/d/w/s or arrows &middot; click: focus &middot;
 shift: fast preview</div>
<img id=v src="/stream">
<div id=s></div>
<script>
const v = document.getElementById('v'), s = document.getElementById('s');
function send(q) { fetch('/ctl?' + q).then(r => r.text()).then(t => s.textContent = t); }
document.addEventListener('keydown', e => {
  const k = {a:'yaw=-0.1', ArrowLeft:'yaw=-0.1', d:'yaw=0.1',
             ArrowRight:'yaw=0.1', w:'pitch=0.1', ArrowUp:'pitch=0.1',
             s:'pitch=-0.1', ArrowDown:'pitch=-0.1'}[e.key];
  if (k) send(k);
  if (e.key === 'Shift') send('fast=1');
});
document.addEventListener('keyup', e => {
  if (e.key === 'Shift') send('fast=0');
});
v.addEventListener('click', e => {
  const r = v.getBoundingClientRect();
  const x = Math.floor((e.clientX - r.left) / r.width * %W%);
  const y = Math.floor((1 - (e.clientY - r.top) / r.height) * %H%);
  send('focus_x=' + x + '&focus_y=' + y);
});
</script></body></html>"""

BOUNDARY = b"fsptframe"


class PreviewServer:
    """Serve a RenderSession as a live auto-refining browser view."""

    def __init__(self, session, host: str = "127.0.0.1", port: int = 8787,
                 frames_per_update: int = 1):
        self.session = session
        self.lock = threading.Lock()
        self.frames_per_update = frames_per_update
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    page = PAGE.replace(
                        b"%W%", str(outer.session.cfg.width).encode()
                    ).replace(b"%H%", str(outer.session.cfg.height).encode())
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(page)
                elif u.path == "/ctl":
                    msg = outer.control(parse_qs(u.query))
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain")
                    self.end_headers()
                    self.wfile.write(msg.encode())
                elif u.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=" +
                        BOUNDARY.decode())
                    self.end_headers()
                    try:
                        while True:
                            png = outer.next_frame()
                            self.wfile.write(
                                b"--" + BOUNDARY + b"\r\n"
                                b"Content-Type: image/png\r\n"
                                b"Content-Length: " +
                                str(len(png)).encode() + b"\r\n\r\n" +
                                png + b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self.send_response(404)
                    self.end_headers()

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = host, self.httpd.server_address[1]

    # -- interaction (reference main.cpp:117-154) ---------------------------

    def control(self, q) -> str:
        g = lambda k: float(q[k][0]) if k in q else None
        with self.lock:
            s = self.session
            if g("yaw") is not None or g("pitch") is not None:
                s.orbit(g("yaw") or 0.0, g("pitch") or 0.0)
                o = np.asarray(s.camera.origin)
                return f"camera origin ({o[0]:.1f}, {o[1]:.1f}, {o[2]:.1f})"
            if g("focus_x") is not None:
                d = s.focus_at(int(g("focus_x")), int(g("focus_y") or 0))
                return f"Setting focus distance to {d:.2f}"  # main.cpp:151
            if g("fast") is not None:
                s.set_fast_render(bool(int(g("fast"))))
                return f"fast_render={bool(int(g('fast')))}"
        return "ok"

    def next_frame(self) -> bytes:
        from fspt_tpu.utils.image import png_bytes

        with self.lock:
            self.session.refine(self.frames_per_update)
            # Row 0 is the bottom scanline (camera up = +Y) — flip.
            return png_bytes(self.session.snapshot()[::-1])

    def serve_forever(self):
        print(f"preview at http://{self.host}:{self.port}/ "
              f"(path: {self.session.path_name or 'pending first frame'})")
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def main(argv=None):
    import argparse
    import sys

    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--spp", type=int, default=1)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.interactive import RenderSession
    from fspt_tpu.scene.parser import load_scene

    session = RenderSession(
        load_scene(args.file),
        RenderConfig(width=args.width, height=args.height, spp=args.spp))
    PreviewServer(session, port=args.port).serve_forever()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

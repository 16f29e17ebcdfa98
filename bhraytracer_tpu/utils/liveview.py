"""Live render view over HTTP — the headless replacement for the reference
viewport's in-progress window (viewport.cpp:94-139 creates the GLUT window;
344-391 redraws the partial render as scanlines finish).

A daemon thread serves:
  /           tiny HTML page that re-fetches the image ~1 Hz
  /image.png  the current bytes of the render's output PNG (rewritten by
              --progressive after every pass)
  /status     JSON {passes_done, spp_done, spp_total, elapsed_s}

stdlib http.server only; no dependencies, dies with the process.
"""

from __future__ import annotations

import http.server
import json
import os
import threading
import time

_PAGE = b"""<!doctype html>
<html><head><title>bhraytracer_tpu live render</title><style>
body{background:#111;color:#ccc;font-family:monospace;text-align:center}
img{image-rendering:pixelated;max-width:95vw;max-height:85vh;
    border:1px solid #333}
</style></head><body>
<h3 id="s">rendering&hellip;</h3>
<img id="im" src="/image.png">
<script>
async function tick(){
  try{
    const r = await fetch('/status'); const j = await r.json();
    document.getElementById('s').textContent =
      `pass ${j.passes_done} - ${j.spp_done}/${j.spp_total} spp - ` +
      `${j.elapsed_s.toFixed(1)}s` + (j.finished ? ' - done' : '');
    document.getElementById('im').src = '/image.png?' + Date.now();
  }catch(e){}
  setTimeout(tick, 1000);
}
tick();
</script></body></html>"""


class LiveView:
    """Start with serve(); update state via note_pass(); finish()."""

    def __init__(self, image_path: str, spp_total: int):
        self.image_path = image_path
        self.state = {"passes_done": 0, "spp_done": 0, "spp_total": spp_total,
                      "elapsed_s": 0.0, "finished": False}
        self._t0 = time.time()
        self._httpd = None

    def note_pass(self, passes_done: int, spp_done: int) -> None:
        self.state.update(passes_done=passes_done, spp_done=spp_done,
                          elapsed_s=time.time() - self._t0)

    def finish(self) -> None:
        self.state.update(finished=True, elapsed_s=time.time() - self._t0)

    def serve(self, port: int) -> int:
        """Bind and serve on a daemon thread; returns the bound port."""
        view = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _PAGE)
                elif path == "/image.png":
                    try:
                        with open(view.image_path, "rb") as f:
                            self._send(200, "image/png", f.read())
                    except OSError:
                        self._send(404, "text/plain", b"not rendered yet")
                elif path == "/status":
                    view.state["elapsed_s"] = (
                        view.state["elapsed_s"] if view.state["finished"]
                        else time.time() - view._t0)
                    self._send(200, "application/json",
                               json.dumps(view.state).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port),
                                                      Handler)
        th = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        th.start()
        return self._httpd.server_address[1]

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None

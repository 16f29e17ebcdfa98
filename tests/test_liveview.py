"""Live render view HTTP server (utils/liveview.py) — the headless stand-in
for the reference viewport's in-progress window (viewport.cpp:94-139)."""

import json
import urllib.request

import numpy as np

from bhraytracer_tpu.utils.liveview import LiveView
from bhraytracer_tpu.utils.png import write_png


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_liveview_serves_page_image_and_status(tmp_path):
    png = tmp_path / "render.png"
    view = LiveView(str(png), spp_total=8)
    port = view.serve(0)  # ephemeral port
    try:
        # page up before any image exists; image 404s cleanly
        code, ctype, body = _get(port, "/")
        assert code == 200 and ctype == "text/html" and b"image.png" in body
        code, _, _ = _get_allow_404(port, "/image.png")
        assert code == 404

        write_png(str(png), np.zeros((4, 4, 3), np.uint8))
        code, ctype, body = _get(port, "/image.png")
        assert code == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        view.note_pass(3, 3)
        code, ctype, body = _get(port, "/status")
        st = json.loads(body)
        assert st["passes_done"] == 3 and st["spp_done"] == 3
        assert st["spp_total"] == 8 and not st["finished"]

        view.finish()
        _, _, body = _get(port, "/status")
        assert json.loads(body)["finished"]
    finally:
        view.shutdown()


def _get_allow_404(port, path):
    try:
        return _get(port, path)
    except urllib.error.HTTPError as e:
        return e.code, None, e.read()

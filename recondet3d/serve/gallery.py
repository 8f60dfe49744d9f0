"""Static gallery server (reference: depth_anything_3/services/gallery.py
— static file serving of exported scenes + a manifest endpoint)."""

from __future__ import annotations

import functools
import json
import os
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["serve_gallery"]


def serve_gallery(root: str, host: str = "127.0.0.1", port: int = 8100):
    root = os.path.abspath(root)

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=root, **kw)

        def do_GET(self):
            if self.path == "/manifest":
                entries = []
                for dirpath, _, files in os.walk(root):
                    rel = os.path.relpath(dirpath, root)
                    scene_files = [f for f in files if f.endswith((".glb", ".ply", ".npz"))]
                    if scene_files:
                        entries.append(dict(dir=rel, files=sorted(scene_files)))
                body = json.dumps(entries).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            super().do_GET()

    ThreadingHTTPServer((host, port), Handler).serve_forever()

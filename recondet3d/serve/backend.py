"""Model-resident inference HTTP backend.

Re-implementation of the reference FastAPI service
(reference: depth_anything_3/services/backend.py:99-1417 — ModelManager
keeping the model loaded, a worker-thread task queue, endpoints for
inference / task status / memory / health, stale-task cleanup, and a
gallery manifest). FastAPI/uvicorn are absent from this image, so the
same surface is served with the stdlib ThreadingHTTPServer — no
dependencies, same JSON contract:

  POST /inference        {"images": [paths...], "export_format": ...}
  GET  /status/<task_id>
  GET  /tasks
  GET  /health
  GET  /device-memory    (the reference's /gpu-memory)
  GET  /gallery/manifest

Plus a browser app replacing the reference's gradio UI
(reference: app/gradio_app.py — upload images, run, inspect outputs;
gradio is absent from this image, so /app serves a dependency-free HTML
page with multipart upload, task polling and output downloads):

  GET  /app              upload + results page
  POST /upload           multipart images -> queued inference task
  GET  /files/<task>/<f> download an export artifact
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Dict, Optional

from recondet3d.utils.logger import get_logger

logger = get_logger("recondet3d.serve")

__all__ = ["ModelManager", "start_server", "create_server"]

STALE_TASK_SECONDS = 3600


class ModelManager:
    """Keeps the DA3 model resident; runs queued inference tasks on a
    worker thread (reference: backend.py ModelManager + task loop)."""

    def __init__(self, model_name: str, cache_dir: str = "ckpts", workdir: str = "da3_backend"):
        self.model_name = model_name
        self.cache_dir = cache_dir
        self.workdir = os.path.abspath(workdir)
        os.makedirs(self.workdir, exist_ok=True)
        self._model = None
        self._lock = threading.Lock()
        self.tasks: Dict[str, dict] = {}
        self.queue: "Queue[str]" = Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._cleaner = threading.Thread(target=self._cleanup_loop, daemon=True)

    def start(self):
        self._worker.start()
        self._cleaner.start()

    def stop(self):
        self._stop.set()

    @property
    def model(self):
        with self._lock:
            if self._model is None:
                from recondet3d.api import DepthAnything3

                logger.info(f"loading model {self.model_name}")
                self._model = DepthAnything3.from_pretrained(
                    self.model_name, cache_dir=self.cache_dir
                )
            return self._model

    def reload(self):
        with self._lock:
            self._model = None

    def submit(self, payload: dict) -> str:
        task_id = uuid.uuid4().hex[:12]
        self.tasks[task_id] = dict(
            id=task_id, status="queued", created=time.time(), payload=payload,
            result=None, error=None,
        )
        self.queue.put(task_id)
        return task_id

    def _run(self):
        while not self._stop.is_set():
            try:
                task_id = self.queue.get(timeout=0.5)
            except Empty:
                continue
            task = self.tasks.get(task_id)
            if task is None:
                continue
            task["status"] = "running"
            task["started"] = time.time()
            try:
                task["result"] = self._infer(task_id, task["payload"])
                task["status"] = "done"
            except Exception as e:  # noqa: BLE001
                task["status"] = "failed"
                task["error"] = f"{e}\n{traceback.format_exc()}"
                logger.error(f"task {task_id} failed: {e}")
            task["finished"] = time.time()

    def _infer(self, task_id: str, payload: dict) -> dict:
        images = payload["images"]
        export_dir = os.path.join(self.workdir, "tasks", task_id)
        pred = self.model.inference(
            images,
            export_dir=export_dir,
            export_format=payload.get("export_format", "mini_npz"),
            process_res=int(payload.get("process_res", 504)),
            infer_gs=bool(payload.get("infer_gs", False)),
            use_ray_pose=bool(payload.get("use_ray_pose", False)),
            ref_view_strategy=payload.get("ref_view_strategy", "saddle_balanced"),
        )
        return dict(
            export_dir=export_dir,
            depth_shape=list(pred.depth.shape),
            num_views=int(pred.depth.shape[0]),
        )

    def _cleanup_loop(self):
        """Drop stale finished tasks (reference: backend.py:392-457)."""
        while not self._stop.is_set():
            now = time.time()
            stale = [
                tid for tid, t in list(self.tasks.items())
                if t["status"] in ("done", "failed")
                and now - t.get("finished", now) > STALE_TASK_SECONDS
            ]
            for tid in stale:
                self.tasks.pop(tid, None)
            self._stop.wait(60)

    def device_memory(self) -> dict:
        """HBM usage (the reference's /gpu-memory, backend.py:1235)."""
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            return {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "platform": jax.default_backend(),
            }
        except Exception as e:  # noqa: BLE001
            return {"error": str(e)}

    def gallery_manifest(self) -> list:
        tasks_dir = os.path.join(self.workdir, "tasks")
        if not os.path.isdir(tasks_dir):
            return []
        out = []
        for tid in sorted(os.listdir(tasks_dir)):
            d = os.path.join(tasks_dir, tid)
            out.append(dict(task_id=tid, files=sorted(os.listdir(d))))
        return out


def create_server(manager: ModelManager, host: str = "127.0.0.1", port: int = 8000):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.info("%s " + fmt, self.address_string(), *args)

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/dashboard"):
                html = _dashboard_html(manager)
                body = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/health":
                self._json({"status": "ok", "model": manager.model_name})
            elif self.path in ("/device-memory", "/gpu-memory"):
                self._json(manager.device_memory())
            elif self.path == "/tasks":
                self._json(
                    {tid: {k: t[k] for k in ("status", "created")}
                     for tid, t in manager.tasks.items()}
                )
            elif self.path.startswith("/status/"):
                tid = self.path.split("/")[-1]
                t = manager.tasks.get(tid)
                if t is None:
                    self._json({"error": "unknown task"}, 404)
                else:
                    self._json({k: t[k] for k in ("id", "status", "result", "error")})
            elif self.path == "/gallery/manifest":
                self._json(manager.gallery_manifest())
            elif self.path == "/app":
                body = _app_html().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/files/"):
                # /files/<task_id>/<filename> — confined to the tasks dir
                parts = self.path.split("/", 3)
                if len(parts) != 4 or "/" in parts[3] or ".." in self.path:
                    return self._json({"error": "bad path"}, 400)
                root = os.path.join(manager.workdir, "tasks")
                full = os.path.realpath(os.path.join(root, parts[2], parts[3]))
                if not full.startswith(os.path.realpath(root) + os.sep) or \
                        not os.path.isfile(full):
                    return self._json({"error": "not found"}, 404)
                data = open(full, "rb").read()
                ctype = {
                    ".png": "image/png", ".jpg": "image/jpeg",
                    ".glb": "model/gltf-binary", ".json": "application/json",
                }.get(os.path.splitext(full)[1], "application/octet-stream")
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path == "/upload":
                ctype = self.headers.get("Content-Type", "")
                if "multipart/form-data" not in ctype:
                    return self._json({"error": "multipart form required"}, 400)
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                files, fields = _parse_multipart(body, ctype)
                if not files:
                    return self._json({"error": "no images uploaded"}, 400)
                updir = os.path.join(
                    manager.workdir, "uploads", uuid.uuid4().hex[:12]
                )
                os.makedirs(updir, exist_ok=True)
                paths = []
                for name, data in files:
                    safe = os.path.basename(name) or f"img{len(paths)}.png"
                    p = os.path.join(updir, safe)
                    with open(p, "wb") as f:
                        f.write(data)
                    paths.append(p)
                task_id = manager.submit(dict(
                    images=paths,
                    export_format=fields.get("export_format", "depth_vis"),
                ))
                self._json({"task_id": task_id, "status": "queued"})
            elif self.path == "/inference":
                length = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    return self._json({"error": "bad json"}, 400)
                if not payload.get("images"):
                    return self._json({"error": "'images' required"}, 400)
                task_id = manager.submit(payload)
                self._json({"task_id": task_id, "status": "queued"})
            elif self.path == "/reload":
                manager.reload()
                self._json({"status": "reloading"})
            else:
                self._json({"error": "not found"}, 404)

    return ThreadingHTTPServer((host, port), Handler)


def _dashboard_html(manager: ModelManager) -> str:
    """Status dashboard (reference: backend.py serves a dashboard HTML
    page with model/task/GPU status)."""
    mem = manager.device_memory()
    rows = "".join(
        f"<tr><td>{tid}</td><td>{t['status']}</td>"
        f"<td>{time.strftime('%H:%M:%S', time.localtime(t['created']))}</td></tr>"
        for tid, t in sorted(manager.tasks.items())
    )
    in_use = (mem.get("bytes_in_use") or 0) / 2 ** 30
    limit = (mem.get("bytes_limit") or 0) / 2 ** 30
    return f"""<!doctype html><html><head><title>recondet3d backend</title>
<style>body{{font-family:monospace;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #888;padding:4px 10px}}</style></head><body>
<h2>recondet3d inference backend</h2>
<p>model: <b>{manager.model_name}</b> &middot; platform: {mem.get('platform', '?')}
&middot; HBM: {in_use:.2f} / {limit:.2f} GiB</p>
<p>POST /inference {{"images": [...]}} &middot; GET /status/&lt;id&gt; &middot;
GET /tasks &middot; GET /device-memory &middot; GET /gallery/manifest</p>
<h3>tasks ({len(manager.tasks)})</h3>
<table><tr><th>id</th><th>status</th><th>created</th></tr>{rows}</table>
</body></html>"""


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser (stdlib-only; the cgi module is
    deprecated). Returns ([(filename, bytes)], {field: value})."""
    import re

    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return [], {}
    boundary = m.group(1).encode()
    files, fields = [], {}
    for part in body.split(b"--" + boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        head, data = part.split(b"\r\n\r\n", 1)
        head_s = head.decode(errors="replace")
        name_m = re.search(r'name="([^"]*)"', head_s)
        file_m = re.search(r'filename="([^"]*)"', head_s)
        if file_m and file_m.group(1):
            files.append((file_m.group(1), data))
        elif name_m:
            fields[name_m.group(1)] = data.decode(errors="replace").strip()
    return files, fields


def _app_html() -> str:
    """Upload/run/inspect page (the reference gradio app's role,
    reference: app/gradio_app.py:1-724 — served dependency-free)."""
    return """<!doctype html><html><head><title>recondet3d</title>
<style>body{font-family:sans-serif;max-width:780px;margin:2em auto}
img{max-width:240px;margin:4px;border:1px solid #ccc}
.task{border:1px solid #888;padding:10px;margin:10px 0;border-radius:6px}
</style></head><body>
<h2>recondet3d &mdash; multi-view 3D reconstruction</h2>
<form id=f>
<input type=file id=imgs multiple accept="image/*">
<select id=fmt><option>depth_vis</option><option>glb</option>
<option>mini_npz</option><option>gs_ply</option></select>
<button type=submit>Run</button></form>
<div id=tasks></div>
<script>
const tasks = {};
document.getElementById('f').onsubmit = async (e) => {
  e.preventDefault();
  const fd = new FormData();
  for (const f of document.getElementById('imgs').files) fd.append('images', f);
  fd.append('export_format', document.getElementById('fmt').value);
  const r = await fetch('/upload', {method: 'POST', body: fd});
  const j = await r.json();
  if (j.task_id) { tasks[j.task_id] = 'queued'; poll(j.task_id); }
};
async function poll(tid) {
  const el = document.createElement('div');
  el.className = 'task'; el.id = 't' + tid;
  el.textContent = tid + ': queued';
  document.getElementById('tasks').prepend(el);
  while (true) {
    const j = await (await fetch('/status/' + tid)).json();
    el.textContent = tid + ': ' + j.status;
    if (j.status === 'done') { render(tid, el); break; }
    if (j.status === 'failed') { el.textContent += ' — ' + j.error; break; }
    await new Promise(r => setTimeout(r, 1500));
  }
}
async function render(tid, el) {
  const man = await (await fetch('/gallery/manifest')).json();
  const entry = man.find(m => m.task_id === tid);
  if (!entry) return;
  for (const f of entry.files) {
    const url = '/files/' + tid + '/' + f;
    if (f.endsWith('.png') || f.endsWith('.jpg')) {
      const img = document.createElement('img'); img.src = url; el.appendChild(img);
    } else {
      const a = document.createElement('a'); a.href = url; a.textContent = ' ' + f;
      a.download = f; el.appendChild(a);
    }
  }
}
</script></body></html>"""


def start_server(model_name: str, cache_dir: str = "ckpts", host: str = "127.0.0.1",
                 port: int = 8000, workdir: str = "da3_backend"):
    manager = ModelManager(model_name, cache_dir, workdir)
    manager.start()
    server = create_server(manager, host, port)
    logger.info(f"serving on http://{host}:{port}")
    try:
        server.serve_forever()
    finally:
        manager.stop()

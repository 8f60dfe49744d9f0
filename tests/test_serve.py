"""Backend HTTP service: submit a task against the real API with synthetic
images, poll status, check endpoints (no external deps — stdlib client)."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from recondet3d.serve.backend import ModelManager, create_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("backend"))
    mgr = ModelManager("da3-small", cache_dir="/nonexistent", workdir=workdir)
    mgr.start()
    srv = create_server(mgr, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", mgr, workdir
    srv.shutdown()
    mgr.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def test_health_and_memory(server):
    url, _, _ = server
    h = _get(url + "/health")
    assert h["status"] == "ok"
    assert "platform" in _get(url + "/device-memory")


def test_dashboard(server):
    url, _, _ = server
    with urllib.request.urlopen(url + "/dashboard", timeout=10) as r:
        html = r.read().decode()
    assert "recondet3d" in html and "tasks" in html


def test_inference_task_roundtrip(server, tmp_path):
    url, _, workdir = server
    import cv2

    paths = []
    rng = np.random.default_rng(0)
    for i in range(2):
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (90, 160, 3), np.uint8))
        paths.append(p)

    req = urllib.request.Request(
        url + "/inference",
        data=json.dumps(dict(images=paths, export_format="mini_npz",
                             process_res=56)).encode(),
        headers={"Content-Type": "application/json"},
    )
    task = _get_post(req)
    tid = task["task_id"]
    deadline = time.time() + 300
    status = None
    while time.time() < deadline:
        status = _get(f"{url}/status/{tid}")
        if status["status"] in ("done", "failed"):
            break
        time.sleep(1)
    assert status["status"] == "done", status.get("error")
    assert status["result"]["num_views"] == 2
    assert os.path.exists(os.path.join(status["result"]["export_dir"],
                                       "prediction_mini.npz"))
    manifest = _get(url + "/gallery/manifest")
    assert any(e["task_id"] == tid for e in manifest)


def _get_post(req):
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())

"""Backend HTTP service: submit a task against the real API with synthetic
images, poll status, check endpoints (no external deps — stdlib client)."""

import json
import os
import threading
import time
import urllib.error
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


def _multipart(files, fields):
    """files: [(field, name, bytes)]"""
    b = b"----recondet3dboundary"
    out = []
    for field, name, data in files:
        out += [b"--" + b, f'Content-Disposition: form-data; name="{field}"; '
                f'filename="{name}"'.encode(), b"", data]
    for k, v in fields.items():
        out += [b"--" + b, f'Content-Disposition: form-data; name="{k}"'.encode(),
                b"", str(v).encode()]
    out += [b"--" + b + b"--", b""]
    return b"\r\n".join(out), f"multipart/form-data; boundary={b.decode()}"


def _wait_done(url, tid, timeout=300):
    deadline = time.time() + timeout
    while time.time() < deadline:
        status = _get(f"{url}/status/{tid}")
        if status["status"] in ("done", "failed"):
            return status
        time.sleep(1)
    return status


def test_webapp_scene_endpoints(server):
    """Upload via the web app's multipart path, then drive every scene
    endpoint the SPA uses (viewer points, depth/image, measure, meta)."""
    url, _, workdir = server
    import cv2

    rng = np.random.default_rng(1)
    files = []
    for i in range(2):
        ok, buf = cv2.imencode(".png", rng.integers(0, 255, (90, 160, 3), np.uint8))
        files.append(("images", f"img{i}.png", buf.tobytes()))
    body, ctype = _multipart(files, dict(export_format="depth_vis",
                                         ref_view_strategy="first"))
    req = urllib.request.Request(url + "/upload", data=body,
                                 headers={"Content-Type": ctype})
    tid = _get_post(req)["task_id"]
    status = _wait_done(url, tid)
    assert status["status"] == "done", status.get("error")

    meta = _get(f"{url}/scene/{tid}/meta")
    assert meta["num_views"] == 2 and meta["height"] > 0
    assert len(meta["frusta"]) == 2 and len(meta["frusta"][0]) == 8

    with urllib.request.urlopen(
            f"{url}/scene/{tid}/points.bin?max=5000&conf=30", timeout=30) as r:
        pts = np.frombuffer(r.read(), "<f4").reshape(-1, 6)
    assert 0 < len(pts) <= 5000
    assert np.isfinite(pts).all()

    for ep, magic in [(f"depth/0.png", b"\x89PNG"), (f"image/1.jpg", b"\xff\xd8")]:
        with urllib.request.urlopen(f"{url}/scene/{tid}/{ep}", timeout=30) as r:
            assert r.read(4)[:len(magic)] == magic, ep

    m = _get(f"{url}/scene/{tid}/measure?view=0&u=0.5&v=0.5")
    assert m["view"] == 0 and ("depth" in m)

    with urllib.request.urlopen(url + "/app", timeout=10) as r:
        html = r.read().decode()
    assert "Point Cloud" in html and "webgl" in html and "measure" in html

    # gs_video on a scene without gaussians must 400, not 500
    req = urllib.request.Request(f"{url}/scene/{tid}/gs_video",
                                 data=b"{}",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_webapp_video_upload(server, tmp_path):
    """Video upload -> server-side frame extraction -> reconstruction."""
    url, _, _ = server
    import cv2

    vp = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 90))
    rng = np.random.default_rng(2)
    for _ in range(25):
        w.write(rng.integers(0, 255, (90, 160, 3), np.uint8))
    w.release()
    body, ctype = _multipart([("video", "clip.mp4", open(vp, "rb").read())],
                             dict(s_time_interval=1.0, export_format="mini_npz"))
    req = urllib.request.Request(url + "/upload", data=body,
                                 headers={"Content-Type": ctype})
    tid = _get_post(req)["task_id"]
    status = _wait_done(url, tid)
    assert status["status"] == "done", status.get("error")
    # 25 frames at 10 fps sampled every 1 s -> 3 frames
    assert status["result"]["num_views"] == 3


def test_gallery_server(tmp_path):
    """Group/scene manifests + SPA + GLB fetch (reference: services/
    gallery.py build_group_list/build_group_manifest + HTML_PAGE)."""
    import threading

    from recondet3d.data.export.glb import write_glb_pointcloud
    from recondet3d.serve.gallery import create_gallery_server

    root = tmp_path / "gal"
    scene = root / "outdoor" / "scene_a"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    write_glb_pointcloud(str(scene / "scene.glb"),
                         rng.normal(size=(100, 3)).astype(np.float32),
                         colors=rng.random((100, 3)).astype(np.float32))
    import cv2

    cv2.imwrite(str(scene / "scene.jpg"),
                rng.integers(0, 255, (40, 60, 3), np.uint8))
    dv = scene / "depth_vis"
    dv.mkdir()
    cv2.imwrite(str(dv / "depth_0.png"),
                rng.integers(0, 255, (40, 60, 3), np.uint8))

    srv = create_gallery_server(str(root), "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        groups = _get(url + "/manifest.json")["groups"]
        assert [g["id"] for g in groups] == ["outdoor"]
        man = _get(url + "/manifest/outdoor.json")
        assert len(man["items"]) == 1
        item = man["items"][0]
        assert item["model"] == "/outdoor/scene_a/scene.glb"
        assert item["thumbnail"] == "/outdoor/scene_a/scene.jpg"
        assert item["depth_images"] == ["/outdoor/scene_a/depth_vis/depth_0.png"]
        with urllib.request.urlopen(url + "/", timeout=10) as r:
            html = r.read().decode()
        assert "loadGLB" in html and "manifest.json" in html
        with urllib.request.urlopen(url + item["model"], timeout=10) as r:
            assert r.read(4) == b"glTF"
        # directory listings disabled
        try:
            urllib.request.urlopen(url + "/outdoor/", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()

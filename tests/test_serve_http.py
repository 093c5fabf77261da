"""HTTP serving front-end (gcanet_tpu/serve_http.py): endpoint routing,
payload codecs, dynamic micro-batching over the compiled batch shape.

The reference has no serving surface (its inference path is the trainer's
eval loop, trainer_new.py:396); this layer is deployment capability on top
of serve.py's Predictor, so the tests drive a real ThreadingHTTPServer over
a tiny random-init model on CPU.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from gcanet_tpu.config import Config, GroupingConfig, InstanceHeadConfig


def _tiny_cfg(tmp, **kw):
    base = dict(
        num_points=160, batch_size=2, nn_nb=10, offset_knn=6,
        offset_keypoints=20, max_instances=16, log_dir=str(tmp), max_epoch=1,
        grouping=GroupingConfig(radius=0.1, min_npoint=5, cc_max_iters=16),
        instance_head=InstanceHeadConfig(grid_size=8, max_proposals=16))
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from gcanet_tpu.serve_http import PredictionServer

    cfg = _tiny_cfg(tmp_path_factory.mktemp("srv"))
    srv = PredictionServer(cfg, checkpoint_dir=None, family="abc",
                           max_wait_ms=5.0)
    ready = threading.Event()
    # port=0: OS-assigned ephemeral port (the fixture reads the bound port
    # back below), so parallel/repeated runs never collide (ADVICE r3).
    t = threading.Thread(target=srv.serve,
                         kwargs=dict(host="127.0.0.1", port=0,
                                     ready_event=ready),
                         daemon=True)
    t.start()
    assert ready.wait(30)
    port = srv._httpd.server_address[1]
    yield srv, cfg, f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, body, content_type="application/json", accept=""):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", content_type)
    if accept:
        req.add_header("Accept", accept)
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _cloud(cfg, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(size=(cfg.num_points, 3)).astype(np.float32)
    nrm = rng.normal(size=(cfg.num_points, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return xyz, nrm


def test_healthz(server):
    _, cfg, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["num_points"] == cfg.num_points


def test_predict_json_roundtrip(server):
    _, cfg, base = server
    xyz, nrm = _cloud(cfg)
    body = json.dumps({"xyz": xyz.tolist(), "normals": nrm.tolist()}).encode()
    status, ctype, payload = _post(base + "/v1/predict", body)
    assert status == 200, payload
    res = json.loads(payload)
    assert len(res["types"]) == cfg.num_points
    assert len(res["instance_labels"]) == cfg.num_points
    for inst in res["instances"]:
        assert {"label_id", "conf", "npoint", "pred_mask"} <= set(inst)
        assert inst["pred_mask"]["length"] == cfg.num_points


def test_predict_npz_in_npz_out(server):
    _, cfg, base = server
    xyz, nrm = _cloud(cfg, seed=1)
    buf = io.BytesIO()
    np.savez(buf, xyz=xyz, normals=nrm)
    status, ctype, payload = _post(base + "/v1/predict", buf.getvalue(),
                                   content_type="application/x-npz",
                                   accept="application/x-npz")
    assert status == 200
    assert "npz" in ctype
    with np.load(io.BytesIO(payload)) as z:
        assert z["type_per_point"].shape == (cfg.num_points,
                                             cfg.num_primitives)
        assert z["instance_labels"].shape == (cfg.num_points,)
        insts = json.loads(bytes(z["instances_json"]).decode())
    assert isinstance(insts, list)


def test_predict_batch_and_shape_errors(server):
    _, cfg, base = server
    b = cfg.batch_size
    rng = np.random.RandomState(2)
    xyz = rng.uniform(size=(b, cfg.num_points, 3)).astype(np.float32)
    nrm = rng.normal(size=(b, cfg.num_points, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, xyz=xyz, normals=nrm)
    status, _, payload = _post(base + "/v1/predict_batch", buf.getvalue(),
                               content_type="application/x-npz")
    assert status == 200, payload
    res = json.loads(payload)
    assert len(res) == b
    assert all(len(r["types"]) == cfg.num_points for r in res)

    # wrong N -> 400 with a readable message
    bad = json.dumps({"xyz": [[0, 0, 0]], "normals": [[0, 0, 1]]}).encode()
    status, _, payload = _post(base + "/v1/predict", bad)
    assert status == 400
    assert "xyz must be" in json.loads(payload)["error"]

    # missing arrays -> 400
    status, _, payload = _post(base + "/v1/predict", b"{}")
    assert status == 400

    # unknown route -> 404
    status, _, _ = _post(base + "/v1/nope", b"{}")
    assert status == 404


def test_bad_aux_shape_rejected_and_server_survives(server):
    """ADVICE r3 high: a malformed aux must be a 400, never a batcher-thread
    crash — and the endpoint keeps serving afterwards."""
    _, cfg, base = server
    xyz, nrm = _cloud(cfg, seed=20)
    # right xyz, wrong normals shape (would have np.stack-crashed the loop)
    body = json.dumps({"xyz": xyz.tolist(),
                       "normals": nrm[: cfg.num_points // 2].tolist()}
                      ).encode()
    status, _, payload = _post(base + "/v1/predict", body)
    assert status == 400
    assert "'normals' must be" in json.loads(payload)["error"]

    # wrong batch aux -> 400 too
    b = cfg.batch_size
    buf = io.BytesIO()
    np.savez(buf, xyz=np.zeros((b, cfg.num_points, 3), np.float32),
             normals=np.zeros((b, cfg.num_points, 4), np.float32))
    status, _, payload = _post(base + "/v1/predict_batch", buf.getvalue(),
                               content_type="application/x-npz")
    assert status == 400

    # the batcher is still alive: a good request completes
    good = json.dumps({"xyz": xyz.tolist(), "normals": nrm.tolist()}).encode()
    status, _, payload = _post(base + "/v1/predict", good)
    assert status == 200, payload


def test_batcher_loop_failure_surfaces_to_all_waiters():
    """Any exception inside the batcher loop (incl. pre-dispatch stacking)
    sets the error on every collected waiter instead of killing the daemon
    thread and wedging future submits."""
    from gcanet_tpu.serve_http import DynamicBatcher

    calls = {"n": 0}

    def flaky(xyz, aux):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device fell over")
        return [{"ok": True} for _ in range(xyz.shape[0])]

    b = DynamicBatcher(flaky, batch_size=2, max_wait_ms=1.0,
                       submit_timeout_s=30.0)
    one = np.zeros((4, 3), np.float32)
    with pytest.raises(RuntimeError, match="device fell over"):
        b.submit(one, one)
    # loop survived; next submit succeeds
    assert b.submit(one, one) == {"ok": True}

    # ragged aux reaching the loop directly (bypassing handle()'s
    # validation) must also error the waiter, not kill the thread
    import queue as _q
    slot, done = {}, threading.Event()
    b._q.put((one, np.zeros((3, 3), np.float32), slot, done))
    slot2, done2 = {}, threading.Event()
    b._q.put((one, one, slot2, done2))
    assert done.wait(30) and done2.wait(30)
    assert "error" in slot and "error" in slot2
    assert b.submit(one, one) == {"ok": True}
    assert b._thread.is_alive()


def test_dynamic_batching_concurrent_requests(server):
    """Two concurrent predict() calls should share one padded dispatch and
    both complete with per-request results."""
    _, cfg, base = server
    results = {}

    def call(i):
        xyz, nrm = _cloud(cfg, seed=10 + i)
        body = json.dumps({"xyz": xyz.tolist(),
                           "normals": nrm.tolist()}).encode()
        results[i] = _post(base + "/v1/predict", body)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert set(results) == {0, 1}
    for status, _, payload in results.values():
        assert status == 200
        assert len(json.loads(payload)["types"]) == cfg.num_points


def test_predict_type_sharded_route(server):
    """Oversized cloud (4x the compiled num_points) through the sharded
    trunk route; also the N-not-divisible and wrong-shape 400s."""
    import jax

    srv, cfg, base = server
    d = len(jax.devices())
    big_n = cfg.num_points * 4
    big_n -= big_n % d
    rng = np.random.RandomState(7)
    xyz = rng.uniform(size=(big_n, 3)).astype(np.float32)
    nrm = rng.normal(size=(big_n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    body = json.dumps({"xyz": xyz.tolist(), "normals": nrm.tolist()}).encode()
    status, _, payload = _post(base + "/v1/predict_type_sharded", body)
    assert status == 200, payload
    res = json.loads(payload)
    assert len(res["types"]) == big_n

    # npz accept: full per-point tensors
    status, ctype, payload = _post(base + "/v1/predict_type_sharded", body,
                                   accept="application/x-npz")
    assert status == 200 and "npz" in ctype
    with np.load(io.BytesIO(payload)) as z:
        assert z["type_per_point"].shape == (big_n, cfg.num_primitives)
        assert z["embedding"].shape[0] == big_n

    # indivisible N -> 400
    bad = json.dumps({"xyz": xyz[:big_n - 1].tolist(),
                      "normals": nrm[:big_n - 1].tolist()}).encode()
    status, _, payload = _post(base + "/v1/predict_type_sharded", bad)
    assert status == 400
    assert "multiple of the device count" in json.loads(payload)["error"]


def test_scene_family_server(tmp_path):
    """--family scene serves ScenePredictor: 'feats' aux key, argmaxed
    semantic_preds as the types field."""
    from gcanet_tpu.data.synthetic import synth_scene_batch
    from gcanet_tpu.serve_http import PredictionServer

    cfg = _tiny_cfg(tmp_path, num_points=256)
    srv = PredictionServer(cfg, family="scene", max_wait_ms=5.0,
                           scene_grid=16)
    batch = synth_scene_batch(cfg, 1, seed=3)
    xyz = np.asarray(batch["xyz"][0], np.float32)
    feats = np.asarray(batch["feats"][0], np.float32)

    # exercise the routing layer directly (no socket needed here — the
    # HTTP plumbing is covered by the abc-family server tests)
    body = json.dumps({"xyz": xyz.tolist(), "feats": feats.tolist()}).encode()
    status, _, payload = srv.handle("/v1/predict", body,
                                    "application/json", "")
    assert status == 200, payload
    res = json.loads(payload)
    assert len(res["types"]) == cfg.num_points
    assert all(isinstance(t, int) for t in res["types"][:5])
    assert len(res["instance_labels"]) == cfg.num_points

"""HTTP grounding service: request/response contract, cross-video
micro-batching equivalence vs direct pipeline calls, error paths, and the
LRU video store. (The production counterpart of the reference's single-user
gradio demo, main_gradio.py:187-238.)"""
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.serve import GroundingPipeline, GroundingServer

CFG = ModelConfig(
    vid_dim=34,  # 32 features + 2 TEF
    txt_dim=16,
    hidden_dim=32,
    num_layers=1,
    num_heads=2,
    ffn_dim=48,
    max_v_l=32,
    max_q_l=8,
)


def _pipeline():
    model = UniVTG(CFG)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        np.zeros((1, 8, CFG.txt_dim), np.float32),
        np.ones((1, 8), np.float32),
        np.zeros((1, 16, CFG.vid_dim), np.float32),
        np.ones((1, 16), np.float32),
        train=False,
    )["params"]
    return GroundingPipeline(CFG, params, clip_len=2.0, buckets=[16, 32])


@pytest.fixture(scope="module")
def server():
    srv = GroundingServer(
        _pipeline(), port=0, max_batch=16, max_wait_ms=60.0, max_videos=4
    )
    srv.start()
    yield srv
    srv.close()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _request(server, path, data=None, method=None, headers=None):
    req = urllib.request.Request(
        _url(server, path), data=data, method=method, headers=headers or {}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _rand_video(seed, n_clips):
    return np.random.default_rng(seed).standard_normal((n_clips, 32)).astype(np.float32)


def _rand_query(seed, n_tok=5):
    return np.random.default_rng(100 + seed).standard_normal((n_tok, 16)).astype(
        np.float32
    )


def _npz_bytes(feats):
    buf = io.BytesIO()
    np.savez(buf, features=feats)
    return buf.getvalue()


def test_health_register_ground(server):
    status, health = _request(server, "/healthz")
    assert status == 200 and health["ok"]

    vid = _rand_video(0, 10)
    status, reg = _request(server, "/videos/vidA", data=_npz_bytes(vid), method="PUT")
    assert status == 200 and reg == {"video": "vidA", "clips": 10, "bucket": 16}

    # JSON registration path
    body = json.dumps({"features": _rand_video(1, 20).tolist()}).encode()
    status, reg = _request(
        server, "/videos/vidB", data=body, method="PUT",
        headers={"Content-Type": "application/json"},
    )
    assert status == 200 and reg["clips"] == 20 and reg["bucket"] == 32

    q = _rand_query(0)
    status, got = _request(
        server, "/ground",
        data=json.dumps({"video": "vidA", "query_feats": q.tolist(), "top_k": 3}).encode(),
        method="POST",
    )
    assert status == 200
    want = server.pipeline.ground_features(vid, q, top_k=3)
    np.testing.assert_allclose(got["top1_window"], want["top1_window"], rtol=1e-6)
    np.testing.assert_allclose(got["saliency"], want["saliency"], rtol=1e-6)
    assert len(got["topk_windows"]) == 3
    assert got["duration"] == 20.0

    status, listing = _request(server, "/videos")
    assert status == 200 and set(listing["videos"]) == {"vidA", "vidB"}


def test_concurrent_requests_coalesce_across_videos(server):
    """N concurrent requests against different videos ride shared device
    dispatches, and every response equals the direct pipeline result."""
    videos = {f"v{i}": _rand_video(10 + i, 8 + 3 * i) for i in range(3)}
    for vid_id, feats in videos.items():
        _request(server, f"/videos/{vid_id}", data=_npz_bytes(feats), method="PUT")

    queries = [(f"v{i % 3}", _rand_query(i)) for i in range(9)]
    # warm the compile so the batching window isn't dominated by it
    _request(
        server, "/ground",
        data=json.dumps(
            {"video": "v0", "query_feats": queries[0][1].tolist()}
        ).encode(),
        method="POST",
    )

    with server.batcher._lock:
        batches_before = server.batcher.stats["batches"]
    barrier = threading.Barrier(len(queries))
    results = [None] * len(queries)

    def fire(i):
        vid_id, q = queries[i]
        barrier.wait()
        results[i] = _request(
            server, "/ground",
            data=json.dumps({"video": vid_id, "query_feats": q.tolist()}).encode(),
            method="POST",
        )

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for (vid_id, q), (status, got) in zip(queries, results):
        assert status == 200
        want = server.pipeline.ground_features(videos[vid_id], q)
        np.testing.assert_allclose(
            got["top1_window"], want["top1_window"], rtol=1e-6
        )
        np.testing.assert_allclose(got["saliency"], want["saliency"], rtol=1e-6)

    with server.batcher._lock:
        stats = dict(server.batcher.stats)
    # 9 simultaneous requests must NOT have run as 9 separate dispatches
    assert stats["batches"] - batches_before < 9
    assert stats["max_batch_size"] >= 2

    status, s = _request(server, "/stats")
    assert status == 200 and s["requests"] >= 10 and "latency_p50_ms" in s


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(
            server, "/ground",
            data=json.dumps({"video": "nope", "query_feats": [[0.0] * 16]}).encode(),
            method="POST",
        )
    assert e.value.code == 404

    _request(server, "/videos/tmp", data=_npz_bytes(_rand_video(42, 6)), method="PUT")
    # missing query
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(server, "/ground", data=json.dumps({"video": "tmp"}).encode(),
                 method="POST")
    assert e.value.code == 400
    # text query without a clip encoder
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(
            server, "/ground",
            data=json.dumps({"video": "tmp", "query": "a dog"}).encode(),
            method="POST",
        )
    assert e.value.code == 400
    # malformed features
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(server, "/videos/bad", data=b"not-an-npz", method="PUT")
    assert e.value.code == 400
    # delete then 404
    status, out = _request(server, "/videos/tmp", method="DELETE")
    assert status == 200 and out == {"deleted": "tmp"}
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(server, "/videos/tmp", method="DELETE")
    assert e.value.code == 404


def test_npy_body_and_request_validation(server):
    """PUT accepts raw np.save bytes (not just npz); bad top_k is a 400,
    an oversized body is a 413, and a keep-alive connection stays usable
    after a 404 with a body (drain discipline)."""
    # raw .npy registration
    feats = _rand_video(55, 7)
    buf = io.BytesIO()
    np.save(buf, feats)
    status, reg = _request(server, "/videos/npy", data=buf.getvalue(), method="PUT")
    assert status == 200 and reg["clips"] == 7

    # top_k=0 must be rejected at the HTTP layer, not crash the batcher
    body = json.dumps(
        {"video": "npy", "query_feats": _rand_query(55).tolist(), "top_k": 0}
    ).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _request(server, "/ground", data=body, method="POST")
    assert e.value.code == 400 and "top_k" in e.value.read().decode()

    # oversized body -> 413 before reading it
    server.max_body_bytes = 1024
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _request(server, "/videos/huge", data=b"x" * 4096, method="PUT")
        assert e.value.code == 413
    finally:
        server.max_body_bytes = 512 * 1024 * 1024

    # keep-alive: 404-with-body then a valid request on the SAME connection
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.request("POST", "/grond", body=body)  # typo'd path + body
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        good = json.dumps(
            {"video": "npy", "query_feats": _rand_query(55).tolist()}
        ).encode()
        conn.request("POST", "/ground", body=good)
        r = conn.getresponse()
        assert r.status == 200
        assert "top1_window" in json.loads(r.read())
    finally:
        conn.close()


def test_connection_burst_survives_listen_backlog(server):
    """A burst of simultaneous connections larger than the stdlib default
    listen backlog (5) must all be accepted — TCPServer's default RST'd the
    excess under a 64-client load test, so GroundingServer listens with
    backlog 128."""
    _request(server, "/videos/burst", data=_npz_bytes(_rand_video(7, 9)),
             method="PUT")
    n = 24
    barrier = threading.Barrier(n)
    errors = []
    lock = threading.Lock()

    def fire(i):
        body = json.dumps(
            {"video": "burst", "query_feats": _rand_query(200 + i).tolist()}
        ).encode()
        barrier.wait()
        try:
            _request(server, "/ground", data=body, method="POST")
        except Exception as e:  # ConnectionResetError pre-fix
            with lock:
                errors.append(repr(e))

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]


def test_warmup_precompiles_ladder(server):
    """warmup() drives every pow-2 batch program directly through the
    pipeline (no batcher stats pollution) and the server still answers."""
    with server.batcher._lock:
        before = dict(server.batcher.stats)
    logged = []
    server.warmup(video_lengths=[10, 20], log=logged.append)
    # pow-2 ladder up to max_batch=16 per (video bucket x 2 text buckets)
    assert len(logged) == 2 * 2 * 5
    assert all("warmup bucket=" in line for line in logged)
    with server.batcher._lock:
        after = dict(server.batcher.stats)
    assert after["requests"] == before["requests"]
    assert after["batches"] == before["batches"]

    _request(server, "/videos/warm", data=_npz_bytes(_rand_video(77, 12)),
             method="PUT")
    status, got = _request(
        server, "/ground",
        data=json.dumps(
            {"video": "warm", "query_feats": _rand_query(77).tolist()}
        ).encode(),
        method="POST",
    )
    assert status == 200 and "top1_window" in got


def test_warmup_ladder_covers_non_pow2_max_batch():
    """With max_batch=3 the dispatcher pads full batches to 4, so warmup
    must compile B=1,2,4 — not stop at 3."""
    srv = GroundingServer(_pipeline(), port=0, max_batch=3, max_wait_ms=5.0)
    try:
        logged = []
        srv.warmup(video_lengths=[10], log=logged.append)
        sizes = sorted({int(line.rsplit("B=", 1)[1].split(":")[0]) for line in logged})
        assert sizes == [1, 2, 4]
    finally:
        srv.close()


def test_overlong_video_truncates_to_top_bucket(server):
    """Features longer than the largest bucket truncate (bucket_length's
    contract) instead of crashing np.pad with a negative width."""
    pv = server.pipeline.prepare_video(_rand_video(9, 40))  # buckets top = 32
    assert pv.ctx_l == 32 and pv.bucket == 32

    status, reg = _request(
        server, "/videos/long", data=_npz_bytes(_rand_video(9, 40)), method="PUT"
    )
    assert status == 200 and reg["clips"] == 32


def test_param_dtype_roundtrip_bf16_then_f32():
    """param_dtype='float32' must upcast a bf16 tree (jnp.issubdtype —
    np.issubdtype is False for ml_dtypes bfloat16 and silently skipped)."""
    import jax
    import jax.numpy as jnp

    from univtg_tpu.serve import GroundingPipeline

    pipe16 = GroundingPipeline(
        CFG, _pipeline().params, clip_len=2.0, buckets=[16], param_dtype="bfloat16"
    )
    leaves = jax.tree_util.tree_leaves(pipe16.params)
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    pipe32 = GroundingPipeline(
        CFG, pipe16.params, clip_len=2.0, buckets=[16], param_dtype="float32"
    )
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree_util.tree_leaves(pipe32.params)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    )


def test_prometheus_metrics_endpoint(server):
    """GET /metrics serves the counters in Prometheus text format."""
    req = urllib.request.Request(_url(server, "/metrics"))
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    for metric in ("univtg_requests_total", "univtg_batches_total",
                   "univtg_request_errors_total", "univtg_inflight_requests",
                   "univtg_registered_videos"):
        assert f"\n{metric} " in "\n" + body, body
    # counters are plain numbers
    for line in body.splitlines():
        if line.startswith("univtg_") and "{" not in line:
            float(line.split()[-1])


def test_close_drains_inflight_requests():
    """close(drain_s) must answer requests already submitted — the worker
    keeps dispatching through the drain window instead of dying mid-batch."""
    import time as _time

    pipe = _pipeline()
    real_many = pipe.ground_prepared_many

    def slow_many(items, top_k=5):
        _time.sleep(0.6)  # make the dispatch clearly in-flight during close
        return real_many(items, top_k)

    pipe.ground_prepared_many = slow_many
    srv = GroundingServer(pipe, port=0, max_batch=4, max_wait_ms=5.0)
    srv.start()
    _request(srv, "/videos/v", data=_npz_bytes(_rand_video(1, 8)), method="PUT")
    body = json.dumps(
        {"video": "v", "query_feats": _rand_query(1).tolist()}
    ).encode()
    results = []

    def fire():
        results.append(_request(srv, "/ground", data=body, method="POST"))

    t = threading.Thread(target=fire)
    t.start()
    _time.sleep(0.15)  # let the request reach the batcher
    srv.close(drain_s=10.0)
    t.join(timeout=10)
    assert results and results[0][0] == 200
    assert "top1_window" in results[0][1]


def test_timed_out_request_is_abandoned_not_dispatched():
    """A request whose waiter timed out must NOT be dispatched to the
    device for nobody — the worker filters abandoned entries."""
    import time as _time

    from univtg_tpu.serve.server import MicroBatcher

    pipe = _pipeline()
    # long batching window so the request is still queued when we time out
    batcher = MicroBatcher(pipe, max_batch=4, max_wait_ms=500.0)
    pv = pipe.prepare_video(_rand_video(2, 8))
    try:
        with pytest.raises(TimeoutError):
            batcher.submit(pv, _rand_query(2), 5, timeout_s=0.05)
        _time.sleep(1.0)  # let the window elapse and the worker drain
        with batcher._lock:
            stats = dict(batcher.stats)
        assert stats["batches"] == 0, "abandoned request was dispatched"
    finally:
        batcher.close()


def test_video_store_lru_eviction():
    pipe = _pipeline()
    from univtg_tpu.serve.server import VideoStore

    store = VideoStore(pipe, max_videos=2)
    store.put("a", _rand_video(0, 4))
    store.put("b", _rand_video(1, 4))
    assert store.get("a") is not None  # refresh a
    store.put("c", _rand_video(2, 4))  # evicts b (least recently used)
    assert store.ids() == ["a", "c"]
    assert store.get("b") is None


def test_ground_prepared_many_cross_video_equivalence():
    """The cross-video batched path (what the server batcher calls) gives
    exactly the per-request results for a mixed bag of videos/lengths."""
    pipe = _pipeline()
    vids = [_rand_video(i, n) for i, n in enumerate([6, 14, 20, 30])]
    prepared = [pipe.prepare_video(v) for v in vids]
    items = [(prepared[i % 4], _rand_query(i, n_tok=3 + i % 5)) for i in range(7)]
    batched = pipe.ground_prepared_many(items, top_k=4)
    for (pv, q), got in zip(items, batched):
        want = pipe.ground_features(vids[prepared.index(pv)], q, top_k=4)
        np.testing.assert_allclose(got["top1_window"], want["top1_window"], rtol=1e-6)
        np.testing.assert_allclose(got["saliency"], want["saliency"], rtol=1e-6)
        np.testing.assert_allclose(
            [w[2] for w in got["topk_windows"]],
            [w[2] for w in want["topk_windows"]],
            rtol=1e-6,
        )


def _save_float_ckpt(path, params):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes({"params": params}))


def _init_cfg_params(seed):
    return UniVTG(CFG).init(
        jax.random.PRNGKey(seed),
        np.zeros((1, 8, CFG.txt_dim), np.float32),
        np.ones((1, 8), np.float32),
        np.zeros((1, 16, CFG.vid_dim), np.float32),
        np.ones((1, 16), np.float32),
        train=False,
    )["params"]


def test_hot_reload_swaps_weights_and_rejects_bad_checkpoints(tmp_path):
    """POST /reload: the server re-restores a checkpoint and hot-swaps the
    pipeline weights (no restart, no recompile); responses change to the
    new weights and match a fresh pipeline built from them. A missing or
    architecture-mismatched checkpoint returns 400 and the old weights
    keep serving."""
    from flax import serialization

    from univtg_tpu.serve.quantize import restore_serving_params

    params_a, params_b = _init_cfg_params(0), _init_cfg_params(7)
    ckpt = str(tmp_path / "model_latest.ckpt")
    _save_float_ckpt(ckpt, params_a)

    pipe = GroundingPipeline(CFG, params_a, clip_len=2.0, buckets=[16, 32])
    srv = GroundingServer(
        pipe, port=0, max_batch=8, max_wait_ms=5.0,
        param_loader=lambda p: restore_serving_params(p, params_a),
        checkpoint_path=ckpt,
    )
    srv.start()
    try:
        vid = _rand_video(3, 12)
        _request(srv, "/videos/v", data=_npz_bytes(vid), method="PUT")
        q = _rand_query(3)
        body = json.dumps({"video": "v", "query_feats": q.tolist()}).encode()
        _, before = _request(srv, "/ground", data=body, method="POST")

        # overwrite the checkpoint in place (what a trainer does) + reload
        _save_float_ckpt(ckpt, params_b)
        status, rep = _request(srv, "/reload", data=b"{}", method="POST")
        assert status == 200 and rep["ok"] and rep["reload_count"] == 1

        _, after = _request(srv, "/ground", data=body, method="POST")
        assert before["saliency"] != after["saliency"]  # weights changed
        want = GroundingPipeline(
            CFG, params_b, clip_len=2.0, buckets=[16, 32]
        ).ground_features(vid, q)
        np.testing.assert_allclose(
            after["saliency"], np.asarray(want["saliency"]), atol=1e-6
        )
        np.testing.assert_allclose(
            after["topk_windows"], np.asarray(want["topk_windows"]), atol=1e-5
        )

        # stats expose the reload
        _, stats = _request(srv, "/stats")
        assert stats["reload_count"] == 1 and stats["checkpoint"] == ckpt

        # missing file -> 400, still serving the new weights
        bad = json.dumps({"checkpoint": str(tmp_path / "nope.ckpt")}).encode()
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(srv, "/reload", data=bad, method="POST")
        assert ei.value.code == 400

        # architecture mismatch -> 400, old weights untouched
        wrong_cfg = ModelConfig(
            vid_dim=34, txt_dim=16, hidden_dim=48, num_layers=1,
            num_heads=2, ffn_dim=48, max_v_l=32, max_q_l=8,
        )
        wrong = UniVTG(wrong_cfg).init(
            jax.random.PRNGKey(1),
            np.zeros((1, 8, 16), np.float32),
            np.ones((1, 8), np.float32),
            np.zeros((1, 16, 34), np.float32),
            np.ones((1, 16), np.float32),
            train=False,
        )["params"]
        wrong_path = str(tmp_path / "wrong.ckpt")
        _save_float_ckpt(wrong_path, wrong)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(
                srv, "/reload",
                data=json.dumps({"checkpoint": wrong_path}).encode(),
                method="POST",
            )
        assert ei.value.code == 400
        _, again = _request(srv, "/ground", data=body, method="POST")
        np.testing.assert_allclose(again["saliency"], after["saliency"])
    finally:
        srv.close()


def test_reload_disabled_without_loader(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _request(server, "/reload", data=b"{}", method="POST")
    assert ei.value.code == 400
    assert "param_loader" in json.loads(ei.value.read())["error"]


def test_reload_rejects_non_string_checkpoint_and_honors_token(tmp_path):
    """{"checkpoint": 3} must be rejected BEFORE reaching open() (an int is
    an OS file descriptor there -- open(3).close() would shut the server's
    own listening socket); a configured reload token gates the endpoint;
    and a one-off checkpoint override does not become the new default."""
    from univtg_tpu.serve.quantize import restore_serving_params

    params = _init_cfg_params(0)
    ckpt = str(tmp_path / "model_latest.ckpt")
    _save_float_ckpt(ckpt, params)
    snap = str(tmp_path / "snapshot.ckpt")
    _save_float_ckpt(snap, _init_cfg_params(5))

    pipe = GroundingPipeline(CFG, params, clip_len=2.0, buckets=[16, 32])
    srv = GroundingServer(
        pipe, port=0,
        param_loader=lambda p: restore_serving_params(p, params),
        checkpoint_path=ckpt,
        reload_token="sekrit",
    )
    srv.start()
    try:
        tok = {"X-Reload-Token": "sekrit"}
        # missing / wrong token -> 403
        for headers in ({}, {"X-Reload-Token": "nope"}):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _request(srv, "/reload", data=b"{}", method="POST",
                         headers=headers)
            assert ei.value.code == 403

        # int checkpoint -> 400 "must be a string", server still alive
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(srv, "/reload", data=b'{"checkpoint": 3}',
                     method="POST", headers=tok)
        assert ei.value.code == 400
        assert "string" in json.loads(ei.value.read())["error"]
        status, _ = _request(srv, "/healthz")
        assert status == 200

        # one-off override loads, but the DEFAULT stays the startup path
        status, rep = _request(
            srv, "/reload",
            data=json.dumps({"checkpoint": snap}).encode(),
            method="POST", headers=tok,
        )
        assert status == 200 and rep["checkpoint"] == snap
        status, rep = _request(srv, "/reload", data=b"{}", method="POST",
                               headers=tok)
        assert status == 200 and rep["checkpoint"] == ckpt
        _, stats = _request(srv, "/stats")
        assert stats["checkpoint"] == ckpt and stats["reload_count"] == 2
    finally:
        srv.close()


def test_json_null_body_gets_a_response(server):
    """A body of valid JSON `null` must produce an HTTP error response,
    not a silent no-reply that leaves the keep-alive client hanging."""
    for path in ("/ground", "/reload"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(server, path, data=b"null", method="POST")
        assert ei.value.code == 400


def test_put_raw_video_extracts_and_grounds():
    """PUT /videos/<id> with raw video bytes (Content-Type: video/mp4)
    decodes on the host, runs the jitted CLIP tower, registers the
    features, and the video is then groundable by TEXT query -- the demo
    path's raw-video capability for API clients (VERDICT r4 item 10).
    Also: raw-video PUT without a clip_encoder is a clean 400."""
    import os

    video_path = "/root/reference/examples/charades.mp4"
    if not os.path.exists(video_path):
        pytest.skip("no example video")

    from univtg_tpu.extract.clip.model import CLIP, CLIPConfig
    from univtg_tpu.extract.pipeline import ClipEncoder

    clip_cfg = CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=1,
        vision_width=64, vision_patch_size=32, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_heads=4,
        transformer_layers=1,
    )
    clip_model = CLIP(clip_cfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 77), np.int32),
    )
    enc = ClipEncoder(clip_params, clip_cfg, image_batch=8, text_batch=2)

    g_cfg = ModelConfig(
        vid_dim=514, txt_dim=64, hidden_dim=32, num_layers=1, num_heads=2,
        ffn_dim=48, max_v_l=75, max_q_l=32,
    )
    g_model = UniVTG(g_cfg)
    g_params = g_model.init(
        jax.random.PRNGKey(1),
        np.zeros((1, 8, 64), np.float32),
        np.ones((1, 8), np.float32),
        np.zeros((1, 16, 514), np.float32),
        np.ones((1, 16), np.float32),
        train=False,
    )["params"]
    pipe = GroundingPipeline(
        g_cfg, g_params, clip_len=2.0, buckets=[16, 32], clip_encoder=enc
    )
    srv = GroundingServer(pipe, port=0, max_batch=4, max_wait_ms=5.0)
    srv.start()
    try:
        raw = open(video_path, "rb").read()
        status, out = _request(
            srv, "/videos/charades", data=raw, method="PUT",
            headers={"Content-Type": "video/mp4"},
        )
        assert status == 200 and out["clips"] > 0, out

        status, out = _request(
            srv, "/ground",
            data=json.dumps(
                {"video": "charades", "query": "person opens a door",
                 "top_k": 3}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert status == 200
        assert len(out["topk_windows"]) == 3
        assert 0 <= out["top1_window"][0] <= out["duration"]
    finally:
        srv.close()

    # encoder-less pipeline: raw-video PUT must 400 with a clear message
    srv2 = GroundingServer(_pipeline(), port=0)
    srv2.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(
                srv2, "/videos/x", data=b"\x00\x01", method="PUT",
                headers={"Content-Type": "video/mp4"},
            )
        assert ei.value.code == 400
        assert "clip_encoder" in json.loads(ei.value.read())["error"]
    finally:
        srv2.close()

"""Measure HTTP serving throughput with and without micro-batching.

Spins up the GroundingServer on localhost over the flagship model, registers
one QVHighlights-shaped video, then fires N concurrent clients in closed
loop for a fixed wall budget. Compares queries/sec with the batching window
enabled (concurrent requests coalesce into one device dispatch) vs a 0 ms
window + max_batch=1 (every request is its own dispatch -- what a naive
per-request server does).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving.py
"""
import json
import threading
import time
import urllib.request

import jax
import numpy as np

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.serve import GroundingPipeline, GroundingServer


def run_load(port: int, n_clients: int, duration_s: float, txt_dim: int):
    stop = time.perf_counter() + duration_s
    counts = [0] * n_clients
    lat = []
    errors = []
    lock = threading.Lock()

    def client(i):
        rng = np.random.default_rng(i)
        while time.perf_counter() < stop:
            q = rng.standard_normal((12, txt_dim)).astype(np.float32)
            body = json.dumps({"video": "v0", "query_feats": q.tolist()}).encode()
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/ground", data=body, method="POST"
            )
            # record failures instead of asserting: a dead client thread
            # would silently skew qps/p95 toward a wrong-but-plausible number
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    ok = r.status == 200
                    json.loads(r.read())
            except Exception as e:
                ok = False
                err = repr(e)
            else:
                err = None if ok else f"http {r.status}"
            with lock:
                if err is not None:
                    errors.append(err)
                    continue
                lat.append((time.perf_counter() - t0) * 1e3)
            counts[i] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    lat.sort()
    if errors:
        raise RuntimeError(
            f"{len(errors)} request failures corrupt the measurement; "
            f"first: {errors[0]}"
        )
    return {
        "qps": round(sum(counts) / dt, 1),
        "p50_ms": round(lat[len(lat) // 2], 1) if lat else None,
        "p95_ms": round(lat[int(len(lat) * 0.95)], 1) if lat else None,
        "requests": sum(counts),
    }


def main():
    platform = jax.devices()[0].platform
    cfg = ModelConfig(
        vid_dim=2818, txt_dim=512, hidden_dim=1024, num_layers=4, num_heads=8,
        ffn_dim=1024, max_v_l=75, max_q_l=32,
        compute_dtype="bfloat16" if platform != "cpu" else "float32",
    )
    model = UniVTG(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        np.zeros((1, 32, cfg.txt_dim), np.float32),
        np.ones((1, 32), np.float32),
        np.zeros((1, 75, cfg.vid_dim), np.float32),
        np.ones((1, 75), np.float32),
        train=False,
    )["params"]
    vid = np.random.default_rng(0).standard_normal((75, 2816)).astype(np.float32)
    duration = 20.0 if platform != "cpu" else 5.0
    n_clients = 32

    results = {}
    for name, max_batch, wait_ms in (
        ("batched", 8, 8.0),
        ("per_request", 1, 0.0),
    ):
        pipe = GroundingPipeline(cfg, params, buckets=[75])
        srv = GroundingServer(
            pipe, port=0, max_batch=max_batch, max_wait_ms=wait_ms
        ).start()
        import io

        buf = io.BytesIO()
        np.savez(buf, features=vid)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/videos/v0", data=buf.getvalue(), method="PUT"
        )
        urllib.request.urlopen(req, timeout=60).read()
        # pre-compile every pow-2 batch program the micro-batcher can form,
        # OUTSIDE the timed window (tunnel compiles are minutes each)
        pv = srv.store.get("v0")
        rng = np.random.default_rng(7)
        b = 1
        while b <= max_batch:
            items = [
                (pv, rng.standard_normal((12, cfg.txt_dim)).astype(np.float32))
            ] * b
            t0 = time.perf_counter()
            pipe.ground_prepared_many(items)
            print(f"warm B={b}: {time.perf_counter() - t0:.1f}s", flush=True)
            b *= 2
        results[name] = run_load(srv.port, n_clients, duration, cfg.txt_dim)
        with srv.batcher._lock:
            results[name]["max_batch_size"] = srv.batcher.stats["max_batch_size"]
            results[name]["batches"] = srv.batcher.stats["batches"]
        srv.close()
        print(name, json.dumps(results[name]))
    if results["per_request"]["qps"]:
        print(
            "batching speedup:",
            round(results["batched"]["qps"] / results["per_request"]["qps"], 2),
            "x",
        )


if __name__ == "__main__":
    main()

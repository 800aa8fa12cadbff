"""data/prefetch.py: order, exception propagation, driver integration."""
import numpy as np
import pytest

from univtg_tpu.data.prefetch import device_prefetch


def test_order_and_values_preserved():
    src = list(range(100))
    out = list(device_prefetch(src, lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in src]


def test_depth_zero_is_synchronous_identity():
    src = [1, 2, 3]
    assert list(device_prefetch(src, None, depth=0)) == src
    assert list(device_prefetch(src, lambda x: -x, depth=0)) == [-1, -2, -3]


def test_transform_exception_propagates():
    def boom(x):
        if x == 3:
            raise ValueError("bad batch 3")
        return x

    it = device_prefetch(range(10), boom, depth=2)
    got = []
    with pytest.raises(ValueError, match="bad batch 3"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2]


def test_source_exception_propagates():
    def gen():
        yield 1
        raise RuntimeError("source died")

    it = device_prefetch(gen(), None, depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="source died"):
        list(it)


def test_overlaps_producer_and_consumer():
    """With depth>=2 the producer runs ahead while the consumer sleeps."""
    import time

    produced = []

    def transform(x):
        produced.append(x)
        return x

    it = device_prefetch(range(5), transform, depth=2)
    assert next(it) == 0
    time.sleep(0.3)  # consumer stalls; producer should fill the queue
    assert len(produced) >= 3  # 0 consumed + 2 queued ahead


def test_abandoned_generator_releases_worker():
    """Closing the generator early (consumer exception / break) must stop
    the worker thread and drop its queued items instead of leaving it
    blocked in q.put holding device batches."""
    import threading
    import time

    produced = []

    def transform(x):
        produced.append(x)
        return x

    it = device_prefetch(range(1000), transform, depth=2)
    assert next(it) == 0
    n_before = threading.active_count()
    it.close()  # what a `break`/exception in the consumer loop does
    deadline = time.time() + 5
    while time.time() < deadline:
        alive = [t for t in threading.enumerate() if t.name == "device-prefetch"]
        if not alive:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate() if t.name == "device-prefetch"]
    # the worker stopped early: nowhere near the full 1000 items produced
    assert len(produced) < 50


def test_driver_prefetch_matches_no_prefetch(tmp_path):
    """Same data, same seed: prefetch_depth=2 and =0 produce identical
    training losses (prefetch must not change semantics)."""
    import json
    import os

    from univtg_tpu.data.mr import MRDataConfig
    from univtg_tpu.data.synthetic import create_synthetic_mr_corpus
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_mr import TrainConfig, train_mr

    corpus = create_synthetic_mr_corpus(str(tmp_path / "c"), n_train=16, n_val=8, seed=5)
    model = ModelConfig(
        vid_dim=corpus["v_dim"] + 2, txt_dim=corpus["q_dim"], hidden_dim=32,
        num_layers=1, num_heads=4, ffn_dim=48, droppath=0.0, input_dropout=0.0,
        max_v_l=corpus["max_clips"], max_q_l=10,
    )
    data_kw = dict(
        dset_name="qvhighlights", v_feat_dirs=corpus["v_feat_dirs"],
        q_feat_dir=corpus["q_feat_dir"], q_feat_dim=corpus["q_dim"],
        v_feat_dim=corpus["v_dim"], clip_len=corpus["clip_len"],
        max_q_l=10, max_v_l=corpus["max_clips"],
    )

    losses = {}
    for depth in (0, 2):
        cfg = TrainConfig(
            model=model,
            train_data=MRDataConfig(data_path=corpus["train_path"], **data_kw),
            eval_data=None,
            results_dir=str(tmp_path / f"run{depth}"),
            bsz=8, eval_bsz=8, n_epoch=2, eval_epoch=5, lr=3e-4, lr_warmup=1,
            lr_drop=100, save_interval=-1, prefetch_depth=depth,
        )
        train_mr(cfg)
        lines = [
            json.loads(l)
            for l in open(os.path.join(cfg.results_dir, "train_log.jsonl"))
        ]
        losses[depth] = [l["loss_overall"] for l in lines]
    np.testing.assert_allclose(losses[0], losses[2], rtol=1e-6)

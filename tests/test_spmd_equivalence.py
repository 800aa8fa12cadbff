"""SPMD correctness: training over a (dp, tp) mesh must be numerically
equivalent to single-device training (same seeds, same data)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
from univtg_tpu.train.steps import init_state, make_optimizer, make_train_step


def make_batch(B=8, Lv=16, Lt=6, vid_dim=34, txt_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.tile(((np.arange(Lv) + 1.0) / Lv)[None, :, None], (B, 1, 2)).astype(np.float32)
    window = np.zeros((B, Lv), np.float32)
    window[:, 3:8] = 1
    nn = np.zeros((B, Lv, 2), np.float32)
    nn[:, :, 0], nn[:, :, 1] = 3 / Lv, 8 / Lv
    mi = {
        "src_txt": rng.standard_normal((B, Lt, txt_dim)).astype(np.float32),
        "src_txt_mask": np.ones((B, Lt), np.float32),
        "src_vid": rng.standard_normal((B, Lv, vid_dim)).astype(np.float32),
        "src_vid_mask": np.ones((B, Lv), np.float32),
    }
    tg = {
        "timestamp": ts,
        "timestamp_mask": np.ones((B, Lv), np.float32),
        "timestamp_window": window,
        "span_labels_nn": nn,
        "saliency_scores": rng.uniform(0, 1, (B, Lv)).astype(np.float32),
        "saliency_pos_labels": np.full((B, 1), 4, np.int32),
    }
    return mi, tg


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 1)])
def test_sharded_training_matches_single_device(mesh_shape):
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6,
    )
    import optax

    model = UniVTG(cfg)
    # plain SGD: Adam's rsqrt would amplify fp-level reduction-order noise
    # in the all-reduced gradients into lr-scale parameter differences
    optimizer = optax.sgd(1e-2)
    weights = LossWeights()

    def run(dp, tp, n_steps=3):
        mesh = make_mesh(dp=dp, tp=tp)
        state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        state = state.replace(params=replicate_params(mesh, state.params))
        step = make_train_step(model, optimizer, weights, donate=False)
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(n_steps):
            mi, tg = make_batch(seed=i)
            mi = shard_batch(mesh, mi)
            tg = shard_batch(mesh, tg)
            state, metrics = step(state, mi, tg, rng)
            losses.append(float(metrics["loss_overall"]))
        return losses, state

    base_losses, base_state = run(1, 1)
    dp, tp = mesh_shape
    sh_losses, sh_state = run(dp, tp)
    np.testing.assert_allclose(sh_losses, base_losses, rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(base_state.params),
        jax.tree_util.tree_leaves(sh_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_multislice_mesh_layout():
    """slices>1 keeps tp (and the dp minor) inside a slice chunk; only the
    dp major crosses the chunk boundary (the DCN axis on real pods)."""
    mesh = make_mesh(dp=4, tp=2, slices=2)
    grid = np.asarray(mesh.devices)
    assert grid.shape == (4, 1, 2)  # ("dp", "pp", "tp") with pp=1
    ids = np.vectorize(lambda d: d.id)(grid[:, 0, :])
    # chunk 0 = devices 0-3 in dp rows 0-1, chunk 1 = devices 4-7 in rows 2-3
    assert set(ids[:2].ravel()) == {0, 1, 2, 3}
    assert set(ids[2:].ravel()) == {4, 5, 6, 7}
    # every tp pair is within one chunk
    for row in ids:
        assert row[0] // 4 == row[1] // 4

    with pytest.raises(ValueError, match="multiple of slices"):
        make_mesh(dp=2, tp=1, slices=4, devices=jax.devices()[:2])


def test_slice_device_selection_uses_subset_of_each_slice():
    """A config needing fewer chips than the pod provides must pick
    per-slice subsets, not the first dp*tp devices (which on slice-major
    enumeration would all land in slice 0 and spuriously fail)."""
    from univtg_tpu.parallel.mesh import _select_slice_devices

    class Dev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

        def __repr__(self):
            return f"d{self.id}@s{self.slice_index}"

    # 2 slices x 4 chips, enumerated slice-major (the real-pod ordering)
    pod = [Dev(i, i // 4) for i in range(8)]
    # dp=2 x tp=2 over 2 slices -> 2 devices per slice
    chosen = _select_slice_devices(pod, per_slice=2, slices=2)
    assert [d.id for d in chosen] == [0, 1, 4, 5]
    assert [d.slice_index for d in chosen] == [0, 0, 1, 1]

    # interleaved enumeration still groups correctly
    shuffled = [Dev(i, i % 2) for i in range(8)]
    chosen = _select_slice_devices(shuffled, per_slice=2, slices=2)
    assert [d.slice_index for d in chosen] == [0, 0, 1, 1]

    with pytest.raises(ValueError, match="span 1 hardware slices"):
        _select_slice_devices([Dev(i, 0) for i in range(4)], 2, 2)
    with pytest.raises(ValueError, match="are needed per slice"):
        _select_slice_devices(pod, per_slice=5, slices=2)


def test_multislice_training_matches_single_device():
    """Training over the hybrid dp-over-slices layout is numerically the
    same computation: the mesh layout only changes which links collectives
    ride, not the math."""
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, dropout=0.0, droppath=0.0, input_dropout=0.0,
        max_v_l=16, max_q_l=6,
    )
    import optax

    model = UniVTG(cfg)
    optimizer = optax.sgd(1e-2)
    weights = LossWeights()

    def run(mesh):
        state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
        state = state.replace(params=replicate_params(mesh, state.params))
        step = make_train_step(model, optimizer, weights, donate=False)
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(2):
            mi, tg = make_batch(seed=i)
            state, metrics = step(
                state, shard_batch(mesh, mi), shard_batch(mesh, tg), rng
            )
            losses.append(float(metrics["loss_overall"]))
        return losses

    base = run(make_mesh(dp=1, tp=1))
    hybrid = run(make_mesh(dp=4, tp=2, slices=2))
    np.testing.assert_allclose(hybrid, base, rtol=2e-5)
